"""Deduplication operators over ``documents`` / ``embeddings``.

Five strategies, each the standard shape for LLM-corpus dedup at scale:

- **exact**: md5 content hash → groupBy hash. One shuffle on the hash;
  at 100 TB, hash-partitioned, no skew (hashes are uniform).
- **n-gram Jaccard**: shingle → inverted index (explode) → candidate
  pairs by shared shingle → exact Jaccard. The explode/self-join is the
  classic MapReduce similarity-join; the shared-shingle equi-join keys
  the shuffle so only co-shingled docs ever meet.
- **MinHash + LSH**: ``pyspark.ml.feature.MinHashLSH`` banding —
  probabilistic candidate generation whose cost scales with |bands|,
  not |docs|²; the scale path when exact Jaccard's candidate set blows
  up.
- **SimHash**: 64-bit weighted-majority fingerprint via xxhash64;
  near-dups differ in ≤ k bits (hamming via bit_count(xor)).
- **embedding cosine**: semantic near-dup on the embedding column.

The exact / Jaccard variants carry DuckDB oracles (md5 and integer set
arithmetic are cross-engine exact). MinHash/SimHash depend on Spark-
side hash functions (xxhash64 has no DuckDB twin), so they get
rows-only checks — deterministic across runs via fixed seeds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dungbeetle_spark.functions.texts import content_md5, norm_text
from dungbeetle_spark.functions.vectors import cosine_similarity
from dungbeetle_spark.queries import _t, query

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup: group on normalized-content md5, keep the lowest "
    "doc_id per group. Single hash shuffle on a uniform key — the "
    "100 TB-safe shape (no skew, map-side partial agg).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.select(content_md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (exact similarity join via shingle index)
# ---------------------------------------------------------------------------

_SHINGLE_N = 3
_JACCARD_T = 0.10


def _shingles(col) -> "F.Column":
    """Distinct word-{n}-grams of normalized text (JVM-side)."""
    words = F.split(norm_text(col), " ")
    n = _SHINGLE_N
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(-1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j + 1) for j in range(n)])
    )
    return F.array_distinct(grams)


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH words AS (
      SELECT doc_id,
             regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS w
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
      FROM words, UNNEST(range(1, greatest(len(w) - {_SHINGLE_N} + 2, 1))) AS t(i)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {_JACCARD_T}
    """,
    doc=f"Near-dup pairs by exact {_SHINGLE_N}-gram Jaccard ≥ {_JACCARD_T}: "
    "shingle → explode (inverted index) → equi-join on shingle → "
    "count ∩ / |A∪B|. The equi-join keys the shuffle on the shingle, "
    "so cost is Σ|posting list|², not |docs|² — the scalable exact "
    "similarity join. Jaccard is integer arithmetic + one double "
    "division: bit-exact cross-engine.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    sh = d.select("doc_id", F.explode(_shingles(F.col("text"))).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("c").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= _JACCARD_T)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (probabilistic near-dup; the 100 TB candidate-gen path)
# ---------------------------------------------------------------------------

@query(
    "dedup_minhash_lsh",
    oracle=None,  # Spark-side hashing (MinHashLSH/HashingTF) has no DuckDB twin
    doc="MinHash-LSH near-dup candidates: shingles → HashingTF sparse "
    "vectors → MinHashLSH(seed=42) approxSimilarityJoin at Jaccard "
    "distance ≤ 0.9. Banding makes candidate generation linear in "
    "docs; rows-only oracle (deterministic via fixed seed).",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = _t(spark, sf_dir, "documents")["documents"]
    sh = d.select("doc_id", _shingles(F.col("text")).alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feats = tf.transform(sh)
    mh = MinHashLSH(inputCol="features", outputCol="minhashes", numHashTables=8, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.9, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit fingerprint, hamming-ball near-dup)
# ---------------------------------------------------------------------------

@query(
    "dedup_simhash",
    oracle=None,  # xxhash64 is Spark-specific
    doc="SimHash-64 fingerprints: xxhash64(word) per distinct word, "
    "bitwise weighted majority folded JVM-side, near-dup = hamming "
    "distance ≤ 3 via bit_count(xor). Fingerprinting is one narrow "
    "projection; the pair scan buckets on the top 16 bits so the "
    "self-join is banded, not quadratic.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    words = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(norm_text(F.col("text")), " "))).alias("w")
    )
    h = words.select("doc_id", F.xxhash64("w").alias("h"))
    # bit i contribution: +1 if set else -1; majority per bit
    bit_votes = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = h.groupBy("doc_id").agg(*bit_votes)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (1 << i) if i < 63 else F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
    fps = votes.select("doc_id", fp.alias("simhash"))
    # banded self-join on high 16 bits, then exact hamming filter
    banded = fps.withColumn("band", F.shiftrightunsigned(F.col("simhash"), 48))
    a = banded.alias("a")
    b = banded.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

_COS_T = 0.95


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {_COS_T}
    """,
    doc=f"Semantic near-dup: embedding pairs with cosine ≥ {_COS_T}. "
    "Local-mode oracle does the full O(n²) join; the engine's scale "
    "path is the same expression after LSH bucketing (see "
    "similarity.ann_lsh_bucketed) — identical filter, banded "
    "candidate set.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    a = e.alias("a")
    b = e.alias("b")
    cos = cosine_similarity(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= _COS_T)
        .select("vec_a", "vec_b", F.round("cos_raw", 6).alias("cos_sim"))
    )
