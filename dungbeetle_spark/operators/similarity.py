"""Similarity search over the ``embeddings`` table.

Two paths, same contract (top-k neighbors per query vector):

- **brute force** — cross join + ordered-fold cosine + window top-k.
  Exact; the right baseline and the correctness oracle. At scale this
  is queries×corpus work, so it's only the production path when the
  query set is small (broadcast the queries, scan the corpus once —
  which is exactly how the plan below compiles: queries side is tiny →
  broadcast nested-loop, corpus scanned in parallel, per-partition
  top-k before the final shuffle).

- **LSH-bucketed** — random-hyperplane signatures (deterministic
  seed) bucket the corpus; candidates = same-bucket pairs in any of
  B bands; exact cosine re-rank inside buckets. Recall < 1 by design;
  cost scales with bucket occupancy, not corpus². This is the 100 TB
  path: signatures are one narrow projection, buckets are the shuffle
  key, and hot buckets split via AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dungbeetle_spark.functions.vectors import cosine_similarity, dot
from dungbeetle_spark.queries import _t, query

_TOP_K = 5
_N_QUERIES = 10  # vec_id < 10 are the query vectors in the fixture


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])) AS cs
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {_N_QUERIES}),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, neighbor_id) AS rank,
             cs
      FROM sims)
    SELECT query_id, neighbor_id, rank, round(cs, 6) AS cos_sim
    FROM ranked WHERE rank <= {_TOP_K}
    """,
    doc=f"Exact brute-force cosine top-{_TOP_K} for {_N_QUERIES} query "
    "vectors: broadcast the (tiny) query side, scan the corpus once, "
    "window-rank per query. Deterministic neighbor_id tiebreak.",
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    cos = cosine_similarity(F.col("q_emb"), F.col("c_emb"))
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cs"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cs", 6).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN — the scale path
# ---------------------------------------------------------------------------

_N_PLANES = 12  # bits per signature band
_N_BANDS = 4


def _hyperplanes(dim: int, n_planes: int, band: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed seed per band)."""
    import numpy as np

    rng = np.random.default_rng(42 + band)
    return rng.standard_normal((n_planes, dim)).tolist()


def _signature(emb_col, planes: list[list[float]]):
    """Sign-bit signature of one band, folded JVM-side."""
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(dot(emb_col, arr) >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


@query(
    "ann_lsh_bucketed",
    oracle=None,  # probabilistic candidate set; rows-only (deterministic seed)
    doc=f"LSH-bucketed ANN: {_N_BANDS} bands × {_N_PLANES} random-"
    "hyperplane sign bits (seed 42) bucket the corpus; same-bucket-"
    "in-any-band candidates get exact cosine re-rank, top-"
    f"{_TOP_K} per query. Shuffle is keyed on (band, bucket) — "
    "corpus² never materializes; the plan that still works at 100 TB.",
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    dim = 64
    # signatures: band → 12-bit bucket id per vector (one projection)
    sig_cols = [
        _signature(F.col("embedding"), _hyperplanes(dim, _N_PLANES, band)).alias(f"sig{band}")
        for band in range(_N_BANDS)
    ]
    signed = e.select("vec_id", "embedding", *sig_cols)
    # long format: (vec_id, band, bucket)
    bands = F.array(*[
        F.struct(F.lit(band).alias("band"), F.col(f"sig{band}").alias("bucket"))
        for band in range(_N_BANDS)
    ])
    buckets = signed.select(
        "vec_id", "embedding", F.explode(bands).alias("bb")
    ).select("vec_id", "embedding", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    q = buckets.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "band",
        "bucket",
    )
    c = buckets.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        "band",
        "bucket",
    )
    cands = (
        q.join(c, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_emb", "neighbor_id", "c_emb")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = cosine_similarity(F.col("q_emb"), F.col("c_emb"))
    w = W.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neighbor_id"))
    return (
        cands.select("query_id", "neighbor_id", cos.alias("cs"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", F.round("cs", 6).alias("cos_sim"))
    )
