"""Text-analysis operators over the ``documents`` table.

Everything here is expressed with JVM-side column functions (no Python
UDFs): at 100 TB these run inside whole-stage codegen as a pure
scan→project pipeline — embarrassingly parallel, no shuffle except the
final aggregates where noted.

Cross-engine determinism: counting is done with replace/regexp tricks
that have identical semantics in Spark and DuckDB; ratios are single
IEEE double divisions; no transcendental functions (libm results are
not bit-portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dungbeetle_spark.functions.texts import content_md5, norm_text, word_count
from dungbeetle_spark.queries import _t, query
from dungbeetle_spark.sources.catalog import fan_out

# Marker-word heuristics for language ID. The guess is a deterministic
# function of the text, mirrored exactly in the oracle SQL — the
# operator contract is "same label both engines", not linguistic truth.
_LANG_MARKERS: dict[str, list[str]] = {
    "de": [" der ", " und ", " die ", " ist ", " nicht "],
    "fr": [" le ", " et ", " les ", " est ", " pas "],
    "es": [" el ", " y ", " los ", " es ", " no "],
    "en": [" the ", " and ", " is ", " of ", " to "],
}


def _occurrences(col, needle: str):
    """Occurrence count via length delta (identical in both engines)."""
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def _occurrences_sql(expr: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"(length({expr}) - length(replace({expr}, '{n}', ''))) / {len(needle)}"


@query(
    "text_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt,
             text
      FROM documents)
    SELECT doc_id, lang, source,
           length(text) AS n_chars,
           CASE WHEN nt = '' THEN 0 ELSE length(nt) - length(replace(nt, ' ', '')) + 1 END AS n_words,
           length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
           CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS punct_ratio
    FROM t
    """,
    doc="Per-document surface statistics: chars, words, punctuation, "
    "digits, punct ratio. Pure narrow projection — scan-parallel at "
    "any scale.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Staged projections: each regex result is materialized once per row
    # and reused (expressions referenced twice inside one Project get
    # re-evaluated; a non-cheap alias in a prior Project does not).
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    text = F.col("text")
    base = d.select(
        "doc_id",
        "lang",
        "source",
        F.length(text).alias("n_chars"),
        norm_text(text).alias("nt"),
        (
            F.length(text) - F.length(F.regexp_replace(text, r"\p{Punct}", ""))
        ).alias("n_punct_raw"),
        (
            F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))
        ).alias("n_digits_raw"),
    )
    nt = F.col("nt")
    n_words = F.when(nt == "", F.lit(0)).otherwise(
        F.length(nt) - F.length(F.replace(nt, F.lit(" "), F.lit(""))) + 1
    )
    return base.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        n_words.cast("long").alias("n_words"),
        F.col("n_punct_raw").cast("long").alias("n_punct"),
        F.col("n_digits_raw").cast("long").alias("n_digits"),
        (
            F.col("n_punct_raw").cast("double") / F.greatest(F.col("n_chars"), F.lit(1))
        ).alias("punct_ratio"),
    )


@query(
    "token_count",
    oracle="""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens
    FROM documents
    """,
    doc="Token counting two ways: whitespace tokens and a BPE-ish "
    "regex (letter runs, single digits, single punctuation) — the "
    "standard pre-tokenizer shape for LLM data work.",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))
    return d.select(
        "doc_id",
        word_count("text").cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 8) AS bucket
    FROM documents
    """,
    doc="Content fingerprinting: md5 over normalized text (identical "
    "hex in Spark and DuckDB) + an 8-hex-char shard bucket — the "
    "partition key a 100 TB dedup would shuffle on.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    return d.select("doc_id", content_md5("text").alias("fingerprint")).select(
        "doc_id", "fingerprint", F.col("fingerprint").substr(1, 8).alias("bucket")
    )


def _lang_scores(d: DataFrame) -> DataFrame:
    """Stage 1+2: materialize the normalized text once, then one
    occurrence-count column per language. Each stage is its own
    Project so no regex or replace is ever evaluated twice per row."""
    base = d.select(
        "doc_id",
        "lang",
        F.concat(F.lit(" "), norm_text(F.col("text")), F.lit(" ")).alias("nt"),
        (F.length(F.regexp_replace(F.col("text"), r"[^一-鿿]", "")) > 0).alias("cjk"),
    )
    nt = F.col("nt")
    score_cols = [
        sum((_occurrences(nt, m) for m in markers), start=F.lit(0.0)).alias(f"s_{lang}")
        for lang, markers in _LANG_MARKERS.items()
    ]
    return base.select("doc_id", "lang", "cjk", *score_cols)


def _lang_guess_spark():
    """Stage 3: fixed-precedence argmax over the materialized scores."""
    best = F.lit("unknown")
    best_score = F.lit(0.0)
    # Deterministic precedence: iterate langs in fixed order, strict >
    for lang in ("de", "fr", "es", "en"):
        s = F.col(f"s_{lang}")
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return F.when(F.col("cjk"), F.lit("zh")).otherwise(best)


def _lang_guess_sql() -> str:
    nt = "(' ' || trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) || ' ')"
    score = {
        lang: " + ".join(_occurrences_sql(nt, m) for m in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    # Same fixed-precedence argmax as the Spark side.
    return f"""
      CASE WHEN length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) > 0
           THEN 'zh'
           ELSE (
             CASE
               WHEN ({score['de']}) >= greatest({score['fr']}, {score['es']}, {score['en']})
                    AND ({score['de']}) > 0 THEN 'de'
               WHEN ({score['fr']}) >= greatest({score['es']}, {score['en']})
                    AND ({score['fr']}) > 0 THEN 'fr'
               WHEN ({score['es']}) >= greatest({score['en']})
                    AND ({score['es']}) > 0 THEN 'es'
               WHEN ({score['en']}) > 0 THEN 'en'
               ELSE 'unknown'
             END)
      END
    """


@query(
    "lang_id",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           {_lang_guess_sql()} AS guessed_lang
    FROM documents
    """,
    doc="Heuristic n-gram/marker-word language ID with a fixed-"
    "precedence argmax (de>fr>es>en, CJK→zh). Deterministic, "
    "scan-parallel; the guess is compared against the labeled lang.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    return _lang_scores(d).select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        _lang_guess_spark().alias("guessed_lang"),
    )


def _quality_cte_sql(src: str = "documents") -> str:
    """CTE pair computing (doc_id, quality) over ``src`` — the
    single source of truth for the quality formula on the oracle side,
    shared with the composed corpus_clean oracle (operators/pipeline.py)
    and the junk-seeded quality_threshold_calibration oracle."""
    return f"""
    q AS (
      SELECT doc_id,
             length(text) AS nc,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) END AS nw,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS np
      FROM {src}),
    scored AS (
      SELECT doc_id,
             (least(CAST(nw AS DOUBLE) / 100.0, 1.0) * 0.5
              + CASE WHEN nw > 0 AND CAST(nc AS DOUBLE) / nw BETWEEN 3.0 AND 12.0
                     THEN 0.3 ELSE 0.0 END
              + CASE WHEN CAST(np AS DOUBLE) / greatest(nc, 1) < 0.1
                     THEN 0.2 ELSE 0.0 END) AS quality
      FROM q)
    """


@query(
    "quality_score",
    oracle=f"""
    WITH {_quality_cte_sql()}
    SELECT doc_id, quality FROM scored
    """,
    doc="Rule-based document quality score (length / mean-word-length "
    "band / punctuation-density), rational arithmetic only so the "
    "score is bit-identical across engines.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    text = F.col("text")
    squashed = F.regexp_replace(text, r"\s+", " ")
    base = d.select(
        "doc_id",
        F.length(text).alias("nc"),
        F.when(F.trim(text) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(squashed), " ")))
        .alias("nw"),
        (F.length(text) - F.length(F.regexp_replace(text, r"\p{Punct}", ""))).alias("np"),
    )
    nc, nw, np_ = F.col("nc"), F.col("nw"), F.col("np")
    mean_wl = nc.cast("double") / nw
    quality = (
        F.least(nw.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + F.when((nw > 0) & (mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(np_.cast("double") / F.greatest(nc, F.lit(1)) < 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return base.select("doc_id", quality.alias("quality"))


# ---------------------------------------------------------------------------
# Python UDTF: table-generating function surface (Spark 4 @udtf)
# ---------------------------------------------------------------------------


@query(
    "udtf_sentences",
    oracle="""
    WITH split AS (
      SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
    exploded AS (
      SELECT doc_id, CAST(t.i - 1 AS INT) AS idx, trim(parts[t.i]) AS s
      FROM split, UNNEST(range(1, len(parts) + 1)) AS t(i))
    SELECT doc_id, idx,
           CAST(len(string_split(s, ' ')) AS INT) AS n_words
    FROM exploded WHERE s <> ''
    """,
    doc="Python UDTF (table-generating function) splitting each doc "
    "into sentences via LATERAL join — the arbitrary-arity row "
    "expansion surface (one input row → N output rows with state "
    "allowed per call). Runs Arrow-batched like other Python "
    "surfaces; the oracle replicates the split relationally. At "
    "scale UDTFs parallelize per input partition like any "
    "projection — no shuffle introduced by the expansion itself.",
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="idx: int, sentence: string, n_words: int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, p in enumerate(text.split(". ")):
                p = p.strip()
                if p:
                    yield i, p, len(p.split(" "))

    spark.udtf.register("dungbeetle_split_sentences", SplitSentences)
    d = _t(spark, sf_dir, "documents")["documents"]
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.idx, s.n_words "
        "FROM _udtf_docs, LATERAL dungbeetle_split_sentences(text) s"
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filter
# ---------------------------------------------------------------------------

# Repetition thresholds from the published Gopher corpus-filtering
# rules (Rae et al. 2021, Table A1): a doc is dropped when too much of
# it is covered by one dominant n-gram or by duplicated 5-grams. The
# line/paragraph duplicate rules are omitted — the operator keys on
# word n-grams, which are the signals the rules share with any
# whitespace-tokenizable corpus (and the only non-degenerate ones on
# the fixture, which has no line structure).
_REP_TOP2_T = 0.20
_REP_TOP3_T = 0.18
_REP_TOP4_T = 0.16
_REP_DUP5_T = 0.15
_REP_KS = (1, 2, 3, 4, 5)  # 1 = word stats; 2-4 top-gram; 5 dup-gram


@query(
    "repetition_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents),
    base AS (
      SELECT doc_id, length(nt) AS n_chars,
             regexp_split_to_array(nt, ' ') AS w
      FROM t),
    grams AS (
      SELECT doc_id, n_chars, ks.k AS k,
             array_to_string(list_slice(w, s.i, s.i + ks.k - 1), ' ') AS g
      FROM base,
           UNNEST([1, 2, 3, 4, 5]) AS ks(k),
           UNNEST(range(1, greatest(len(w) - ks.k + 2, 1))) AS s(i)),
    counts AS (
      SELECT doc_id, n_chars, k, g, COUNT(*) AS c
      FROM grams GROUP BY doc_id, n_chars, k, g),
    stats AS (
      SELECT doc_id, n_chars,
             SUM(CASE WHEN k = 1 THEN c END) AS n_words,
             COUNT(CASE WHEN k = 1 THEN 1 END) AS n_distinct,
             COALESCE(MAX(CASE WHEN k = 2 THEN c * length(g) END), 0) AS top2,
             COALESCE(MAX(CASE WHEN k = 3 THEN c * length(g) END), 0) AS top3,
             COALESCE(MAX(CASE WHEN k = 4 THEN c * length(g) END), 0) AS top4,
             COALESCE(SUM(CASE WHEN k = 5 AND c >= 2
                          THEN c * length(g) END), 0) AS dup5
      FROM counts GROUP BY doc_id, n_chars)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(1 AS DOUBLE) - CAST(n_distinct AS DOUBLE)
             / CAST(n_words AS DOUBLE) AS dup_word_frac,
           CAST(top2 AS DOUBLE) / greatest(n_chars, 1) AS top2_char_frac,
           CAST(top3 AS DOUBLE) / greatest(n_chars, 1) AS top3_char_frac,
           CAST(top4 AS DOUBLE) / greatest(n_chars, 1) AS top4_char_frac,
           CAST(dup5 AS DOUBLE) / greatest(n_chars, 1) AS dup5_char_frac,
           CAST(CAST(top2 AS DOUBLE) / greatest(n_chars, 1) <= {_REP_TOP2_T}
            AND CAST(top3 AS DOUBLE) / greatest(n_chars, 1) <= {_REP_TOP3_T}
            AND CAST(top4 AS DOUBLE) / greatest(n_chars, 1) <= {_REP_TOP4_T}
            AND CAST(dup5 AS DOUBLE) / greatest(n_chars, 1) <= {_REP_DUP5_T}
            AS INT) AS keep
    FROM stats
    """,
    doc="Gopher-rule repetition filter (Rae et al. 2021 Table A1): "
    "per doc, the char fraction covered by the dominant 2/3/4-gram "
    "and by duplicated 5-grams, plus the duplicate-word fraction; "
    "keep = all fractions under the published thresholds "
    f"({_REP_TOP2_T}/{_REP_TOP3_T}/{_REP_TOP4_T}/{_REP_DUP5_T}). "
    "'Dominant' is max(count × gram chars) — order-free, so the "
    "aggregate is fold-independent; every fraction is one integer-"
    "ratio double division, bit-equal cross-engine.",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals for corpus quality filtering.

    Spark shape: gram construction is a JVM higher-order ``transform``
    over the split-word array (all of k = 1..5 built in one projection
    and flattened into a single ``explode`` — one generator, not five
    scans), then two keyed aggregates: (doc, k, gram) counts with
    map-side partial aggregation, and the per-doc rollup. Both shuffle
    keys include doc_id, so at 100 TB the load spreads with the corpus
    — no hot keys (gram strings never leave their doc's groups, unlike
    the dedup inverted index which shares grams ACROSS docs on
    purpose). ``fan_out`` first: gram explosion is compute-heavy and
    the fixture parquet is one unsplittable row group.
    """
    d = _t(spark, sf_dir, "documents")["documents"]
    base = (
        fan_out(d.select("doc_id", "text"))
        .select("doc_id", norm_text(F.col("text")).alias("nt"))
        .select(
            "doc_id",
            F.length("nt").alias("n_chars"),
            F.split("nt", " ").alias("w"),
        )
    )

    def grams(k: int):
        # zip_with fold over k shifted slices (see word_ngrams: a
        # lambda referencing the aliased split re-runs norm+split per
        # gram position); the outer transform's lambda touches only
        # its own element, so the struct wrap stays per-element cheap.
        # The slice-length guard subsumes the old size >= k branch.
        w = F.col("w")
        m = F.greatest(F.size(w) - (k - 1), F.lit(0))
        g = F.slice(w, 1, m)
        for j in range(1, k):
            g = F.zip_with(
                g, F.slice(w, j + 1, m),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return F.transform(
            g,
            lambda s: F.struct(F.lit(k).alias("k"), s.alias("g")),
        )

    exploded = base.select(
        "doc_id",
        "n_chars",
        F.explode(F.flatten(F.array(*[grams(k) for k in _REP_KS]))).alias("kg"),
    ).select(
        "doc_id", "n_chars", F.col("kg.k").alias("k"), F.col("kg.g").alias("g")
    )
    cl = F.col("c") * F.length("g")
    stats = (
        exploded.groupBy("doc_id", "n_chars", "k", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id", "n_chars")
        .agg(
            F.sum(F.when(F.col("k") == 1, F.col("c"))).alias("n_words"),
            F.count(F.when(F.col("k") == 1, F.lit(1))).alias("n_distinct"),
            F.coalesce(
                F.max(F.when(F.col("k") == 2, cl)), F.lit(0)
            ).alias("top2"),
            F.coalesce(
                F.max(F.when(F.col("k") == 3, cl)), F.lit(0)
            ).alias("top3"),
            F.coalesce(
                F.max(F.when(F.col("k") == 4, cl)), F.lit(0)
            ).alias("top4"),
            F.coalesce(
                F.sum(F.when((F.col("k") == 5) & (F.col("c") >= 2), cl)),
                F.lit(0),
            ).alias("dup5"),
        )
    )
    nc = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    top2f = F.col("top2").cast("double") / nc
    top3f = F.col("top3").cast("double") / nc
    top4f = F.col("top4").cast("double") / nc
    dup5f = F.col("dup5").cast("double") / nc
    dupw = F.lit(1.0).cast("double") - F.col("n_distinct").cast("double") / F.col(
        "n_words"
    ).cast("double")
    keep = (
        (top2f <= _REP_TOP2_T)
        & (top3f <= _REP_TOP3_T)
        & (top4f <= _REP_TOP4_T)
        & (dup5f <= _REP_DUP5_T)
    )
    return stats.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        dupw.alias("dup_word_frac"),
        top2f.alias("top2_char_frac"),
        top3f.alias("top3_char_frac"),
        top4f.alias("top4_char_frac"),
        dup5f.alias("dup5_char_frac"),
        keep.cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# quality filter funnel — composed keep/drop verdicts with attribution
# ---------------------------------------------------------------------------

_QF_MIN_WORDS = 25
_QF_MAX_CHARS = 520
_QF_WL_LO = 4800  # chars-per-word band, integer permille (incl. spaces)
_QF_WL_HI = 5900
_QF_STOPWORDS = ("the", "a", "is", "of")
_QF_MIN_STOP = 2


# Shared by the batch query below and streaming_quality_filter
# (streaming/windows.py): the drained stream must equal the batch
# verdicts row-for-row, so both check against the same SQL.
_QF_ORACLE = f"""
    WITH s AS (
      SELECT doc_id, lang, length(text) AS nc,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(
                         trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
                  END AS nw,
             len(list_filter(
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''),
                   x -> x IN {str(_QF_STOPWORDS)})) AS stp
      FROM documents),
    verdict AS (
      SELECT doc_id, lang, nw,
             CASE WHEN nw < {_QF_MIN_WORDS} THEN 'too_short'
                  WHEN nc > {_QF_MAX_CHARS} THEN 'too_long'
                  WHEN nc * 1000 // nw < {_QF_WL_LO}
                       OR nc * 1000 // nw > {_QF_WL_HI} THEN 'word_length'
                  WHEN lang = 'en' AND stp < {_QF_MIN_STOP} THEN 'low_stopword'
                  ELSE 'kept' END AS reason
      FROM s)
    SELECT doc_id, lang, CAST(nw AS BIGINT) AS n_words, reason,
           reason = 'kept' AS keep
    FROM verdict
    """


@query(
    "quality_filter_funnel",
    oracle=_QF_ORACLE,
    doc="Quality-filter funnel: the composed keep/drop pass a curation "
    "pipeline runs before training ingest — four heuristics in fixed "
    f"precedence (word count < {_QF_MIN_WORDS} → too_short; chars > "
    f"{_QF_MAX_CHARS} → too_long; chars-per-word outside "
    f"[{_QF_WL_LO},{_QF_WL_HI}]‰ → word_length; <{_QF_MIN_STOP} "
    "stopwords in an English doc → low_stopword), each verdict "
    "attributed to the FIRST failing rule so drop-reason dashboards "
    "are additive. All ratios integer permille — hash-exact.",
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One narrow scan: every rule is a codegen column expression over
    the same projected stats, the CASE chain collapses to a single
    whole-stage-codegen stage, and there is NO shuffle at any scale —
    verdicts are embarrassingly parallel. Downstream counts-by-reason
    aggregate map-side. The verdict expressions are shared verbatim
    with the streaming path (streaming/windows.py
    streaming_quality_filter) — one rule set, batch and stream."""
    return funnel_verdicts(fan_out(_t(spark, sf_dir, "documents")["documents"]))


def funnel_verdicts(d: DataFrame, extra: dict | None = None) -> DataFrame:
    """The funnel's verdict columns over any (doc_id, lang, text)
    DataFrame — batch or streaming (every expression is stateless
    codegen, so the same plan fragment serves both).

    ``extra`` (r14 opt): ``{name: Column-over-d}`` passthrough columns
    computed in the SAME projection and appended to the output. The
    composed fate pipeline uses this to fold its md5/eval flags into
    the verdict pass instead of re-scanning the corpus and joining the
    two passes back together on doc_id (guide §2.4 — the join and its
    two exchanges disappear; one scan serves both). The verdict
    expressions themselves stay byte-identical for every caller."""
    text = F.col("text")
    squashed = F.regexp_replace(text, r"\s+", " ")
    toks = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda x: x != "")
    extra = extra or {}
    stats = d.select(
        "doc_id",
        "lang",
        F.length(text).alias("nc"),
        F.when(F.trim(text) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(squashed), " ")))
        .alias("nw"),
        F.size(F.filter(toks, lambda x: x.isin(*_QF_STOPWORDS))).alias("stp"),
        *[c.alias(n) for n, c in extra.items()],
    )
    nc, nw, stp = F.col("nc"), F.col("nw"), F.col("stp")
    wl = F.expr("nc * 1000 div nw")
    reason = (
        F.when(nw < _QF_MIN_WORDS, "too_short")
        .when(nc > _QF_MAX_CHARS, "too_long")
        .when((wl < _QF_WL_LO) | (wl > _QF_WL_HI), "word_length")
        .when((F.col("lang") == "en") & (stp < _QF_MIN_STOP), "low_stopword")
        .otherwise("kept")
    )
    return stats.select(
        "doc_id",
        "lang",
        nw.cast("long").alias("n_words"),
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
        *extra.keys(),
    )


@query(
    "readability_scores",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
             regexp_replace(lower(text), '[aeiouy]+', chr(1), 'g') AS syl_marked
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_words,
             CAST(greatest(
               length(norm) - length(replace(norm, '.', ''))
               + length(norm) - length(replace(norm, '!', ''))
               + length(norm) - length(replace(norm, '?', '')), 1)
               AS BIGINT) AS n_sentences,
             CAST(length(syl_marked)
                  - length(replace(syl_marked, chr(1), '')) AS BIGINT)
               AS n_syllables
      FROM t WHERE norm <> '')
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(206835 - (1015000 * n_words) // n_sentences
                       - (84600 * n_syllables * 1000) // (n_words * 1000)
                AS BIGINT) AS fre_milli,
           CASE WHEN 206835 - (1015000 * n_words) // n_sentences
                     - (84600 * n_syllables * 1000) // (n_words * 1000)
                     >= 70000 THEN 'easy'
                WHEN 206835 - (1015000 * n_words) // n_sentences
                     - (84600 * n_syllables * 1000) // (n_words * 1000)
                     >= 50000 THEN 'standard'
                WHEN 206835 - (1015000 * n_words) // n_sentences
                     - (84600 * n_syllables * 1000) // (n_words * 1000)
                     >= 30000 THEN 'difficult'
                ELSE 'very_difficult' END AS band
    FROM m
    """,
    doc="Flesch reading-ease scoring, integer-exact: per document, "
    "word count, sentence count (terminal .!? marks, floored at 1), "
    "a vowel-group syllable proxy (each [aeiouy]+ run = one "
    "syllable), and the Flesch formula in milli-points computed with "
    "floor division only -- 206.835 - 1.015(W/S) - 84.6(Syl/W) "
    "becomes 206835 - 1015000*W DIV S - 84600*Syl*1000 DIV (W*1000), "
    "defined AS the integer formula so both engines emit identical "
    "longs (no libm, no float ratios). The readability quality "
    "signal reading-level curricula and kid-safe filters key on.",
)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: pure scan->project, all codegen expressions, no
    shuffle at any scale. The syllable proxy is one regexp pass; the
    control character marker cannot appear in real text (and the
    normalized corpus strips it anyway)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    norm = norm_text(F.col("text"))
    syl_marked = F.regexp_replace(F.lower(F.col("text")), "[aeiouy]+", "\x01")
    m = d.select(
        "doc_id",
        norm.alias("norm"),
        (
            F.length(syl_marked)
            - F.length(F.replace(syl_marked, F.lit("\x01"), F.lit("")))
        )
        .cast("long")
        .alias("n_syllables"),
    ).filter(F.col("norm") != "")

    def _cnt(ch: str):
        return F.length(F.col("norm")) - F.length(
            F.replace(F.col("norm"), F.lit(ch), F.lit(""))
        )

    m = m.select(
        "doc_id",
        F.size(F.split("norm", " ")).cast("long").alias("n_words"),
        F.greatest(_cnt(".") + _cnt("!") + _cnt("?"), F.lit(1))
        .cast("long")
        .alias("n_sentences"),
        "n_syllables",
    )
    fre = F.expr(
        "CAST(206835 - (1015000 * n_words) DIV n_sentences "
        "- (84600 * n_syllables * 1000) DIV (n_words * 1000) AS BIGINT)"
    )
    return m.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        fre.alias("fre_milli"),
    ).withColumn(
        "band",
        F.when(F.col("fre_milli") >= 70000, "easy")
        .when(F.col("fre_milli") >= 50000, "standard")
        .when(F.col("fre_milli") >= 30000, "difficult")
        .otherwise("very_difficult"),
    )


_SKIP_MIN_COUNT = 5
_SKIP_TOP_K = 100


@query(
    "skipgram_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
      FROM documents),
    pairs AS (
      SELECT t[i] AS w1, t[i + d] AS w2
      FROM toks,
           unnest([1, 2]) AS dd(d),
           unnest(range(1, greatest(len(t) - d, 0) + 1)) AS u(i)),
    counted AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
      FROM pairs GROUP BY w1, w2
      HAVING COUNT(*) >= {_SKIP_MIN_COUNT})
    SELECT w1, w2, n
    FROM counted
    ORDER BY n DESC, w1, w2
    LIMIT {_SKIP_TOP_K}
    """,
    doc="Skip-gram co-occurrence pairs (the word2vec/GloVe training-"
    f"pair construction, window ±2): ordered token pairs at distance "
    f"1 or 2, counted corpus-wide, support ≥ {_SKIP_MIN_COUNT}, top "
    f"{_SKIP_TOP_K} by count with full lexicographic tiebreak. The "
    "co-occurrence statistic embedding trainers and PMI-based "
    "collocation miners consume. Pair generation is a per-document "
    "array transform — no self-join: each doc emits ~2|tokens| "
    "pairs inline.",
)
def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: pair generation is a codegen array transform in
    the scan (NO inverted-index self-join — the window bound makes
    pairs linear in corpus size, ~2 per token); one map-side-
    combining aggregate on (w1, w2); the top-k is TakeOrdered over
    the counted pairs, never a global sort. Zipf skew concentrates
    mass on few keys but partial aggregation absorbs it map-side —
    the reducer sees one row per distinct pair per mapper."""
    d = _t(spark, sf_dir, "documents")["documents"]
    t = F.split(norm_text(F.col("text")), " ")
    toks = d.select(t.alias("t"))

    def _pairs_at(dist: int):
        # zip_with over shifted slices (see word_ngrams: a lambda
        # referencing the aliased tokenize re-runs it per element);
        # the slice-length guard subsumes the old size > dist branch
        m = F.greatest(F.size("t") - dist, F.lit(0))
        return F.zip_with(
            F.slice("t", 1, m),
            F.slice("t", 1 + dist, m),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        )

    pairs = toks.select(
        F.explode(F.concat(_pairs_at(1), _pairs_at(2))).alias("p")
    ).select("p.w1", "p.w2")
    counted = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _SKIP_MIN_COUNT)
    )
    return counted.orderBy(
        F.col("n").desc(), "w1", "w2"
    ).limit(_SKIP_TOP_K)


# -- char_bigram_surprisal --------------------------------------------------


@query(
    "char_bigram_surprisal",
    oracle="""
    WITH nt AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
        FROM documents
    ),
    bg AS (
        SELECT doc_id, substr(t, i, 2) AS b
        FROM nt, unnest(range(1, greatest(length(t), 1))) AS u(i)
        WHERE length(t) >= 2
    ),
    model AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY b
    ),
    tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n,
               CAST(length(bin(SUM(cnt))) - 1 AS BIGINT) AS log2_tot
        FROM model
    ),
    scored AS (
        SELECT g.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(t.log2_tot - (length(bin(m.cnt)) - 1)) AS BIGINT)
                 AS total_bits
        FROM bg g JOIN model m ON m.b = g.b CROSS JOIN tot t
        GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_bigrams, 0) AS n_bigrams,
           COALESCE(s.total_bits, 0) AS total_bits,
           CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 0
                ELSE s.total_bits * 1000 // s.n_bigrams END AS mean_millibits
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
    """,
    doc="Corpus-trained character-bigram surprisal — the CCNet-style "
    "perplexity-filter step with exact integer arithmetic: the model "
    "is the corpus's own bigram frequency table, a document's "
    "surprisal is Σ (⌊log2 N⌋ − ⌊log2 count(b)⌋) 'bits of surprise' "
    "over its bigram instances (rare transitions cost more), and "
    "⌊log2⌋ is computed as length(bin(n))−1 — an exact integer in "
    "both engines, so scores match bit-for-bit with no libm log "
    "anywhere. Emits per doc the bigram count, total bits, and "
    "mean milli-bits (DIV-exact); high mean-surprisal docs are the "
    "gibberish/boilerplate outliers a perplexity filter drops.",
)
def char_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two linear corpus passes, both embarrassingly parallel: (1)
    train — the bigram explode folds into ONE map-side-combined
    aggregate whose output is charset²-bounded (≤ a few thousand rows
    at ANY corpus size — the model is constant-sized like the Bloom
    filter); (2) score — re-derive bigrams, broadcast-join the model,
    per-doc rollup (partial aggs shrink the shuffle to one row per
    doc per partition). The intermediate exploded frame is never
    materialized (recomputing beats writing a chars-scale frame at
    100 TB). ⌊log2⌋ via bin()-string length keeps every score in
    exact int64 — no floating point in the whole plan."""
    d = _t(spark, sf_dir, "documents")["documents"]
    nt = norm_text(F.col("text"))
    # zip_with over the pre-split char array, NOT transform(sequence,
    # i -> nt.substr(i, 2)): higher-order lambdas evaluate interpreted
    # per ELEMENT, so any non-lambda subexpression in the body — here
    # the whole-document regex normalize inside substr — re-runs once
    # per character, turning the bigram build O(len^2) per doc. With
    # zip_with the normalize runs per ROW (as a HOF argument) and the
    # lambda touches only its element variables: measured 12.6 s ->
    # 1.05 s for the corpus bigram-count pass at sf0.1, byte-identical
    # output (r11). Edge cases: split('', '') = [''] and a 1-char doc
    # both give size-1 arrays, so n = 0 yields the same empty bigram
    # array the old length-guard produced.
    chars = F.split(nt, "")
    n_pairs = F.greatest(F.size(chars) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(chars, 1, n_pairs),
        F.slice(chars, 2, n_pairs),
        lambda a, b: F.concat(a, b),
    )
    base = fan_out(d.select("doc_id", "text")).select(
        "doc_id", F.explode_outer(bigrams).alias("b")
    )
    model = (
        base.where(F.col("b").isNotNull())
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = model.select(
        (F.length(F.expr("bin(sum(cnt))")) - 1).cast("long").alias("log2_tot")
    )
    bits = (
        F.col("log2_tot") - (F.length(F.expr("bin(cnt)")) - 1).cast("long")
    )
    scored = (
        base.join(F.broadcast(model), "b", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.col("b")).alias("n_bigrams"),
            F.coalesce(
                F.sum(F.when(F.col("b").isNotNull(), bits)), F.lit(0).cast("long")
            ).alias("total_bits"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "total_bits",
        F.when(F.col("n_bigrams") == 0, F.lit(0).cast("long"))
        .otherwise(F.expr("total_bits * 1000 DIV n_bigrams"))
        .alias("mean_millibits"),
    )


# ---------------------------------------------------------------------------
# quality-threshold calibration — precision/recall per cutoff
# ---------------------------------------------------------------------------

_JUNK_MOD = 9  # docs with doc_id % 9 == 0 are replaced by known junk


@query(
    "quality_threshold_calibration",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % {_JUNK_MOD} = 0
                  THEN repeat('!? ', 5 + CAST(doc_id % 7 AS INTEGER))
                  ELSE text END AS text,
             doc_id % {_JUNK_MOD} = 0 AS is_bad
      FROM documents),
    {_quality_cte_sql("seeded")},
    lv AS (
      SELECT CAST(floor(s.quality * 1000 + 0.5) AS BIGINT) AS threshold_milli,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN d.is_bad THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bad
      FROM scored s JOIN seeded d USING (doc_id)
      GROUP BY 1),
    cum AS (
      SELECT threshold_milli,
             SUM(n) OVER (ORDER BY threshold_milli DESC
                          ROWS UNBOUNDED PRECEDING) AS kept,
             SUM(n_bad) OVER (ORDER BY threshold_milli DESC
                              ROWS UNBOUNDED PRECEDING) AS kept_bad,
             SUM(n) OVER () - SUM(n_bad) OVER () AS total_good
      FROM lv)
    SELECT threshold_milli,
           CAST(kept AS BIGINT) AS n_kept,
           CAST(kept_bad AS BIGINT) AS n_kept_bad,
           CAST((kept - kept_bad) * 1000000 // kept AS BIGINT)
             AS precision_ppm,
           CAST((kept - kept_bad) * 1000000 // total_good AS BIGINT)
             AS recall_ppm
    FROM cum
    """,
    doc="Quality-threshold calibration curve: plant KNOWN junk on "
    f"doc_id%{_JUNK_MOD}==0 (degenerate '!? ' repeats — high "
    "punctuation density, so the rule score genuinely ranks it low; "
    "nothing is circular), score the seeded corpus with the shared "
    "quality formula, then for every distinct score level report the "
    "keep-if-score>=threshold precision and recall against the "
    "planted labels in exact ppm. The audit that picks a production "
    "quality cutoff from data instead of folklore. Output is one row "
    "per distinct score level (bounded: the rule score takes ~a dozen "
    "values).",
)
def quality_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one scan computes the score (same pure-codegen
    expressions as quality_score) and the per-LEVEL aggregate is the
    only corpus-scale shuffle (map-side partials onto <=~dozen keys);
    the cumulative precision/recall windows then run on the bounded
    per-level frame — a |score levels|-row global window, the
    documented entity-bounded class, never doc-scale data."""
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    seeded_text = F.when(
        F.col("doc_id") % _JUNK_MOD == 0,
        F.expr(f"repeat('!? ', 5 + CAST(doc_id % 7 AS INT))"),
    ).otherwise(F.col("text"))
    text = F.col("text")
    squashed = F.regexp_replace(text, r"\s+", " ")
    base = d.select(
        "doc_id",
        seeded_text.alias("text"),
        (F.col("doc_id") % _JUNK_MOD == 0).alias("is_bad"),
    ).select(
        "is_bad",
        F.length(text).alias("nc"),
        F.when(F.trim(text) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(squashed), " ")))
        .alias("nw"),
        (
            F.length(text) - F.length(F.regexp_replace(text, r"\p{Punct}", ""))
        ).alias("np"),
    )
    nc, nw, np_ = F.col("nc"), F.col("nw"), F.col("np")
    mean_wl = nc.cast("double") / nw
    quality = (
        F.least(nw.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.5)
        + F.when(
            (nw > 0) & (mean_wl >= 3.0) & (mean_wl <= 12.0), F.lit(0.3)
        ).otherwise(F.lit(0.0))
        + F.when(
            np_.cast("double") / F.greatest(nc, F.lit(1)) < 0.1, F.lit(0.2)
        ).otherwise(F.lit(0.0))
    )
    lv = (
        base.select(
            F.floor(quality * 1000 + F.lit(0.5)).cast("long").alias(
                "threshold_milli"
            ),
            "is_bad",
        )
        .groupBy("threshold_milli")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("is_bad"), 1).otherwise(0)).alias("n_bad"),
        )
    )
    from pyspark.sql.window import Window as W

    wd = W.orderBy(F.col("threshold_milli").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    wall = W.partitionBy()
    cum = lv.select(
        "threshold_milli",
        F.sum("n").over(wd).alias("kept"),
        F.sum("n_bad").over(wd).alias("kept_bad"),
        (F.sum("n").over(wall) - F.sum("n_bad").over(wall)).alias(
            "total_good"
        ),
    )
    return cum.select(
        "threshold_milli",
        F.col("kept").alias("n_kept"),
        F.col("kept_bad").alias("n_kept_bad"),
        F.expr("(kept - kept_bad) * 1000000 DIV kept").alias("precision_ppm"),
        F.expr("(kept - kept_bad) * 1000000 DIV total_good").alias(
            "recall_ppm"
        ),
    )


# -- script_mix_profile -------------------------------------------------------

# Fixture gates (FIXTURES.md): coprime with the 20-way source split so
# each gate hits a ~uniform slice of every source. The appended runs
# make every script class non-empty at any sf.
_SCRIPT_CYR_MOD = 3  # Cyrillic run on ~1/3 of docs
_SCRIPT_CJK_MOD = 7  # CJK run on ~1/7 of docs
_SCRIPT_BAD_MOD = 11  # U+FFFD replacement chars: mojibake marker


@query(
    "script_mix_profile",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, source,
             text
               || CASE WHEN doc_id % {_SCRIPT_CYR_MOD} = 0
                    THEN ' привет мир данные' ELSE '' END
               || CASE WHEN doc_id % {_SCRIPT_CJK_MOD} = 0
                    THEN ' 数据处理引擎' ELSE '' END
               || CASE WHEN doc_id % {_SCRIPT_BAD_MOD} = 0
                    THEN ' ��' ELSE '' END
               || ' rev ' || CAST(doc_id % 100 AS VARCHAR) AS t
      FROM documents
    ),
    cls AS (
      SELECT source,
             length(t) AS nc,
             length(t) - length(regexp_replace(t, '[a-zA-Z]', '', 'g'))
               AS n_latin,
             length(t) - length(regexp_replace(t, '[Ѐ-ӿ]', '', 'g'))
               AS n_cyr,
             length(t) - length(regexp_replace(t, '[一-鿿]', '', 'g'))
               AS n_cjk,
             length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
               AS n_digit,
             length(t) - length(regexp_replace(t, '�', '', 'g'))
               AS n_repl
      FROM seeded
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(n_latin) AS HUGEINT) * 1000000
                // CAST(SUM(nc) AS HUGEINT) AS BIGINT) AS latin_ppm,
           CAST(CAST(SUM(n_cyr) AS HUGEINT) * 1000000
                // CAST(SUM(nc) AS HUGEINT) AS BIGINT) AS cyrillic_ppm,
           CAST(CAST(SUM(n_cjk) AS HUGEINT) * 1000000
                // CAST(SUM(nc) AS HUGEINT) AS BIGINT) AS cjk_ppm,
           CAST(CAST(SUM(n_digit) AS HUGEINT) * 1000000
                // CAST(SUM(nc) AS HUGEINT) AS BIGINT) AS digit_ppm,
           CAST(COUNT(*) FILTER (WHERE n_cyr > 0 AND n_cjk > 0)
                AS BIGINT) AS mixed_script_docs,
           CAST(COUNT(*) FILTER (WHERE n_repl > 0)
                AS BIGINT) AS mojibake_docs
    FROM cls GROUP BY source
    """,
    doc="Unicode script profiling — the encoding-health audit every "
    "web-scale ingest runs before language ID: per-document character "
    "counts by script class (Latin, Cyrillic, CJK, digit) plus U+FFFD "
    "replacement-character detection (the universal mojibake "
    "tombstone left by lossy transcoding), rolled up per source as "
    "exact integer ppm of characters. The fixture appends script "
    f"runs on coprime gates (Cyrillic doc%{_SCRIPT_CYR_MOD}, CJK "
    f"doc%{_SCRIPT_CJK_MOD}, U+FFFD doc%{_SCRIPT_BAD_MOD}) so every "
    "class and the mixed-script intersection are non-empty. "
    "mixed_script_docs (Cyrillic AND CJK in one doc) is the "
    "encoding-confusion flag a cleaning pass would route to "
    "re-detection.",
)
def script_mix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: pure codegen — one scan computes six
    length-difference counters per row (each a character-class regex
    strip, JVM-side, no UDF), and the only shuffle is the |sources|-
    key rollup with map-side partials. The char-class counts use
    length(t) - length(regexp_replace(t, class, '')): identical
    semantics in Java regex and RE2 for literal BMP ranges, so the
    oracle is exact. ppm math is the DECIMAL DIV idiom — no floats
    anywhere."""
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % _SCRIPT_CYR_MOD == 0,
            F.lit(" привет мир данные"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % _SCRIPT_CJK_MOD == 0, F.lit(" 数据处理引擎")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % _SCRIPT_BAD_MOD == 0, F.lit(" ��")
        ).otherwise(F.lit("")),
        F.lit(" rev "),
        (F.col("doc_id") % 100).cast("string"),
    )

    def _cls(pattern: str) -> F.Column:
        return F.length(F.col("t")) - F.length(
            F.regexp_replace(F.col("t"), pattern, "")
        )

    cls = d.select("source", t.alias("t")).select(
        "source",
        F.length("t").alias("nc"),
        _cls(r"[a-zA-Z]").alias("n_latin"),
        _cls("[Ѐ-ӿ]").alias("n_cyr"),
        _cls("[一-鿿]").alias("n_cjk"),
        _cls(r"[0-9]").alias("n_digit"),
        _cls("�").alias("n_repl"),
    )

    def _ppm(col: str) -> F.Column:
        return F.expr(
            f"CAST(CAST(SUM({col}) AS DECIMAL(38,0)) * 1000000"
            " DIV CAST(SUM(nc) AS DECIMAL(38,0)) AS BIGINT)"
        )

    return cls.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        _ppm("n_latin").alias("latin_ppm"),
        _ppm("n_cyr").alias("cyrillic_ppm"),
        _ppm("n_cjk").alias("cjk_ppm"),
        _ppm("n_digit").alias("digit_ppm"),
        F.count(F.when((F.col("n_cyr") > 0) & (F.col("n_cjk") > 0), 1))
        .cast("long")
        .alias("mixed_script_docs"),
        F.count(F.when(F.col("n_repl") > 0, 1))
        .cast("long")
        .alias("mojibake_docs"),
    )


# -- tokenizer_fertility ------------------------------------------------------


@query(
    "tokenizer_fertility",
    oracle="""
    WITH seeded AS (
      SELECT lang, source,
             text || ' v' || CAST(doc_id % 10 AS VARCHAR) || '.'
                  || CAST(doc_id % 7 AS VARCHAR)
                  || CASE WHEN lang = 'zh' THEN ' 数据处理引擎'
                          ELSE '' END AS t
      FROM documents
    ),
    per_doc AS (
      SELECT lang, source,
             CASE WHEN trim(t) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(t), '\\s+')) END
               AS nw,
             len(regexp_extract_all(t,
                 '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS nt,
             strlen(t) AS nb
      FROM per_doc_src
    ),
    per_doc_src AS (SELECT * FROM seeded)
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS ws_tokens,
           CAST(SUM(nt) AS BIGINT) AS bpe_ish_tokens,
           CAST(CAST(SUM(nt) AS HUGEINT) * 1000000
                // CAST(SUM(nw) AS HUGEINT) AS BIGINT) AS fertility_ppm,
           CAST(CAST(SUM(nb) AS HUGEINT) * 1000000
                // CAST(SUM(nt) AS HUGEINT) AS BIGINT)
             AS bytes_per_token_ppm
    FROM per_doc GROUP BY 1, 2
    """,
    doc="Tokenizer fertility audit: tokens-per-word and "
    "bytes-per-token by (lang, source) — the standard multilingual "
    "capacity check (fertility >> 1 means the tokenizer fragments "
    "that language; bytes/token tracks UTF-8 weight). Reuses "
    "token_count's two tokenizations (whitespace words, BPE-ish "
    "pre-tokenizer regex) and byte length, rolled up as exact "
    "integer ppm. The fixture appends a version suffix (digits + "
    "punctuation fragment under the BPE-ish regex) to every doc and "
    "a CJK run to zh docs, so fertility genuinely varies by "
    "language — zh > 1 token/word via char-level CJK splits, and "
    "its bytes/token carries the 3-byte UTF-8 weight. A training mix would re-weight or re-train the "
    "tokenizer where fertility_ppm spikes for a language.",
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: one scan, three pure-codegen counters per row
    (whitespace split size, BPE-ish regex extract size, octet
    length), one shuffle onto |langs|x|sources| keys with map-side
    partials — the bounded-output rollup class. The ratio math is
    the DECIMAL DIV idiom; DuckDB twin uses HUGEINT // so both sides
    are exact integer floor."""
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    t = F.concat(
        F.col("text"),
        F.lit(" v"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("lang") == "zh", F.lit(" 数据处理引擎")).otherwise(
            F.lit("")
        ),
    )
    seeded = d.select("lang", "source", t.alias("t"))
    bpe = F.size(
        F.regexp_extract_all(
            "t", F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0
        )
    )
    per_doc = seeded.select(
        "lang",
        "source",
        word_count("t").cast("long").alias("nw"),
        bpe.cast("long").alias("nt"),
        F.octet_length("t").cast("long").alias("nb"),
    )

    def _ratio_ppm(num: str, den: str) -> F.Column:
        return F.expr(
            f"CAST(CAST(SUM({num}) AS DECIMAL(38,0)) * 1000000"
            f" DIV CAST(SUM({den}) AS DECIMAL(38,0)) AS BIGINT)"
        )

    return per_doc.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nw").cast("long").alias("ws_tokens"),
        F.sum("nt").cast("long").alias("bpe_ish_tokens"),
        _ratio_ppm("nt", "nw").alias("fertility_ppm"),
        _ratio_ppm("nb", "nt").alias("bytes_per_token_ppm"),
    )


# ---------------------------------------------------------------------------
# token frequency spectrum (Zipf / hapax naturalness audit)
# ---------------------------------------------------------------------------


@query(
    "token_freq_spectrum",
    oracle="""
    WITH tok AS (
      SELECT source, UNNEST(regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS w
      FROM documents
      WHERE trim(text) <> ''),
    tf AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY source, w),
    spec AS (
      SELECT source, CAST(FLOOR(LOG2(cnt)) AS INT) AS freq_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens
      FROM tf GROUP BY 1, 2),
    tot AS (
      SELECT source, SUM(n_types) AS v, SUM(n_tokens) AS t
      FROM spec GROUP BY source)
    SELECT s.source, s.freq_bucket, s.n_types, s.n_tokens,
           CAST(CAST(s.n_types AS HUGEINT) * 1000000
                // CAST(tot.v AS HUGEINT) AS BIGINT) AS type_ppm,
           CAST(CAST(s.n_tokens AS HUGEINT) * 1000000
                // CAST(tot.t AS HUGEINT) AS BIGINT) AS token_ppm
    FROM spec s JOIN tot ON tot.source = s.source
    """,
    doc="Token frequency-of-frequencies spectrum per source — the "
    "Zipf/Heaps naturalness audit for a training corpus: types and "
    "token mass per doubling bucket floor(log2(count)). Natural text "
    "puts ~40-60% of types in bucket 0 (hapax legomena); OCR noise "
    "explodes bucket 0, templated/spam corpora collapse the spectrum "
    "into high buckets. Complements vocab_growth (Heaps curve over "
    "epochs) and rare_token_retention (filter impact): this is the "
    "single-snapshot shape of the frequency distribution itself. "
    "Shares are the exact DECIMAL-division ppm idiom; floor(log2) is "
    "cross-engine safe because log2(n) lands exactly on an integer "
    "only at powers of two, where both libms are exact.",
)
def token_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: ONE corpus-scale shuffle — the (source, token)
    count, with map-side partial aggregation (the classic word-count
    reduction). The spectrum rollup aggregates the |vocab|-sized
    frame onto (source, bucket) keys (~20 buckets per source), and
    the per-source totals frame is |sources| x ~20 rows, broadcast
    back; the spectrum frame is lazily checkpointed so its two
    consumers share ONE corpus pass. No windows, no UDFs — the whole
    plan is codegen'd hash-aggregate over hash-aggregate."""
    d = _t(spark, sf_dir, "documents")["documents"]
    tok = (
        fan_out(d.select("source", "text"))
        .filter(F.trim(F.col("text")) != "")
        .select(
            "source",
            F.explode(F.split(norm_text(F.col("text")), " ")).alias("w"),
        )
    )
    tf = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    # The spectrum frame feeds two consumers (the per-source totals
    # and the final join); without a barrier the whole corpus
    # pipeline runs twice (Spark 4.1 exchange reuse does not fire
    # across the differing aggregates). It is |sources| x ~20 rows —
    # lazily checkpointing it costs nothing and halves the corpus
    # passes.
    spec = (
        tf.groupBy(
            "source",
            F.floor(F.log2("cnt")).cast("int").alias("freq_bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("cnt").cast("long").alias("n_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    tot = spec.groupBy("source").agg(
        F.sum("n_types").alias("v"), F.sum("n_tokens").alias("t")
    )
    joined = spec.join(F.broadcast(tot), "source")
    ppm = lambda num, den: F.expr(  # noqa: E731 — exact integer ppm
        f"CAST(CAST({num} AS DECIMAL(38,0)) * 1000000"
        f" DIV CAST({den} AS DECIMAL(38,0)) AS BIGINT)"
    )
    return joined.select(
        "source",
        "freq_bucket",
        "n_types",
        "n_tokens",
        ppm("n_types", "v").alias("type_ppm"),
        ppm("n_tokens", "t").alias("token_ppm"),
    )


# ---------------------------------------------------------------------------
# PMI collocations — corpus-level word-association extraction
# ---------------------------------------------------------------------------

_PMI_MIN_SUPPORT = 5  # minimum adjacent-bigram count to score
_PMI_TOP_K = 50


@query(
    "pmi_collocations",
    oracle=f"""
    WITH words AS (
      SELECT doc_id,
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                 || CASE WHEN doc_id % 4 = 0
                         THEN ' pair_alpha pair_beta' ELSE '' END,
               ' ') AS w
      FROM documents),
    uni AS (
      SELECT u.word, CAST(COUNT(*) AS BIGINT) AS c
      FROM words, UNNEST(w) AS u(word) GROUP BY u.word),
    n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS nw FROM uni),
    bi AS (
      SELECT w[i] AS a, w[i+1] AS b, CAST(COUNT(*) AS BIGINT) AS cab
      FROM words, UNNEST(range(1, len(w))) AS t(i)
      GROUP BY w[i], w[i+1]),
    nb AS (SELECT CAST(SUM(cab) AS BIGINT) AS np FROM bi),
    scored AS (
      SELECT bi.a, bi.b, bi.cab, ua.c AS ca, ub.c AS cb,
             CAST((length(bin(bi.cab * n1.nw * n1.nw)) - 1)
                  - (length(bin(nb.np * ua.c * ub.c)) - 1) AS BIGINT)
               AS pmi_bits
      FROM bi JOIN uni ua ON ua.word = bi.a
              JOIN uni ub ON ub.word = bi.b
              CROSS JOIN n1 CROSS JOIN nb
      WHERE bi.cab >= {_PMI_MIN_SUPPORT})
    SELECT a, b, cab, ca, cb, pmi_bits
    FROM scored
    ORDER BY pmi_bits DESC, cab DESC, a, b
    LIMIT {_PMI_TOP_K}
    """,
    doc="Top collocations by pointwise mutual information — the "
    "classic corpus-association extractor (phrase mining, tokenizer "
    "merge candidates, stopword diagnostics). PMI(a,b) = "
    "log2(c_ab·N1² / (N_pairs·c_a·c_b)) in the exact floor-log2 "
    "integer idiom (length(bin(·))−1 over BIGINT products), so the "
    "score is an order-free integer and the oracle is hash-exact; "
    "ties break on (support DESC, a, b). A planted adjacent pair "
    "('pair_alpha pair_beta' on doc_id % 4 == 0, FIXTURES.md) gives "
    "the random-soup fixture corpus one guaranteed true collocation "
    "that must rank first.",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: ONE tokenize pass is shared (lazily checkpointed
    word arrays would still be corpus-scale, so instead the unigram
    and bigram COUNT frames — vocabulary-grain — are what live
    twice); each is one hash shuffle with map-side combine. Scoring
    joins are vocab-keyed (bigram frame ⋈ unigram counts twice); the
    two 1-row totals ride the whitelisted scalar crossJoin class.
    The global top-k compiles to TakeOrderedAndProject (per-partition
    heads, never a full sort). Integer-range note: c_ab·N1² must stay
    under 2^63 — past ~3e9 corpus tokens, rescale both log arguments
    by the same power of two (shift counts right) or promote to
    DECIMAL(38,0) with a double-floor fallback; the ranking is
    unchanged."""
    d = _t(spark, sf_dir, "documents")["documents"]
    # In-query fixture (FIXTURES.md): plant one true collocation.
    text_w = F.concat(
        norm_text("text"),
        F.when(
            F.col("doc_id") % 4 == 0, F.lit(" pair_alpha pair_beta")
        ).otherwise(F.lit("")),
    )
    w = d.select(F.split(text_w, " ").alias("w"))
    uni = (
        w.select(F.explode("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        w.select(
            F.explode(
                # Guarded: sequence(1, 0) is DESCENDING in Spark (the
                # word_ngrams pitfall) — a 1-word doc must yield an
                # EMPTY pair array, matching DuckDB's empty range().
                F.when(
                    F.size("w") >= 2,
                    F.expr(
                        "transform(sequence(1, size(w) - 1), "
                        "i -> struct(w[i-1] AS a, w[i] AS b))"
                    ),
                ).otherwise(
                    F.expr(
                        "CAST(array() AS array<struct<a: string, b: string>>)"
                    )
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= _PMI_MIN_SUPPORT)
    )
    n1 = uni.agg(F.sum("c").alias("nw"))
    # N_pairs must count ALL bigrams (including below-support ones):
    # derive it from the unigram frame — every doc of L words emits
    # L-1 pairs, so N_pairs = N1 - n_docs.
    ndocs = d.agg(F.count(F.lit(1)).alias("nd"))
    ilog2 = lambda e: (F.length(F.expr(f"bin({e})")) - 1).cast("long")
    ua = uni.select(F.col("word").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("word").alias("b"), F.col("c").alias("cb"))
    scored = (
        bi.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "a",
            "b",
            "cab",
            "ca",
            "cb",
            (ilog2("cab * nw * nw") - ilog2("(nw - nd) * ca * cb")).alias(
                "pmi_bits"
            ),
        )
    )
    return scored.orderBy(
        F.desc("pmi_bits"), F.desc("cab"), "a", "b"
    ).limit(_PMI_TOP_K)


# ---------------------------------------------------------------------------
# lang_segments — within-doc code-switching segmentation
# ---------------------------------------------------------------------------

_SEG_W = 30  # words per language-vote window
_SEG_PLANT = (
    " der x und x die x ist x nicht x der x und x die x ist x nicht"
)


def _seg_vote_sql(wt: str) -> str:
    """Window-grain language vote: the same fixed-precedence strict-'>'
    argmax as _lang_guess_sql, zero markers → 'und'."""
    score = {
        lang: "(" + " + ".join(_occurrences_sql(wt, m) for m in markers) + ")"
        for lang, markers in _LANG_MARKERS.items()
    }
    return f"""
      CASE
        WHEN {score['de']} > 0
             AND {score['de']} >= greatest({score['fr']}, {score['es']}, {score['en']})
          THEN 'de'
        WHEN {score['fr']} > 0
             AND {score['fr']} > {score['de']}
             AND {score['fr']} >= greatest({score['es']}, {score['en']})
          THEN 'fr'
        WHEN {score['es']} > 0
             AND {score['es']} > greatest({score['de']}, {score['fr']})
             AND {score['es']} >= {score['en']}
          THEN 'es'
        WHEN {score['en']} > 0
             AND {score['en']} > greatest({score['de']}, {score['fr']}, {score['es']})
          THEN 'en'
        ELSE 'und'
      END
    """


@query(
    "lang_segments",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source,
             regexp_split_to_array(
               trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))
                 || CASE WHEN doc_id % 7 = 0 THEN '{_SEG_PLANT}' ELSE '' END,
               ' ') AS w
      FROM documents),
    win AS (
      SELECT doc_id, source, i AS win_idx,
             ' ' || array_to_string(w[i*{_SEG_W}+1 : i*{_SEG_W}+{_SEG_W}], ' ') || ' ' AS wt
      FROM words,
           UNNEST(range(0, CAST(ceil(len(w)/{_SEG_W}.0) AS BIGINT))) AS t(i)),
    voted AS (
      SELECT doc_id, source, win_idx, {_seg_vote_sql('wt')} AS vote
      FROM win),
    flagged AS (
      SELECT doc_id, source, vote,
             CASE WHEN vote IS DISTINCT FROM
                       lag(vote) OVER (PARTITION BY doc_id ORDER BY win_idx)
                  THEN 1 ELSE 0 END AS boundary
      FROM voted),
    per_doc AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(boundary) AS BIGINT) AS n_segments,
             CASE WHEN COUNT(DISTINCT CASE WHEN vote <> 'und' THEN vote END) > 1
                  THEN 1 ELSE 0 END AS mixed
      FROM flagged GROUP BY doc_id, source)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(mixed) AS BIGINT) AS mixed_docs,
           CAST(SUM(n_windows) AS BIGINT) AS total_windows,
           CAST(SUM(n_segments) AS BIGINT) AS total_segments,
           CAST(MAX(n_segments) AS BIGINT) AS max_segments
    FROM per_doc GROUP BY source
    """,
    doc="Within-document code-switching segmentation — the pass that "
    "splits mixed-language documents before language-specific "
    f"processing: {_SEG_W}-word windows each get the lang_id marker "
    "vote (same fixed-precedence strict-'>' argmax; zero markers → "
    "'und'), and segment boundaries are vote changes between "
    "consecutive windows (LAG per doc). A planted German marker run "
    "on doc_id % 7 == 0 (coprime with the 20-way source split; "
    "markers isolated by filler so the non-overlapping replace-count "
    "sees each one; FIXTURES.md) makes every seventh document mixed. A doc is 'mixed' only when "
    "TWO DISTINCT real languages vote ('und' windows never qualify). "
    "Per-source rollup: docs, mixed docs, window/segment totals, max "
    "segments.",
)
def lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: windowing is a narrow posexplode (window TEXT is
    materialized once per window, scores are replace-length deltas in
    codegen — no regex per marker, no Python); the only corpus-scale
    shuffle is the per-doc LAG window, hash-keyed on doc_id (uniform,
    tiny groups — a doc's windows), followed by the map-side-combined
    per-doc and |sources| rollups. Window-grain CJK is handled at the
    doc level by lang_id; this operator votes on the Latin marker
    families only."""
    d = _t(spark, sf_dir, "documents")["documents"]
    planted = F.concat(
        norm_text("text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(_SEG_PLANT)).otherwise(
            F.lit("")
        ),
    )
    from dungbeetle_spark.functions.arrays import hof_let

    w = d.select("doc_id", "source", F.split(planted, " ").alias("w"))
    # hof_let: the window lambda must not reference the aliased split
    # (projection collapse would re-run normalize+plant+split per
    # WINDOW — see functions/arrays.py).
    windows = hof_let(
        F.col("w"),
        lambda warr: F.transform(
            F.sequence(
                F.lit(0), F.ceil(F.size(warr) / F.lit(_SEG_W)).cast("int") - 1
            ),
            lambda i: F.concat(
                F.lit(" "),
                F.array_join(F.slice(warr, i * _SEG_W + 1, _SEG_W), " "),
                F.lit(" "),
            ),
        ),
    )
    win = w.select(
        "doc_id",
        "source",
        F.posexplode(windows).alias("win_idx", "wt"),
    )
    wt = F.col("wt")
    scores = win.select(
        "doc_id",
        "source",
        "win_idx",
        *[
            sum(
                (_occurrences(wt, m) for m in markers), start=F.lit(0.0)
            ).alias(f"s_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    best, best_score = F.lit("und"), F.lit(0.0)
    for lang in ("de", "fr", "es", "en"):
        s = F.col(f"s_{lang}")
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    voted = scores.select("doc_id", "source", "win_idx", best.alias("vote"))
    lag = F.lag("vote").over(W.partitionBy("doc_id").orderBy("win_idx"))
    flagged = voted.select(
        "doc_id",
        "source",
        "vote",
        F.when(~F.col("vote").eqNullSafe(lag), 1).otherwise(0).alias("boundary"),
    )
    per_doc = flagged.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("boundary").alias("n_segments"),
        F.when(
            F.countDistinct(
                F.when(F.col("vote") != "und", F.col("vote"))
            )
            > 1,
            1,
        )
        .otherwise(0)
        .alias("mixed"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("mixed").cast("long").alias("mixed_docs"),
        F.sum("n_windows").cast("long").alias("total_windows"),
        F.sum("n_segments").cast("long").alias("total_segments"),
        F.max("n_segments").cast("long").alias("max_segments"),
    )


# -- template_spam_clusters ---------------------------------------------------


@query(
    "template_spam_clusters",
    oracle="""
    WITH shaped AS (
      SELECT doc_id, source,
             md5(regexp_replace(regexp_replace(text, '[0-9]+', '#', 'g'),
                                '[A-Za-z]+', 'w', 'g')) AS shape,
             md5(text) AS th
      FROM documents
    )
    SELECT shape,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT th) AS BIGINT) AS n_variants,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM shaped
    GROUP BY shape
    HAVING COUNT(*) >= 2 AND COUNT(DISTINCT th) >= 2
    """,
    doc="Template/form-letter detection — the near-dup class MinHash "
    "misses when slot values dominate the shingles: every document "
    "collapses to its SHAPE (digit runs → '#', letter runs → 'w', "
    "punctuation and whitespace kept verbatim), and shapes with >= 2 "
    "docs AND >= 2 distinct texts are template clusters — same "
    "skeleton, different slot fillings (machine-generated spam, "
    "boilerplate mail, scraped listing pages). Identical-text groups "
    "are deliberately excluded (n_variants >= 2): those are plain "
    "exact dups, dedup_exact's job. Pure JVM regex + one md5-keyed "
    "aggregate; the oracle replays the same two regex passes.",
)
def template_spam_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: shape and text hashes are map-side projections;
    ONE groupBy(shape) shuffle moving (shape, th, source, doc_id)
    compact rows; output bounded by the number of template clusters.
    At 100 TB this is the cheap screen that routes template families
    to slot-aware dedup instead of burning minhash bands on them."""
    d = _t(spark, sf_dir, "documents")["documents"]
    shaped = d.select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), "[0-9]+", "#"),
                "[A-Za-z]+",
                "w",
            )
        ).alias("shape"),
        F.md5("text").alias("th"),
    )
    return (
        shaped.groupBy("shape")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("th").alias("n_variants"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .filter((F.col("n_docs") >= 2) & (F.col("n_variants") >= 2))
    )


# -- bpe_merge_ranks ----------------------------------------------------------

_BPE_MERGES = 6  # merge rounds learned (top-K of the merge table)


@query(
    "bpe_merge_ranks",
    oracle="""
    WITH wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
              AS word FROM documents)
      GROUP BY word HAVING length(word) >= 2
    ),
    w0 AS (
      SELECT word, freq,
             ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
      FROM wf
    ),
    p1 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w0),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    w1 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w0 w, b1 b
    ),
    p2 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w1),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
    w2 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w1 w, b2 b
    ),
    p3 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w2),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
    w3 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w2 w, b3 b
    ),
    p4 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w3),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b4 AS (SELECT pair, cnt FROM p4 ORDER BY cnt DESC, pair LIMIT 1),
    w4 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w3 w, b4 b
    ),
    p5 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w4),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b5 AS (SELECT pair, cnt FROM p5 ORDER BY cnt DESC, pair LIMIT 1),
    w5 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w4 w, b5 b
    ),
    p6 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w5),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b6 AS (SELECT pair, cnt FROM p6 ORDER BY cnt DESC, pair LIMIT 1)
    SELECT 1 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM b1
    UNION ALL SELECT 2 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM b2
    UNION ALL SELECT 3 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM b3
    UNION ALL SELECT 4 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM b4
    UNION ALL SELECT 5 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM b5
    UNION ALL SELECT 6 AS rank, pair, replace(pair, ' ', '') AS merged, cnt FROM b6
    """,
    doc="Distributed BPE tokenizer training, the first "
    f"{_BPE_MERGES} merge rounds: corpus word frequencies drive the "
    "classic loop — count adjacent symbol pairs (weighted by word "
    "freq), merge the most frequent pair everywhere, repeat — exactly "
    "how production tokenizers are learned over TB corpora (pair "
    "counting is the distributed step; the argmax is one tiny row). "
    "Merge application is ONE space-anchored left-to-right "
    "non-overlapping replace per round — deterministic and verified "
    "byte-identical between Spark and DuckDB (runs of a repeated "
    "symbol under-merge alternately versus tokenizer-greedy; both "
    "engines agree, and merge RANKS — the deliverable — are "
    "unaffected at rank 1..K). Ties break on pair text, so the whole "
    "merge table is hash-exact; the oracle unrolls the loop as "
    f"{_BPE_MERGES} CTE layers, kmeans-style.",
)
def bpe_merge_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: each round is one map-side-combinable pair-count
    shuffle over the word-frequency table (VOCABULARY-grain, not
    corpus-grain — the corpus is scanned once to build wf) plus a
    1-row argmax collect (the same bounded driver step as the kmeans
    seed/centroid collects). The merge rewrite is a map-side string
    replace. K rounds = K small shuffles; at 100 TB the wf build
    dominates and everything after runs on |vocab| rows."""
    merges = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank int, pair string, merged string, cnt bigint"
    )


# Size guard for the collected-vocabulary merge loop: corpora whose
# documents row count (parquet footers, no Spark job) is at or under
# this take the driver-side loop; bigger corpora keep the distributed
# per-round shuffles. The vocabulary of the fixture corpora is tens of
# thousands of rows — trivially driver-sized — while a 100 TB crawl's
# vocabulary is not, which is exactly what the distributed path is for.
_BPE_DRIVER_DOCS_MAX = 1_000_000


def _bpe_learn_collected(wf_rows) -> list[tuple]:
    """The identical merge loop over a COLLECTED (word, freq) table —
    pure Python, zero per-round Spark jobs. Semantics byte-matched to
    the distributed loop (and the DuckDB oracle): per-word pair counts
    carry multiplicity, the argmax breaks ties on (-cnt, pair), and
    each merge is the space-anchored left-to-right non-overlapping
    replace. Pinned equal to the distributed loop by
    test_bpe_driver_loop_matches_distributed."""
    wf = {r["word"]: r["freq"] for r in wf_rows}
    syms = {w: " " + "".join(c + " " for c in w) for w in wf}
    merges: list[tuple] = []
    from collections import Counter

    for rank in range(1, _BPE_MERGES + 1):
        pairs: Counter = Counter()
        for w, freq in wf.items():
            parts = syms[w].split()
            for a, b in zip(parts, parts[1:]):
                pairs[f"{a} {b}"] += freq
        if not pairs:
            break  # degenerate corpus — same stop as the distributed loop
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, pair, pair.replace(" ", ""), int(cnt)))
        if rank < _BPE_MERGES:
            pat, rep = f" {pair} ", f" {pair.replace(' ', '')} "
            syms = {w: s.replace(pat, rep) for w, s in syms.items()}
    return merges


def _bpe_learn(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Run the merge-learning loop over the corpus word-frequency
    table; returns [(rank, pair, merged, cnt), ...] — shared by
    bpe_merge_ranks (the merge table) and bpe_compression_by_source
    (which re-applies the merges). Length-1 words carry no pairs and
    are excluded from the learning frame.

    r15 (VERDICT r14 item 5): the loop is K strictly sequential
    rounds of (vocabulary-grain pair-count shuffle + 1-row argmax
    collect) — driver-bound scheduling latency dominates at fixture
    scale. When the corpus row count (parquet footers, no Spark job —
    the dedup-family size-routing discipline) says the vocabulary is
    driver-sized, the corpus pays ONE distributed word-count pass and
    the merge loop runs collected; past the guard the distributed
    per-round loop remains the scale path."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = F.explode(
        F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda x: x != "")
    ).alias("word")
    wf_base = (
        fan_out(d.select("text"))
        .select(toks)
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    from dungbeetle_spark.sources.catalog import parquet_row_count

    if parquet_row_count(spark, sf_dir, "documents") <= _BPE_DRIVER_DOCS_MAX:
        return _bpe_learn_collected(wf_base.collect())
    wf = wf_base.withColumn(
        "sym", F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 "))
    ).localCheckpoint(eager=False)  # K pair-count consumers below
    pair_expr = (
        "CASE WHEN size(syms) > 1 THEN"
        " transform(sequence(1, size(syms) - 1),"
        " j -> concat(element_at(syms, j), ' ', element_at(syms, j + 1)))"
        " ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    merges = []
    cur = wf
    for rank in range(1, _BPE_MERGES + 1):
        counts = (
            cur.select("freq", F.split(F.trim("sym"), " ").alias("syms"))
            .select("freq", F.explode(F.expr(pair_expr)).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        rows = counts.orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect()
        if not rows:
            # Degenerate corpus: no word of length >= 2 survives, so
            # there is no pair to merge — stop with the merges learned
            # so far rather than raising an opaque IndexError.
            break
        best = rows[0]
        merges.append((rank, best["pair"], best["pair"].replace(" ", ""), best["cnt"]))
        if rank < _BPE_MERGES:
            # pair text is [a-z0-9 ] only (token alphabet), safe to inline
            pat = f" {best['pair']} "
            rep = f" {best['pair'].replace(' ', '')} "
            cur = cur.withColumn(
                "sym", F.expr(f"replace(sym, '{pat}', '{rep}')")
            ).localCheckpoint(eager=False)
    return merges


# -- quality_gate_shadow_audit ------------------------------------------------

# The v2 candidate rule set under shadow evaluation: tightened length
# band + a new digit-density rule. v1 IS the deployed funnel above
# (same _QF_* constants), so the audit provably diffs the live gate.
_QF2_MIN_WORDS = 30
_QF2_MAX_CHARS = 480
_QF2_WL_LO = 4900
_QF2_WL_HI = 5800
_QF2_MAX_DIGIT_PERMILLE = 300


@query(
    "quality_gate_shadow_audit",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, source, lang, length(text) AS nc,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(
                         trim(regexp_replace(text, '\\s+', ' ', 'g')), ' '))
                  END AS nw,
             len(list_filter(
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               x -> x <> ''),
                   x -> x IN {str(_QF_STOPWORDS)})) AS stp,
             length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
               AS nd
      FROM documents),
    v AS (
      SELECT source,
             CASE WHEN nw < {_QF_MIN_WORDS} THEN 'too_short'
                  WHEN nc > {_QF_MAX_CHARS} THEN 'too_long'
                  WHEN nc * 1000 // nw < {_QF_WL_LO}
                       OR nc * 1000 // nw > {_QF_WL_HI} THEN 'word_length'
                  WHEN lang = 'en' AND stp < {_QF_MIN_STOP} THEN 'low_stopword'
                  ELSE 'kept' END AS r1,
             CASE WHEN nw < {_QF2_MIN_WORDS} THEN 'too_short'
                  WHEN nc > {_QF2_MAX_CHARS} THEN 'too_long'
                  WHEN nd * 1000 // nc > {_QF2_MAX_DIGIT_PERMILLE}
                    THEN 'too_numeric'
                  WHEN nc * 1000 // nw < {_QF2_WL_LO}
                       OR nc * 1000 // nw > {_QF2_WL_HI} THEN 'word_length'
                  WHEN lang = 'en' AND stp < {_QF_MIN_STOP} THEN 'low_stopword'
                  ELSE 'kept' END AS r2
      FROM s),
    agg AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN r1 = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_v1,
             CAST(SUM(CASE WHEN r2 = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_v2,
             CAST(SUM(CASE WHEN r1 = 'kept' AND r2 = 'kept' THEN 1 ELSE 0 END)
                  AS BIGINT) AS kept_both,
             CAST(SUM(CASE WHEN r1 = 'kept' AND r2 <> 'kept' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tightened,
             CAST(SUM(CASE WHEN r1 <> 'kept' AND r2 = 'kept' THEN 1 ELSE 0 END)
                  AS BIGINT) AS loosened
      FROM v GROUP BY source),
    newr AS (
      SELECT source, r2 AS top_new_reason,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, r2) AS rk
      FROM v WHERE r1 = 'kept' AND r2 <> 'kept'
      GROUP BY source, r2)
    SELECT a.source, a.n_docs, a.kept_v1, a.kept_v2, a.kept_both,
           a.tightened, a.loosened,
           (a.tightened + a.loosened) * 1000000 // a.n_docs AS flip_ppm,
           COALESCE(n.top_new_reason, 'none') AS top_new_reason
    FROM agg a LEFT JOIN newr n ON n.source = a.source AND n.rk = 1
    """,
    doc="Shadow deployment audit for a quality-gate revision: v1 is "
    "the DEPLOYED funnel (same constants as quality_filter_funnel, so "
    "the diff is against the live rule set), v2 the candidate — "
    "tightened word/char bands plus a new digit-density rule. One "
    "pass computes both verdicts per doc; the rollup reports, per "
    "source, the keep/flip confusion (kept_both / tightened / "
    "loosened / flip ppm) and the dominant NEW drop reason — exactly "
    "what a data team reviews before flipping a filter on a 100 TB "
    "corpus, where a 2% unexpected flip rate is billions of docs.",
)
def quality_gate_shadow_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: both rule chains are codegen CASE columns over ONE
    narrow projected-stats scan (no second corpus pass for v2); the
    confusion rollup is one groupBy(source) with map-side combine and
    the top-new-reason window runs on the |sources| x |reasons| frame.
    No UDFs, no joins against fact data."""
    text = F.col("text")
    squashed = F.regexp_replace(text, r"\s+", " ")
    toks = F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda x: x != "")
    d = fan_out(_t(spark, sf_dir, "documents")["documents"])
    stats = d.select(
        "source",
        "lang",
        F.length(text).alias("nc"),
        F.when(F.trim(text) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(squashed), " ")))
        .alias("nw"),
        F.size(F.filter(toks, lambda x: x.isin(*_QF_STOPWORDS))).alias("stp"),
        (
            F.length(text) - F.length(F.regexp_replace(text, "[0-9]", ""))
        ).alias("nd"),
    )
    nc, nw, stp, nd = F.col("nc"), F.col("nw"), F.col("stp"), F.col("nd")
    wl = F.expr("nc * 1000 div nw")
    r1 = (
        F.when(nw < _QF_MIN_WORDS, "too_short")
        .when(nc > _QF_MAX_CHARS, "too_long")
        .when((wl < _QF_WL_LO) | (wl > _QF_WL_HI), "word_length")
        .when((F.col("lang") == "en") & (stp < _QF_MIN_STOP), "low_stopword")
        .otherwise("kept")
    )
    r2 = (
        F.when(nw < _QF2_MIN_WORDS, "too_short")
        .when(nc > _QF2_MAX_CHARS, "too_long")
        .when(F.expr("nd * 1000 div nc") > _QF2_MAX_DIGIT_PERMILLE, "too_numeric")
        .when((wl < _QF2_WL_LO) | (wl > _QF2_WL_HI), "word_length")
        .when((F.col("lang") == "en") & (stp < _QF_MIN_STOP), "low_stopword")
        .otherwise("kept")
    )
    v = stats.select("source", r1.alias("r1"), r2.alias("r2")).localCheckpoint(
        eager=False
    )  # two consumers: confusion rollup + new-reason mode
    agg = v.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("r1") == "kept", 1).otherwise(0)).alias("kept_v1"),
        F.sum(F.when(F.col("r2") == "kept", 1).otherwise(0)).alias("kept_v2"),
        F.sum(
            F.when((F.col("r1") == "kept") & (F.col("r2") == "kept"), 1).otherwise(0)
        ).alias("kept_both"),
        F.sum(
            F.when((F.col("r1") == "kept") & (F.col("r2") != "kept"), 1).otherwise(0)
        ).alias("tightened"),
        F.sum(
            F.when((F.col("r1") != "kept") & (F.col("r2") == "kept"), 1).otherwise(0)
        ).alias("loosened"),
    )
    newr = (
        v.filter((F.col("r1") == "kept") & (F.col("r2") != "kept"))
        .groupBy("source", "r2")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.desc("c"), F.asc("r2"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("source", F.col("r2").alias("top_new_reason"))
    )
    return (
        agg.join(newr, "source", "left")
        .select(
            "source",
            "n_docs",
            "kept_v1",
            "kept_v2",
            "kept_both",
            "tightened",
            "loosened",
            F.expr("(tightened + loosened) * 1000000 DIV n_docs").alias(
                "flip_ppm"
            ),
            F.coalesce("top_new_reason", F.lit("none")).alias("top_new_reason"),
        )
    )


# -- bpe_compression_by_source ------------------------------------------------


@query(
    "bpe_compression_by_source",
    oracle="""
    WITH wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
              AS word FROM documents)
      GROUP BY word HAVING length(word) >= 2
    ),
    w0 AS (
      SELECT word, freq,
             ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
      FROM wf
    ),
    p1 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w0),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair LIMIT 1),
    w1 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w0 w, b1 b
    ),
    p2 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w1),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair LIMIT 1),
    w2 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w1 w, b2 b
    ),
    p3 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w2),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair LIMIT 1),
    w3 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w2 w, b3 b
    ),
    p4 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w3),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b4 AS (SELECT pair, cnt FROM p4 ORDER BY cnt DESC, pair LIMIT 1),
    w4 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w3 w, b4 b
    ),
    p5 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w4),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b5 AS (SELECT pair, cnt FROM p5 ORDER BY cnt DESC, pair LIMIT 1),
    w5 AS (
      SELECT w.word, w.freq,
             replace(w.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM w4 w, b5 b
    ),
    p6 AS (
      SELECT syms[j] || ' ' || syms[j+1] AS pair,
             CAST(SUM(freq) AS BIGINT) AS cnt
      FROM (SELECT freq, string_split(trim(sym), ' ') AS syms FROM w5),
           unnest(range(1, len(syms))) AS u(j)
      GROUP BY 1
    ),
    b6 AS (SELECT pair, cnt FROM p6 ORDER BY cnt DESC, pair LIMIT 1),
    occ AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT source,
                   unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS word
            FROM documents)
      GROUP BY 1, 2
    ),
    v0 AS (
      SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
      FROM (SELECT DISTINCT word FROM occ)
    ),
    v1 AS (
      SELECT v.word,
             replace(v.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM v0 v, b1 b
    ),
    v2 AS (
      SELECT v.word,
             replace(v.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM v1 v, b2 b
    ),
    v3 AS (
      SELECT v.word,
             replace(v.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM v2 v, b3 b
    ),
    v4 AS (
      SELECT v.word,
             replace(v.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM v3 v, b4 b
    ),
    v5 AS (
      SELECT v.word,
             replace(v.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM v4 v, b5 b
    ),
    v6 AS (
      SELECT v.word,
             replace(v.sym, ' ' || b.pair || ' ',
                     ' ' || replace(b.pair, ' ', '') || ' ') AS sym
      FROM v5 v, b6 b
    ),
    vt AS (
      SELECT word, CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS n_syms
      FROM v6
    )
    SELECT o.source,
           CAST(SUM(o.cnt) AS BIGINT) AS n_words,
           CAST(SUM(o.cnt * length(o.word)) AS BIGINT) AS n_chars,
           CAST(SUM(o.cnt * t.n_syms) AS BIGINT) AS n_tokens,
           CAST(SUM(o.cnt * length(o.word)) * 1000000
             // SUM(o.cnt * t.n_syms) AS BIGINT) AS chars_per_token_ppm,
           CAST(SUM(o.cnt * t.n_syms) * 1000000 // SUM(o.cnt)
             AS BIGINT) AS fertility_ppm
    FROM occ o JOIN vt t USING (word)
    GROUP BY o.source
    """,
    doc="Train-then-apply for the distributed BPE pipeline: the "
    f"corpus-level merge table ({_BPE_MERGES} rounds, identical to "
    "bpe_merge_ranks) is applied back to EVERY source's tokens, and "
    "each source reports its resulting chars-per-token and "
    "tokens-per-word (fertility) in exact integer ppm — the number "
    "that tells a data team which domains the shared tokenizer "
    "under-serves (code-ish or non-English sources compress worse "
    "under merges learned on the majority domain). Application runs "
    "on the DISTINCT vocabulary, never per occurrence; the oracle "
    "replays learning AND application as unrolled CTE chains.",
)
def bpe_compression_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: learning is _bpe_learn (vocabulary-grain rounds);
    application is the same K map-side replaces over the DISTINCT
    word list plus one hash join of (source, word) counts against the
    |vocab|-row token-length table; the rollup groups on source with
    map-side combine. Corpus is scanned twice (wf and occ) — both
    single passes; everything between runs at vocabulary grain."""
    merges = _bpe_learn(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = F.explode(
        F.filter(F.split(F.lower(F.col("text")), r"[^a-z0-9]+"), lambda x: x != "")
    ).alias("word")
    occ = (
        fan_out(d.select("source", "text"))
        .select("source", toks)
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # vocab derivation + final join
    )
    vocab = occ.select("word").distinct().withColumn(
        "sym", F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1 "))
    )
    for _rank, pair, merged, _cnt in merges:
        vocab = vocab.withColumn(
            "sym", F.expr(f"replace(sym, ' {pair} ', ' {merged} ')")
        )
    vt = vocab.select(
        "word", F.size(F.split(F.trim("sym"), " ")).cast("long").alias("n_syms")
    )
    return (
        occ.join(vt, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.length("word")).alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_syms")).alias("n_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_chars",
            "n_tokens",
            F.expr("n_chars * 1000000 DIV n_tokens").alias("chars_per_token_ppm"),
            F.expr("n_tokens * 1000000 DIV n_words").alias("fertility_ppm"),
        )
    )


# -- lang_label_noise_audit ---------------------------------------------------


@query(
    "lang_label_noise_audit",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source, lang AS labeled_lang,
             {_lang_guess_sql()} AS guessed_lang
      FROM documents),
    agg AS (
      SELECT source, labeled_lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN guessed_lang = labeled_lang
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
      FROM g GROUP BY 1, 2),
    mis AS (
      SELECT source, labeled_lang, guessed_lang AS top_mislabel,
             ROW_NUMBER() OVER (PARTITION BY source, labeled_lang
                                ORDER BY COUNT(*) DESC, guessed_lang) AS rk
      FROM g WHERE guessed_lang <> labeled_lang
      GROUP BY source, labeled_lang, guessed_lang)
    SELECT a.source, a.labeled_lang, a.n_docs, a.n_agree,
           (a.n_docs - a.n_agree) * 1000000 // a.n_docs AS disagree_ppm,
           COALESCE(m.top_mislabel, 'none') AS top_mislabel
    FROM agg a
    LEFT JOIN mis m ON m.source = a.source
                   AND m.labeled_lang = a.labeled_lang AND m.rk = 1
    """,
    doc="Label-noise QA for the provided language labels: the shipped "
    "lang_id heuristic re-detects every document and each (source, "
    "labeled_lang) cell reports its disagreement rate in integer ppm "
    "plus the dominant conflicting detection — the audit that catches "
    "a crawler feeding mislabeled or code-switched text into one "
    "source before per-language mixing weights (dataset_mix_weighted) "
    "amplify the error across a 100 TB corpus. Provided labels vs "
    "detector is the standard label-QA cross-check; disagreement "
    "localized to one source means bad metadata, spread evenly means "
    "a weak detector.",
)
def lang_label_noise_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the detector is the same scan-parallel codegen
    marker vote as lang_id (no UDFs); both rollups group on (source,
    labeled_lang) with map-side combine, and the mislabel-mode window
    runs on the |sources| x |langs|^2 cell frame — catalog-bounded,
    never corpus rows."""
    base = _t(spark, sf_dir, "documents")["documents"]
    d = fan_out(base)
    g = (
        _lang_scores(d)
        .select(
            "doc_id",
            F.col("lang").alias("labeled_lang"),
            _lang_guess_spark().alias("guessed_lang"),
        )
        .join(base.select("doc_id", "source"), "doc_id")
        .localCheckpoint(eager=False)  # agreement rollup + mislabel mode
    )
    agg = g.groupBy("source", "labeled_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("guessed_lang") == F.col("labeled_lang"), 1).otherwise(0)
        ).alias("n_agree"),
    )
    mis = (
        g.filter(F.col("guessed_lang") != F.col("labeled_lang"))
        .groupBy("source", "labeled_lang", "guessed_lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("source", "labeled_lang").orderBy(
                    F.desc("c"), F.asc("guessed_lang")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("source", "labeled_lang", F.col("guessed_lang").alias("top_mislabel"))
    )
    return (
        agg.join(mis, ["source", "labeled_lang"], "left")
        .select(
            "source",
            "labeled_lang",
            "n_docs",
            "n_agree",
            F.expr("(n_docs - n_agree) * 1000000 DIV n_docs").alias(
                "disagree_ppm"
            ),
            F.coalesce("top_mislabel", F.lit("none")).alias("top_mislabel"),
        )
    )
