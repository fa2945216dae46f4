"""FROZEN host-canary queries for the bench harness. Not registry
operators: they exist only so ``bench.py`` can measure the host, and
they are deliberately excluded from ``queries()`` / the driver
correctness gate (nothing about the product depends on them).

Why they exist (VERDICT r11 item 6): the five scan/agg canary anchors
normalize the host factor well for scan-shaped queries, but two rounds
running (r10 hf 0.659, r11 backwash) showed hosts whose relative speed
on the MID-WEIGHT TEXT class (explode-heavy n-gram aggregates, regex
codegen scans — lang_label_noise_audit, quality_gate_shadow_audit,
bpe_compression_by_source, corpus_fate_manifest) diverges from their
scan/agg speed, so the single factor recorded fake 0.7x improvements
one round and fake 1.3-1.6x regressions the next. These two queries
anchor that class directly.

FREEZE CONTRACT: this module must never be edited after r12 — a canary
that changes measures the code, not the host (the exact failure the
anchors exist to prevent). It therefore uses only inline
``pyspark.sql.functions`` expressions — no operator helpers that later
rounds might optimize — and reads ``documents`` through
``load_tables`` (a stable loader contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dungbeetle_spark.sources.catalog import load_tables

    return load_tables(spark, sf_dir, ["documents"])["documents"]


def canary_text_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explode-n-gram-then-aggregate shape of the mid-weight text
    class: tokenize, build word bigrams with a higher-order transform,
    explode, and roll up twice (per (source, gram), then per source)."""
    d = _docs(spark, sf_dir)
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    # slice() is 1-based; the transform lambda's i is 0-based and w[i]
    # is 0-based GetArrayItem, so element x = w[i] pairs with w[i + 1]
    grams = F.expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
        " (x, i) -> concat(x, ' ', w[i + 1]))"
    )
    per_gram = (
        d.select("source", words.alias("w"))
        .select("source", F.explode(grams).alias("g"))
        .groupBy("source", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_gram.groupBy("source").agg(
        F.count(F.lit(1)).alias("distinct_grams"),
        F.sum("n").alias("total_grams"),
        F.max("n").alias("max_gram"),
    )


def canary_text_regex_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regex-codegen-scan shape of the mid-weight text class: a
    per-document projection of several regexp_counts and length stats,
    rolled up per source."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    scored = d.select(
        "source",
        F.length(t).alias("nc"),
        F.regexp_count(t, F.lit(r"[A-Za-z]{4,}")).alias("w4"),
        F.regexp_count(t, F.lit(r"[0-9]+")).alias("dg"),
        F.regexp_count(t, F.lit(r"[.!?]")).alias("sent"),
        F.regexp_count(t, F.lit(r"\b(the|a|is|of|and)\b")).alias("stop"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nc").alias("chars"),
        F.sum("w4").alias("long_words"),
        F.sum("dg").alias("digit_runs"),
        F.sum("sent").alias("sentences"),
        F.sum("stop").alias("stopwords"),
    )


# name -> builder; bench.py times these alongside the headline set and
# records them in the canary block (never in the headline totals).
TEXT_CANARIES = {
    "canary_text_explode_agg": canary_text_explode_agg,
    "canary_text_regex_scan": canary_text_regex_scan,
}
