"""Prototype (r15): _fate_frame v2 — election folded into the flags
window (no s1 join-back) and the containment grams exploded only for
canonical survivors (join before explode). Asserts value-identity
against the shipped _fate_frame, then times both.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from dungbeetle_spark.session import get_spark
from dungbeetle_spark.sources.catalog import TABLES, fan_out, load_tables


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, fn, reps=5):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        vals.append(time.perf_counter() - t0)
    print(f"{min(vals):8.3f}s (all {[round(v,2) for v in vals]})  {label}",
          flush=True)
    return min(vals)


def fate_frame_v2(d):
    from dungbeetle_spark.functions.texts import content_md5
    from dungbeetle_spark.operators.mixing import (
        _EVAL_MOD, _FDC_MIN_BANDS, _GRAM_N, _fdc_band_rows, _fdc_minhash,
        _fdc_seeded, _fdc_shingle_hashes, _fdc_stop_set,
        fate_seeded_toks, word_ngrams,
    )
    from dungbeetle_spark.operators.pipeline import _materialize_concurrently
    from dungbeetle_spark.operators.text import funnel_verdicts

    base = fan_out(d)
    flags_lazy = funnel_verdicts(
        base,
        extra={
            "is_eval": F.col("doc_id") % _EVAL_MOD == 0,
            "h": content_md5("text"),
        },
    ).select("doc_id", "reason", "is_eval", "h")
    toks = fate_seeded_toks(base)
    ev_lazy = (
        toks.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("doc_id", F.explode_outer(word_ngrams("t", _GRAM_N)).alias("gram"))
        .select("gram")
        .where(F.col("gram").isNotNull())
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    fsh = _fdc_shingle_hashes(_fdc_seeded(base))
    fstops = _fdc_stop_set(fsh, d)
    flags, ev, _ = _materialize_concurrently(
        d.sparkSession,
        lambda: flags_lazy.localCheckpoint(),
        lambda: ev_lazy.localCheckpoint(),
        lambda: fstops.count(),
    )
    # v2: election folded into a conditional-min window over flags —
    # min(doc_id) over surv1 members of the h-partition, masked to
    # surv1 rows; no join back on doc_id.
    surv = ~F.col("is_eval") & (F.col("reason") == "kept")
    fw = flags.withColumn(
        "dup_of",
        F.when(
            surv,
            F.min(F.when(surv, F.col("doc_id"))).over(W.partitionBy("h")),
        ),
    ).localCheckpoint(eager=False)
    surv2 = fw.filter(F.col("doc_id") == F.col("dup_of")).select("doc_id")
    # v2: join BEFORE the gram explode — only canonical survivors pay
    # the tokenize+explode, and the join moves doc-grain rows.
    cont = (
        toks.join(surv2, "doc_id")
        .select("doc_id", F.explode_outer(word_ngrams("t", _GRAM_N)).alias("gram"))
        .join(F.broadcast(ev), "gram", "left")
        .groupBy("doc_id")
        .agg(F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_cont"))
        .localCheckpoint(eager=False)
    )
    surv3 = (
        surv2.join(cont, "doc_id", "left")
        .filter(F.coalesce("n_cont", F.lit(0)) == 0)
        .select("doc_id")
    )
    need = surv3.unionByName(
        d.filter(F.col("doc_id") % _EVAL_MOD == 0).select("doc_id")
    )
    fmh = _fdc_minhash(
        fsh.join(need, "doc_id", "left_semi")
        .join(F.broadcast(fstops), "hs", "left_anti")
    )
    fbands = _fdc_band_rows(fmh.localCheckpoint(eager=False))
    fev = fbands.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "j", "h"
    )
    fhits = (
        fbands.join(surv3, "doc_id", "left_semi")
        .join(F.broadcast(fev), ["j", "h"])
        .groupBy("doc_id", "eval_doc")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= _FDC_MIN_BANDS)
        .groupBy("doc_id")
        .agg(F.max("m").alias("fm"))
    )
    fate = (
        F.when(F.col("is_eval"), "eval_holdout")
        .when(F.col("reason") != "kept", "dropped_quality")
        .when(F.col("dup_of").isNotNull() & (F.col("doc_id") != F.col("dup_of")),
              "dropped_duplicate")
        .when(F.coalesce("n_cont", F.lit(0)) > 0, "dropped_contaminated")
        .when(F.coalesce("fm", F.lit(0)) > 0, "dropped_fuzzy_contaminated")
        .otherwise("kept")
    )
    return (
        fw.join(cont, "doc_id", "left")
        .join(fhits, "doc_id", "left")
        .select(
            "doc_id",
            fate.alias("fate"),
            F.col("reason").alias("quality_reason"),
            F.coalesce("dup_of", F.lit(-1)).cast("long").alias("canonical_id"),
            F.coalesce("n_cont", F.lit(0)).cast("long").alias("n_contaminated"),
            F.coalesce("fm", F.lit(0)).cast("long").alias("fuzzy_matched_bands"),
        )
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fate-profile3")
    tables = load_tables(spark, sf_dir, TABLES)
    for df in tables.values():
        noop(df)
    _warm = F.pandas_udf(lambda s: s, "long")
    cores = spark.sparkContext.defaultParallelism
    noop(spark.range(0, cores * 100, 1, cores).select(_warm("id")))

    from dungbeetle_spark.operators.pipeline import _fate_frame
    from dungbeetle_spark.queries import _t

    d = _t(spark, sf_dir, "documents")["documents"]

    a = sorted(map(tuple, _fate_frame(d).collect()))
    b = sorted(map(tuple, fate_frame_v2(d).collect()))
    assert a == b, "v2 fate frame diverges!"
    print(f"value-identity OK on {len(a)} rows", flush=True)

    timed("shipped _fate_frame", lambda: noop(_fate_frame(d)))
    timed("v2 fate frame", lambda: noop(fate_frame_v2(d)))
    timed("shipped _fate_frame", lambda: noop(_fate_frame(d)))
    timed("v2 fate frame", lambda: noop(fate_frame_v2(d)))


if __name__ == "__main__":
    main()
