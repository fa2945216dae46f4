"""Prototype: _fate_frame with concurrent materialization of its
independent checkpoint chains (guide §2.6) vs the sequential form.
Asserts value-identity against the shipped _fate_frame, then times.
"""

from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dungbeetle_spark.session import get_spark
from dungbeetle_spark.sources.catalog import TABLES, fan_out, load_tables


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}", flush=True)
    return best


def fate_frame_parallel(d):
    from dungbeetle_spark.functions.texts import content_md5
    from dungbeetle_spark.operators.mixing import (
        _EVAL_MOD, _FDC_MIN_BANDS, _GRAM_N, _fdc_band_rows, _fdc_minhash,
        _fdc_seeded, _fdc_shingle_hashes, _fdc_stop_set,
        fate_seeded_toks, word_ngrams,
    )
    from dungbeetle_spark.operators.text import funnel_verdicts

    verdicts = funnel_verdicts(fan_out(d)).select("doc_id", "reason")
    flags_lazy = (
        d.select("doc_id", "text")
        .join(verdicts, "doc_id")
        .select(
            "doc_id",
            "reason",
            (F.col("doc_id") % _EVAL_MOD == 0).alias("is_eval"),
            content_md5("text").alias("h"),
        )
    )
    grams = fate_seeded_toks(fan_out(d.select("doc_id", "text"))).select(
        "doc_id", F.explode_outer(word_ngrams("t", _GRAM_N)).alias("gram")
    )
    ev_lazy = (
        grams.filter(F.col("doc_id") % _EVAL_MOD == 0)
        .select("gram").where(F.col("gram").isNotNull())
        .distinct().withColumn("hit", F.lit(1))
    )
    fsh = _fdc_shingle_hashes(_fdc_seeded(d))  # lazy-checkpointed inside
    fstops = _fdc_stop_set(fsh, d)             # lazy-checkpointed inside

    with ThreadPoolExecutor(3) as ex:
        f_flags = ex.submit(lambda: flags_lazy.localCheckpoint())
        f_ev = ex.submit(lambda: ev_lazy.localCheckpoint())
        # materializing fstops pulls + persists fsh's lazy checkpoint
        f_stops = ex.submit(lambda: noop(fstops))
        flags = f_flags.result()
        ev = f_ev.result()
        f_stops.result()

    surv1 = flags.filter(~F.col("is_eval") & (F.col("reason") == "kept"))
    canon = surv1.groupBy("h").agg(F.min("doc_id").alias("dup_of"))
    s1 = surv1.join(canon, "h").select("doc_id", "dup_of")
    surv2 = s1.filter(F.col("doc_id") == F.col("dup_of")).select("doc_id")
    cont = (
        grams.join(surv2, "doc_id")
        .join(F.broadcast(ev), "gram", "left")
        .groupBy("doc_id")
        .agg(F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_cont"))
        .localCheckpoint(eager=False)
    )
    surv3 = (
        surv2.join(cont, "doc_id", "left")
        .filter(F.coalesce("n_cont", F.lit(0)) == 0)
        .select("doc_id")
        .localCheckpoint(eager=False)
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
        flags.select("doc_id", "reason", "is_eval")
        .join(s1, "doc_id", "left")
        .join(cont, "doc_id", "left")
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
    spark = get_spark("fate-profile2")
    tables = load_tables(spark, sf_dir, TABLES)
    for df in tables.values():
        noop(df)
    _warm = F.pandas_udf(lambda s: s, "long")
    cores = spark.sparkContext.defaultParallelism
    noop(spark.range(0, cores * 100, 1, cores).select(_warm("id")))

    from dungbeetle_spark.operators.pipeline import _fate_frame
    from dungbeetle_spark.queries import _t

    d = _t(spark, sf_dir, "documents")["documents"]

    # value identity
    a = _fate_frame(d).orderBy("doc_id").collect()
    b = fate_frame_parallel(d).orderBy("doc_id").collect()
    assert a == b, "parallel fate frame diverges!"
    print("value-identical rows:", len(a), flush=True)

    timed("sequential _fate_frame", lambda: noop(_fate_frame(d)))
    timed("parallel  fate_frame", lambda: noop(fate_frame_parallel(d)))
    timed("sequential _fate_frame", lambda: noop(_fate_frame(d)))
    timed("parallel  fate_frame", lambda: noop(fate_frame_parallel(d)))


if __name__ == "__main__":
    main()
