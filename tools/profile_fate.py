"""Stage-level profiling of the composed fate family (r14 opt round).

Times each sub-segment of _fate_frame with the noop sink in bench-like
session conditions, and counts Spark jobs/stages/tasks per segment via
the status tracker. Iteration aid only — not part of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dungbeetle_spark.session import get_spark
from dungbeetle_spark.sources.catalog import TABLES, fan_out, load_tables


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{best:8.3f}s  {label}", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fate-profile")
    tables = load_tables(spark, sf_dir, TABLES)
    for df in tables.values():
        noop(df)
    _warm = F.pandas_udf(lambda s: s, "long")
    cores = spark.sparkContext.defaultParallelism
    noop(spark.range(0, cores * 100, 1, cores).select(_warm("id")))

    from dungbeetle_spark.functions.texts import content_md5
    from dungbeetle_spark.operators.mixing import (
        _EVAL_MOD,
        _GRAM_N,
        _fdc_band_rows,
        _fdc_minhash,
        _fdc_seeded,
        _fdc_shingle_hashes,
        _fdc_stop_set,
        fate_seeded_toks,
        word_ngrams,
    )
    from dungbeetle_spark.operators.pipeline import _fate_frame
    from dungbeetle_spark.operators.text import funnel_verdicts
    from dungbeetle_spark.queries import _t

    d = _t(spark, sf_dir, "documents")["documents"]

    timed(spark, "full _fate_frame", lambda: noop(_fate_frame(d)))
    timed(spark, "funnel_verdicts(fan_out(d))", lambda: noop(funnel_verdicts(fan_out(d))))
    timed(spark, "fan_out(d) alone", lambda: noop(fan_out(d)))

    def flags_seg():
        verdicts = funnel_verdicts(fan_out(d)).select("doc_id", "reason")
        flags = (
            d.select("doc_id", "text")
            .join(verdicts, "doc_id")
            .select(
                "doc_id", "text", "reason",
                (F.col("doc_id") % _EVAL_MOD == 0).alias("is_eval"),
                content_md5("text").alias("h"),
            )
        )
        noop(flags)

    timed(spark, "flags (verdicts+md5 join)", flags_seg)

    def grams_seg():
        grams = fate_seeded_toks(fan_out(d.select("doc_id", "text"))).select(
            "doc_id", F.explode_outer(word_ngrams("t", _GRAM_N)).alias("gram")
        )
        noop(grams)

    timed(spark, "grams (seeded toks + explode)", grams_seg)

    def ev_seg():
        grams = fate_seeded_toks(fan_out(d.select("doc_id", "text"))).select(
            "doc_id", F.explode_outer(word_ngrams("t", _GRAM_N)).alias("gram")
        )
        ev = (
            grams.filter(F.col("doc_id") % _EVAL_MOD == 0)
            .select("gram").where(F.col("gram").isNotNull())
            .distinct().withColumn("hit", F.lit(1))
        )
        noop(ev)

    timed(spark, "ev (eval grams distinct)", ev_seg)

    def fsh_seg():
        noop(_fdc_shingle_hashes(_fdc_seeded(d)))

    timed(spark, "fsh (shingle hashes)", fsh_seg)

    def fstops_seg():
        fsh = _fdc_shingle_hashes(_fdc_seeded(d))
        noop(_fdc_stop_set(fsh, d))

    timed(spark, "fsh+stops", fstops_seg)

    def fmh_seg():
        fsh = _fdc_shingle_hashes(_fdc_seeded(d))
        fstops = _fdc_stop_set(fsh, d)
        fmh = _fdc_minhash(fsh.join(F.broadcast(fstops), "hs", "left_anti"))
        noop(fmh)

    timed(spark, "fsh+stops+minhash(all docs)", fmh_seg)

    def fbands_seg():
        fsh = _fdc_shingle_hashes(_fdc_seeded(d))
        fstops = _fdc_stop_set(fsh, d)
        fmh = _fdc_minhash(fsh.join(F.broadcast(fstops), "hs", "left_anti"))
        noop(_fdc_band_rows(fmh.localCheckpoint(eager=False)))

    timed(spark, "fsh+stops+minhash+bands", fbands_seg)
    extra(spark, sf_dir)


def extra(spark, sf_dir):
    """Warm re-run of the full frame + the cont/fhits segments."""
    from dungbeetle_spark.functions.texts import content_md5
    from dungbeetle_spark.operators.mixing import (
        _EVAL_MOD, _FDC_MIN_BANDS, _GRAM_N, _fdc_band_rows, _fdc_minhash,
        _fdc_seeded, _fdc_shingle_hashes, _fdc_stop_set,
        fate_seeded_toks, word_ngrams,
    )
    from dungbeetle_spark.operators.pipeline import _fate_frame
    from dungbeetle_spark.operators.text import funnel_verdicts
    from dungbeetle_spark.queries import _t

    d = _t(spark, sf_dir, "documents")["documents"]

    def upto_cont():
        verdicts = funnel_verdicts(fan_out(d)).select("doc_id", "reason")
        flags = (
            d.select("doc_id", "text").join(verdicts, "doc_id")
            .select("doc_id", "text", "reason",
                    (F.col("doc_id") % _EVAL_MOD == 0).alias("is_eval"),
                    content_md5("text").alias("h"))
            .localCheckpoint(eager=False)
        )
        surv1 = flags.filter(~F.col("is_eval") & (F.col("reason") == "kept"))
        canon = surv1.groupBy("h").agg(F.min("doc_id").alias("dup_of"))
        s1 = surv1.join(canon, "h").select("doc_id", "dup_of")
        surv2 = s1.filter(F.col("doc_id") == F.col("dup_of")).select("doc_id")
        grams = fate_seeded_toks(fan_out(d.select("doc_id", "text"))).select(
            "doc_id", F.explode_outer(word_ngrams("t", _GRAM_N)).alias("gram"))
        ev = (grams.filter(F.col("doc_id") % _EVAL_MOD == 0)
              .select("gram").where(F.col("gram").isNotNull())
              .distinct().withColumn("hit", F.lit(1)))
        cont = (grams.join(surv2, "doc_id")
                .join(F.broadcast(ev), "gram", "left")
                .groupBy("doc_id")
                .agg(F.count(F.when(F.col("hit").isNotNull(), 1)).alias("n_cont")))
        noop(cont)

    timed(spark, "chain upto cont", upto_cont)
    timed(spark, "full _fate_frame (warm)", lambda: noop(_fate_frame(d)))


if __name__ == "__main__":
    main()
