"""Non-hollowness invariants for the round-10 operators.

Value correctness is covered by test_queries_oracle.py on the organic
corpus — where the LSH density cap never fires (organic band buckets
max out at 6 docs at sf0.01, 19 at sf0.1; cap = 32). These tests plant
the failure mode the cap exists for — a single mega-cluster the size
of a crawl's empty-page template family — and pin, against the same
DuckDB oracle, that (a) the capped operator stays oracle-green while
truncation is ACTIVE, (b) the emitted pair set is linear in cluster
size rather than quadratic, (c) no cluster member is orphaned (the
leader-star keeps the component connected — the property hard
truncation would break), and (d) the truncated_buckets audit column
reports the truncation instead of hiding it.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from dungbeetle_spark.operators.dedup import _LSH_BUCKET_CAP, _MH_TABLES
from dungbeetle_spark.queries import registry
from tests.oracle import compare

SPECS = registry()

# A long stable body (>= 2*_SHINGLE_N words shared verbatim) so every
# cluster member's per-band minimum shingle hash comes from the body
# with overwhelming probability — the _MHI_TEMPLATE trick from
# dedup_minhash_incremental, sized up to beat the cap.
_CLUSTER_N = 120
_CLUSTER_BODY = (
    "empty page placeholder template body with a very long run of "
    "stable boilerplate words that recur verbatim across every copy "
    "of this error page family so all copies collide into one band "
    "bucket"
)


@pytest.fixture(scope="module")
def mega_cluster_dir(tmp_path_factory):
    """sf0.001 tables with documents replaced by organic + a planted
    120-doc near-identical cluster (cap is 32, so every band bucket
    the cluster dominates is oversized)."""
    src = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("mega_cluster")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        shutil.copy(f"{src}/{t}.parquet", out / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{src}/documents.parquet')
          UNION ALL
          SELECT 10000 + i AS doc_id,
                 '{_CLUSTER_BODY}' || ' tail ' || CAST(i AS VARCHAR) AS text,
                 'en' AS lang, 'crawl' AS source,
                 CAST(len('{_CLUSTER_BODY}') + 6 AS BIGINT) AS n_chars
          FROM range({_CLUSTER_N}) t(i)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(out)


@pytest.fixture(scope="module")
def capped_rows(spark, mega_cluster_dir):
    return SPECS["dedup_minhash_lsh"].build(spark, mega_cluster_dir).collect()


def test_cap_fires_and_is_audited(capped_rows):
    audits = {r.truncated_buckets for r in capped_rows}
    assert len(audits) == 1, "audit column must be constant per run"
    assert audits.pop() >= 1, "planted mega-cluster must trip the cap"


def test_capped_pair_set_is_linear_not_quadratic(capped_rows):
    planted = [
        r for r in capped_rows if r.doc_a >= 10000 and r.doc_b >= 10000
    ]
    # uncapped all-pairs would be ~N(N-1)/2 = 7140; leader-star plus
    # residual small-bucket pairs must stay within a few pairs per
    # member per band.
    assert len(planted) >= _CLUSTER_N - 1
    assert len(planted) <= 4 * _MH_TABLES * _CLUSTER_N
    assert len(planted) < _CLUSTER_N * (_CLUSTER_N - 1) // 4


def test_no_cluster_member_orphaned(capped_rows):
    """Leader-star emission must keep the whole planted cluster one
    connected component — the dedup-connectivity property that
    justifies star over hard truncation."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in capped_rows:
        if r.doc_a >= 10000 and r.doc_b >= 10000:
            parent[find(r.doc_a)] = find(r.doc_b)
    roots = {find(10000 + i) for i in range(_CLUSTER_N)}
    assert len(roots) == 1, f"cluster split into {len(roots)} components"


def test_capped_operator_stays_oracle_green_under_truncation(
    spark, mega_cluster_dir
):
    """The driver's oracle discipline must hold while the cap is
    ACTIVE, not just on organic data: DuckDB replays the same
    leader-star emission bit-for-bit."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{mega_cluster_dir}/documents.parquet')"
    )
    for name in ("dedup_minhash_lsh", "minhash_calibration"):
        df = SPECS[name].build(spark, mega_cluster_dir)
        assert compare(df, con, SPECS[name].oracle) > 0
    con.close()
