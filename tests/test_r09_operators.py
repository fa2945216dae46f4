"""Non-hollowness invariants for the round-9 operators.

Value correctness is covered by test_queries_oracle.py; these pin what
a value-match alone can't see — that the repair transformation really
fires on the planted fixture and preserves the arithmetic identities
its audit columns claim.
"""

from __future__ import annotations

from dungbeetle_spark.operators.dedup import _SPAN_PASSAGE, _SPAN_PLANT_MOD
from dungbeetle_spark.queries import registry

SPECS = registry()


def test_span_repair_removes_all_but_canonical_passage(spark, sf_oracle):
    """Every planted doc except the global-canonical (lowest doc_id)
    one must lose the boilerplate passage; the canonical keeps it —
    Lee et al.'s keep-one semantics, provable on the planted set."""
    rows = SPECS["dedup_span_repair"].build(spark, sf_oracle).collect()
    planted = sorted(
        (r for r in rows if r.doc_id % _SPAN_PLANT_MOD == 0),
        key=lambda r: r.doc_id,
    )
    assert len(planted) > 2
    assert _SPAN_PASSAGE in planted[0].repaired_text
    rest = planted[1:]
    assert all(_SPAN_PASSAGE not in r.repaired_text for r in rest)
    assert all(r.n_spans_removed >= 1 for r in rest)


def test_span_repair_audit_identities(spark, sf_oracle):
    """repaired_len == orig_len - chars_removed for every doc, docs
    without removals round-trip verbatim (seeded text), and repair
    never grows a document."""
    rows = SPECS["dedup_span_repair"].build(spark, sf_oracle).collect()
    assert all(r.repaired_len == r.orig_len - r.chars_removed for r in rows)
    assert all(len(r.repaired_text) == r.repaired_len for r in rows)
    untouched = [r for r in rows if r.n_spans_removed == 0]
    assert untouched and all(r.chars_removed == 0 for r in untouched)
    assert any(r.n_spans_removed > 0 for r in rows)


def test_export_manifest_reproducible_and_membership_exact(spark, sf_oracle):
    """The export digest chain is deterministic (a rebuild reproduces
    every shard digest byte-identically), membership is exactly the
    fate manifest's kept set, and every kept doc lands in exactly one
    shard."""
    a = SPECS["shard_export_manifest"].build(spark, sf_oracle).collect()
    b = SPECS["shard_export_manifest"].build(spark, sf_oracle).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    kept = (
        SPECS["corpus_fate_manifest"]
        .build(spark, sf_oracle)
        .filter("fate = 'kept'")
        .count()
    )
    assert sum(r.n_docs for r in a) == kept > 0
    digests = [r.content_digest for r in a]
    assert all(len(h) == 32 for h in digests)
    assert len(set(digests)) == len(digests)  # no two shards collide
