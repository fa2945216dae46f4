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


def test_span_repair_matches_bruteforce_on_random_corpora(spark, tmp_path):
    """Third independent implementation, random inputs: tiny corpora
    built from a shared passage pool (guaranteed cross-doc 40-char
    repeats at random offsets) are repaired by a direct Python
    transcription of the spec — every duplicated window occurrence
    except the global (doc_id, position)-first one marked, marks
    merged into maximal spans (adjacent merge), spans cut — and the
    operator must agree doc-for-doc on repaired text, span count and
    chars removed. Catches island-merge off-by-ones the planted
    fixture can't reach."""
    import random

    from dungbeetle_spark.operators.dedup import _SPAN_L, _SPAN_PASSAGE

    def brute(docs):
        seeded = {
            i: t + (_SPAN_PASSAGE if i % 7 == 0 else "")
            for i, t in docs.items()
        }
        occ = {}
        for i in sorted(seeded):
            t = seeded[i]
            for p in range(1, len(t) - _SPAN_L + 2):
                occ.setdefault(t[p - 1 : p - 1 + _SPAN_L], []).append((i, p))
        removal = {i: [] for i in seeded}
        for w, lst in occ.items():
            if len({d for d, _ in lst}) >= 2:
                for d, p in sorted(lst)[1:]:
                    removal[d].append(p)
        out = {}
        for i, t in seeded.items():
            spans = []
            for p in sorted(removal[i]):
                if spans and p <= spans[-1][1] + 1:
                    spans[-1][1] = max(spans[-1][1], p + _SPAN_L - 1)
                else:
                    spans.append([p, p + _SPAN_L - 1])
            kept, pos = [], 1
            for s, e in spans:
                kept.append(t[pos - 1 : s - 1])
                pos = e + 1
            kept.append(t[pos - 1 :])
            out[i] = (
                "".join(kept),
                len(spans),
                sum(e - s + 1 for s, e in spans),
            )
        return out

    from dungbeetle_spark.queries import registry

    spec = registry()["dedup_span_repair"]
    rng = random.Random(90210)
    for case in range(4):
        pool = [
            "".join(rng.choice("ab ") for _ in range(rng.randint(42, 55)))
            for _ in range(3)
        ]
        docs = {}
        for i in range(rng.randint(4, 9)):
            parts = [rng.choice(pool) for _ in range(rng.randint(1, 3))]
            suffix = "".join(rng.choice("xyz") for _ in range(rng.randint(0, 30)))
            docs[i] = "".join(parts) + suffix
        d = tmp_path / f"case{case}"
        d.mkdir()
        spark.createDataFrame(
            [(i, t) for i, t in docs.items()], "doc_id long, text string"
        ).coalesce(1).write.parquet(str(d / "documents.parquet"))
        got = {
            r.doc_id: (r.repaired_text, r.n_spans_removed, r.chars_removed)
            for r in spec.build(spark, str(d)).collect()
        }
        want = brute(docs)
        assert got == want, f"case {case}: {got} != {want}"
