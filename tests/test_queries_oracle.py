"""Value-level correctness: every oracle-backed query vs DuckDB.

This is a local mirror of the driver's t2 gate (sf0.01). Queries
without an oracle get a rows-and-schema sanity check instead.
"""

from __future__ import annotations

import pytest

from dungbeetle_spark.queries import registry
from tests.oracle import compare, duck_connect

SPECS = registry()
ORACLE_NAMES = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY_NAMES = sorted(n for n, s in SPECS.items() if not s.oracle)
SF_ORACLE_DEFAULT = "/root/testdata/sf0.01"  # the driver's t2 gate scale


@pytest.fixture(scope="module")
def duck(sf_oracle):
    con = duck_connect(sf_oracle)
    yield con
    con.close()


# Threshold-filtered queries whose row count legitimately varies with
# the corpus scale: q11's fixed value-share cut (the TPC-H q11 shape)
# empties as per-part shares shrink at sf0.1. The zero-row
# non-hollowness guard stays strict at the driver's sf0.01 gate and
# relaxes for these names only under a SPARK_GRAFT_ORACLE_SF override
# (found by the r12 sf0.1 full-suite sweep — both engines agreed on
# the empty result, so correctness held; only the guard was
# scale-tuned).
_SCALE_THRESHOLDED = {"q11_important_parts"}


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_oracle, duck, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_oracle)
    n = compare(df, duck, spec.oracle)
    # hollow-check guard: an oracle that matches on an empty result
    # set proves nothing — every fixture query must produce rows
    # realpath-normalized compare (ADVICE r12): an equivalent spelling
    # of the sf0.01 fixture path (trailing slash, symlink, relative)
    # must not relax the strict zero-row guard at the gate scale.
    import os

    at_gate_scale = os.path.realpath(sf_oracle) == os.path.realpath(
        SF_ORACLE_DEFAULT
    )
    if n == 0 and name in _SCALE_THRESHOLDED and not at_gate_scale:
        pytest.skip(f"{name}: threshold-filtered, empty at {sf_oracle}")
    assert n > 0, f"{name}: oracle matched but on ZERO rows"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only(spark, sf_oracle, name):
    spec = SPECS[name]
    df = spec.build(spark, sf_oracle)
    pdf = df.toPandas()
    assert df.columns, f"{name}: no columns"
    # Mirror the driver's canonicalizer: it sorts the full frame by
    # every column before hashing, which dies on unhashable cells
    # (list/dict from array/map columns). Running the same sort here
    # catches that class of schema bug locally instead of at judging.
    pdf.sort_values(by=list(pdf.columns), inplace=False)


def test_sketch_user_stats_accuracy(spark, sf_oracle):
    """The checked frame's bound booleans must all be TRUE, and an
    independent recomputation of the HLL estimate must confirm the 5%
    bound the booleans claim (so the query can't trivially satisfy
    its own oracle by emitting constant TRUE)."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.sources.catalog import load_tables

    rows = SPECS["sketch_user_stats"].build(spark, sf_oracle).collect()
    assert rows
    for r in rows:
        assert r["hll_within_5pct"] and r["p50_in_band"], r
        assert r["p95_in_band"] and r["p99_in_band"], r

    e = load_tables(spark, sf_oracle, ["events"])["events"]
    est = {
        r[0]: (r[1], r[2])
        for r in e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01),
            F.countDistinct("user_id"),
        )
        .collect()
    }
    exact_from_query = {r["event_type"]: r["exact_users"] for r in rows}
    for et, (approx, exact) in est.items():
        assert exact == exact_from_query[et]
        assert abs(approx - exact) / exact < 0.05, (et, approx, exact)


def test_probabilistic_recall_floors(spark, sf_oracle):
    """Measured recall of the approximate paths against their exact
    twins — pinned so a parameter/seed regression that silently
    guts recall fails loudly (fixed seeds → deterministic values)."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in SPECS["ann_cosine_topk"].build(spark, sf_oracle).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in SPECS["ann_lsh_bucketed"].build(spark, sf_oracle).collect()
    }
    assert len(exact & lsh) / len(exact) >= 0.5  # measured 0.56

    ivf = {
        (r.query_id, r.neighbor_id)
        for r in SPECS["ann_ivf"].build(spark, sf_oracle).collect()
    }
    # isotropic fixture → IVF recall ~= scanned fraction (nprobe/K);
    # the floor asserts mechanical correctness, not clustering luck
    assert len(exact & ivf) / len(exact) >= 0.2  # measured 0.28

    true_pairs = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_ngram_jaccard"].build(spark, sf_oracle).collect()
    }
    cands = {
        (r.doc_a, r.doc_b)
        for r in SPECS["dedup_minhash_lsh"].build(spark, sf_oracle).collect()
    }
    assert len(true_pairs & cands) / max(len(true_pairs), 1) >= 0.9  # measured 1.0


def test_embedding_dedup_big_corpus_never_collects(spark, sf_oracle, monkeypatch):
    """Above the sweep ceiling the operator must route to the LSH
    candidate path — proven by making the collecting path explode and
    forcing the ceiling to 0. LSH output must be a subset of the exact
    pairs with identical cosine values (same filter, fewer candidates)."""
    from dungbeetle_spark.operators import dedup

    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in SPECS["dedup_embedding_cosine"].build(spark, sf_oracle).collect()
    }

    def boom(_e):
        raise AssertionError("exact sweep (driver collect) used on big corpus")

    monkeypatch.setattr(dedup, "EXACT_SWEEP_MAX_ROWS", 0)
    monkeypatch.setattr(dedup, "_embedding_pairs_exact", boom)
    lsh = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in SPECS["dedup_embedding_cosine"].build(spark, sf_oracle).collect()
    }
    assert lsh, "hollow test: LSH path surfaced no pairs at fixture scale"
    assert set(lsh) <= set(exact)
    assert all(exact[k] == v for k, v in lsh.items())


def test_embedding_lsh_mega_bucket_is_capped_to_leader_star(spark):
    """VERDICT r13 item 5: a corpus with near-constant embeddings (a
    failed encoder emitting one vector) recreates the text-minhash
    mega-bucket in vector form — every row lands in the same
    (band, bucket) in every band, and the uncapped candidate
    self-join was Σ|bucket|². The capped path must emit exactly the
    leader STAR for the planted cluster (N-1 pairs, every member
    connected through the leader — verdict preservation for the
    downstream canonical collapse) and audit the truncation."""
    from dungbeetle_spark.operators import dedup

    n = 3 * dedup._LSH_BUCKET_CAP  # 3x over the cap
    const = [0.5] * dedup._DIM
    e = spark.createDataFrame(
        [(i, const) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    pairs, audit = dedup._embedding_pairs_lsh(e)
    got = sorted((r.vec_a, r.vec_b) for r in pairs.collect())
    # identical vectors: cosine 1.0 passes the threshold; the star is
    # (leader=0, member) only — all-pairs would be n(n-1)/2 = 4560
    assert got == [(0, b) for b in range(1, n)]
    # every band's single bucket was over the cap
    trunc = audit.collect()[0].truncated_buckets
    assert trunc > 0
    # the cap is a pre-join filter: un-capped emission for SMALL
    # buckets is untouched (subset-of-exact pin above covers organic
    # corpora; this pins the degenerate cluster's bound)


def test_connected_components_transitivity(spark):
    """Label propagation must collapse CHAINS (A~B, B~C → one
    component) and leave disconnected nodes as singletons — pairwise
    output alone can't express this."""
    from dungbeetle_spark.operators.pipeline import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    #  chain 0-1-2, pair 4-5, singletons 3 and 6
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in connected_components(nodes, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6}


def test_simhash_banded_recall_is_total(spark):
    """Pigeonhole banding must equal the exact O(n²) hamming scan.

    Planted corpus: exact copies (hamming 0) and one-word edits
    (hamming small) of seeded random-word docs. The banded candidate
    join agreeing on any of the 4 16-bit blocks is GUARANTEED to see
    every pair at hamming ≤ 3, so banded == exact, recall 1.0 —
    a single missed pair is a banding regression.
    """
    import random

    from pyspark.sql import functions as F

    from dungbeetle_spark.operators.dedup import simhash_fingerprints, simhash_pairs

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for d in range(40):
        words = [rng.choice(vocab) for _ in range(120)]
        rows.append((d * 10, " ".join(words)))
        if d % 4 == 0:  # exact copy → hamming 0
            rows.append((d * 10 + 1, " ".join(words)))
        if d % 4 == 1:  # one-word edit → small hamming
            edited = list(words)
            edited[5] = "zz_edit"
            rows.append((d * 10 + 2, " ".join(edited)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fps = simhash_fingerprints(docs)
    banded = {
        (r.doc_a, r.doc_b) for r in simhash_pairs(fps, max_hamming=3).collect()
    }

    a, b = fps.alias("a"), fps.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    exact = {
        (r.doc_a, r.doc_b)
        for r in a.crossJoin(b)
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert exact, "hollow test: planted corpus produced no near-dup pairs"
    assert banded == exact  # recall AND precision both total


def test_split_doc_stitch_full_recall(spark, sf_oracle):
    """Every planted pagination split must be recovered: planted rows
    == docs with >= _STITCH_MIN_TOKENS tokens, each exactly
    (2*doc_id, 2*doc_id+1)."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.operators.dedup import (
        _STITCH_MIN_TOKENS,
        split_doc_stitch,
    )
    from dungbeetle_spark.sources.catalog import load_tables

    eligible = (
        load_tables(spark, sf_oracle)["documents"]
        .select(F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n"))
        .filter(F.col("n") >= _STITCH_MIN_TOKENS)
        .count()
    )
    planted = (
        split_doc_stitch(spark, sf_oracle)
        .filter("is_planted")
        .distinct()
        .count()
    )
    assert planted == eligible


def test_template_spam_clusters_are_real_templates(spark, sf_oracle):
    """Each reported cluster: >= 2 docs, >= 2 distinct texts, and the
    shape really is shared — recomputing the shape of the min_doc_id
    member reproduces the cluster key."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.operators.text import template_spam_clusters
    from dungbeetle_spark.sources.catalog import load_tables

    clusters = template_spam_clusters(spark, sf_oracle).collect()
    assert clusters, "fixture should contain template clusters"
    shapes = {
        r.doc_id: r.shape
        for r in load_tables(spark, sf_oracle)["documents"]
        .select(
            "doc_id",
            F.md5(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), "[0-9]+", "#"),
                    "[A-Za-z]+",
                    "w",
                )
            ).alias("shape"),
        )
        .collect()
    }
    for c in clusters:
        assert c.n_docs >= 2 and c.n_variants >= 2
        assert shapes[c.min_doc_id] == c.shape


def test_bpe_merge_ranks_matches_python_reference(spark, sf_oracle):
    """Brute-force the whole merge loop in Python over the collected
    word-frequency table (vocabulary is small at the oracle SF) using
    the SAME space-anchored left-to-right replace semantics, and pin
    the full merge table."""
    import re
    from collections import Counter

    from dungbeetle_spark.operators.text import _BPE_MERGES, bpe_merge_ranks
    from dungbeetle_spark.sources.catalog import load_tables

    docs = load_tables(spark, sf_oracle)["documents"].select("text").collect()
    wf = Counter()
    for r in docs:
        for w in re.split(r"[^a-z0-9]+", r.text.lower()):
            if len(w) >= 2:
                wf[w] += 1
    syms = {w: " " + "".join(c + " " for c in w) for w in wf}
    expect = []
    for rank in range(1, _BPE_MERGES + 1):
        pairs = Counter()
        for w, freq in wf.items():
            parts = syms[w].split()
            for a, b in zip(parts, parts[1:]):
                pairs[f"{a} {b}"] += freq
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, pair, pair.replace(" ", ""), cnt))
        pat, rep = f" {pair} ", f" {pair.replace(' ', '')} "
        syms = {w: s.replace(pat, rep) for w, s in syms.items()}
    got = [
        (r.rank, r.pair, r.merged, r.cnt)
        for r in bpe_merge_ranks(spark, sf_oracle).orderBy("rank").collect()
    ]
    assert got == expect


def test_lsh_band_planner_scurve_and_monotonicity(spark, sf_oracle):
    """The analytic S-curve obeys its closed form and the measured
    candidate counts are monotone: more bands with fewer rows per
    band can only produce MORE candidate pairs (OR-amplification),
    and detection probability at any Jaccard level rises with bands."""
    from dungbeetle_spark.operators.dedup import (
        _PLAN_CONFIGS,
        _detect_ppm,
        lsh_band_planner,
    )

    rows = {
        (r.bands, r.rows_per_band): r
        for r in lsh_band_planner(spark, sf_oracle).collect()
    }
    assert set(rows) == set(_PLAN_CONFIGS)
    for (b, r), row in rows.items():
        assert row.p_detect_50_ppm == _detect_ppm(1, 2, b, r)
        assert row.p_detect_80_ppm == _detect_ppm(4, 5, b, r)
        # closed form sanity: (1 - (1 - s^r)^b) for s=0.5, r=1, b=16
        if (b, r) == (16, 1):
            assert row.p_detect_50_ppm == (2**16 - 1) * 1_000_000 // 2**16
    ordered = sorted(rows.values(), key=lambda x: x.rows_per_band)
    for prev, nxt in zip(ordered, ordered[1:]):
        assert prev.n_candidate_pairs >= nxt.n_candidate_pairs
        assert prev.p_detect_50_ppm >= nxt.p_detect_50_ppm
        assert prev.p_detect_80_ppm >= nxt.p_detect_80_ppm


def test_quality_gate_shadow_v1_matches_deployed_funnel(spark, sf_oracle):
    """The audit's v1 keep counts must equal the DEPLOYED funnel's —
    if the shadow audit drifts from quality_filter_funnel the diff is
    meaningless."""
    from pyspark.sql import functions as F

    from dungbeetle_spark.operators.text import (
        quality_filter_funnel,
        quality_gate_shadow_audit,
    )
    from dungbeetle_spark.sources.catalog import load_tables

    docs = load_tables(spark, sf_oracle)["documents"].select("doc_id", "source")
    funnel_kept = dict(
        quality_filter_funnel(spark, sf_oracle)
        .join(docs, "doc_id")
        .filter("keep")
        .groupBy("source")
        .count()
        .collect()
    )
    audit = {
        r.source: r for r in quality_gate_shadow_audit(spark, sf_oracle).collect()
    }
    for source, r in audit.items():
        assert r.kept_v1 == funnel_kept.get(source, 0)
        assert r.kept_both == r.kept_v1 - r.tightened
        assert r.kept_v2 == r.kept_both + r.loosened


def test_bpe_compression_applies_the_learned_merges(spark, sf_oracle):
    """Cross-op consistency: applying the bpe_merge_ranks table to a
    word by hand (same replace chain) reproduces the per-word token
    counts the compression rollup is built from — checked through the
    aggregate: recompute one source's n_tokens in Python."""
    from collections import Counter
    import re

    from dungbeetle_spark.operators.text import (
        bpe_compression_by_source,
        bpe_merge_ranks,
    )
    from dungbeetle_spark.sources.catalog import load_tables

    merges = [
        (r.pair, r.merged)
        for r in bpe_merge_ranks(spark, sf_oracle).orderBy("rank").collect()
    ]
    docs = (
        load_tables(spark, sf_oracle)["documents"]
        .select("source", "text")
        .collect()
    )
    src = docs[0].source
    occ = Counter()
    for r in docs:
        if r.source != src:
            continue
        for w in re.split(r"[^a-z0-9]+", r.text.lower()):
            if w:
                occ[w] += 1
    n_tokens = 0
    for w, cnt in occ.items():
        sym = " " + "".join(c + " " for c in w)
        for pair, merged in merges:
            sym = sym.replace(f" {pair} ", f" {merged} ")
        n_tokens += cnt * len(sym.split())
    row = {
        r.source: r for r in bpe_compression_by_source(spark, sf_oracle).collect()
    }[src]
    assert row.n_tokens == n_tokens
    assert row.n_words == sum(occ.values())


def test_corpus_fate_manifest_consistent_with_standalone_ops(spark, sf_oracle):
    """The composed manifest must agree with the standalone operators
    it stages: quality_reason matches quality_filter_funnel verbatim;
    every dropped_duplicate's canonical is dedup_exact's keep_doc_id
    for its content hash; every dropped_contaminated doc is flagged by
    decontamination; and fates partition the corpus."""
    from dungbeetle_spark.operators.dedup import dedup_exact
    from dungbeetle_spark.operators.mixing import decontamination
    from dungbeetle_spark.operators.pipeline import corpus_fate_manifest
    from dungbeetle_spark.operators.text import quality_filter_funnel
    from dungbeetle_spark.sources.catalog import load_tables

    manifest = {r.doc_id: r for r in corpus_fate_manifest(spark, sf_oracle).collect()}
    n_docs = load_tables(spark, sf_oracle)["documents"].count()
    assert len(manifest) == n_docs
    funnel = {r.doc_id: r.reason for r in quality_filter_funnel(spark, sf_oracle).collect()}
    for did, r in manifest.items():
        assert r.quality_reason == funnel[did]
        if r.fate == "dropped_quality":
            assert r.quality_reason != "kept"
        if r.fate in ("kept", "dropped_duplicate", "dropped_contaminated"):
            assert r.quality_reason == "kept" and not did % 37 == 0
    # duplicate stage vs dedup_exact (restricted to quality survivors,
    # so only check containment: the manifest's canonical must be the
    # min doc_id of its group among survivors — already pinned by the
    # oracle; here check the kept/dup relation is acyclic and minimal)
    for did, r in manifest.items():
        if r.fate == "dropped_duplicate":
            canon = manifest[r.canonical_id]
            # the canonical survived quality + dedup; decon (exact OR,
            # since r12, fuzzy) may still drop it downstream
            assert canon.fate in (
                "kept",
                "dropped_contaminated",
                "dropped_fuzzy_contaminated",
            )
            assert r.canonical_id < did
    cont = {r.doc_id: r.is_contaminated for r in decontamination(spark, sf_oracle).collect()}
    for did, r in manifest.items():
        if r.fate == "dropped_contaminated":
            assert cont[did] and r.n_contaminated > 0
        if r.fate == "kept":
            assert not cont.get(did, False)


def test_lang_label_noise_audit_consistent_with_lang_id(spark, sf_oracle):
    """The audit's agreement counts must equal a direct rollup of the
    shipped lang_id detector's output — same heuristic, same cells."""
    from collections import Counter

    from dungbeetle_spark.operators.text import (
        lang_id,
        lang_label_noise_audit,
    )
    from dungbeetle_spark.sources.catalog import load_tables

    src = {
        r.doc_id: r.source
        for r in load_tables(spark, sf_oracle)["documents"]
        .select("doc_id", "source")
        .collect()
    }
    n, agree = Counter(), Counter()
    for r in lang_id(spark, sf_oracle).collect():
        cell = (src[r.doc_id], r.labeled_lang)
        n[cell] += 1
        if r.guessed_lang == r.labeled_lang:
            agree[cell] += 1
    audit = lang_label_noise_audit(spark, sf_oracle).collect()
    assert len(audit) == len(n)
    for r in audit:
        cell = (r.source, r.labeled_lang)
        assert (r.n_docs, r.n_agree) == (n[cell], agree[cell])
        if r.n_agree == r.n_docs:
            assert r.top_mislabel == "none"


def test_bpe_driver_loop_matches_distributed(spark, sf_oracle, monkeypatch):
    """r15 (VERDICT r14 item 5): the size-routed collected-vocabulary
    merge loop must equal the distributed per-round loop tuple for
    tuple — force the guard both ways on the same fixture."""
    from dungbeetle_spark.operators import text as T

    fast = T._bpe_learn(spark, sf_oracle)  # guard routes to collected
    monkeypatch.setattr(T, "_BPE_DRIVER_DOCS_MAX", -1)  # force distributed
    slow = T._bpe_learn(spark, sf_oracle)
    assert fast == slow and len(fast) == T._BPE_MERGES
