"""Regression pin for the shared-subtree law (plans/subtree.py, r14
verdict ask #2): every registered query's optimized plan is swept for
duplicated non-leaf subtrees; an EXPENSIVE duplicate (one carrying a
shuffle-bearing operator) must either be fixed (the lazy-checkpoint
remedy, NOTES_r13 boundary rule) or appear in the allowlist below with
its measured / structural justification. A new query that introduces an
un-vetted expensive duplicate fails here — the auditor runs on every
plan automatically instead of waiting for a hand-profiling session.

Cheap-only duplicates (map-only re-projections, broadcast-side filters)
are NOT pinned: re-evaluating them is routinely the right trade
(line_dedup counter-example, NOTES_r12).
"""

from __future__ import annotations

import pytest

# query -> set of allowed (root node name, occurrence count) signatures.
# Every entry carries the reason it is allowed to stay duplicated; the
# full evidence lives in SCALING.json subtree_fixes_r14.
ALLOWED_EXPENSIVE = {
    # self-join sides of an exact set-intersection join: the duplicated
    # frame is TOKEN-volume (shingles), materializing it violates the
    # ids-not-frames law; the third evaluation (set sizes) was removed
    # in r14 via a count window.
    "o05_ngram_jaccard": {("Filter", 2), ("Aggregate", 2), ("Project", 2)},
    # bucket-size guard: the probe and the split sides both read the
    # banded frame (riding the checkpointed sig frame — per evaluation
    # is explode-from-checkpoint + count window).
    "o17_lsh_pairs_guard": {("Filter", 2)},
    # r13 measured counter-example: checkpointing the per-doc xent
    # aggregate blocked a count-consumer's pushdown (0.8 -> 15.7 s).
    "o67_xent_buckets": {("Aggregate", 2), ("Filter", 2), ("Project", 2)},
    # SemDeDup expr faces: the x2 join is the self-join's two VECTOR
    # sides — the expensive assignment pyramid already sits behind a
    # thin (id, cell) checkpoint (r14); materializing the vector side
    # would cache embeddings-volume data.
    "o45_semdedup_apply": {("Join", 2)},
    # (o56 retired r15 — its {("Join", 2)} entry left with it)
    "o57_semdedup_hier_apply": {("Join", 2)},
    "o75_semdedup_multiprobe": {("Join", 2)},
    # single-row total over the r13-checkpointed strata counts, twice.
    "o71_temperature_mix": {("Aggregate", 2)},
    # the two-step ingest loop: each step's probe derives a distinct
    # (band, sig) key set from ITS OWN batch's banded checkpoint — the
    # two checkpoint leaves print identically once exprIds are stripped,
    # so the per-step distincts fingerprint as one subtree x2. Slim
    # codes-volume aggregates over already-materialized leaves; the
    # step-1 pyramid itself is checkpointed at the store boundary (r15).
    "o79_band_ingest_loop": {("Aggregate", 2)},
    # measured NEUTRAL at sf10 (SCALING.json subtree_fixes_r14
    # measured_boundaries): the once-evaluated md5 scan dominates; the
    # duplicated ACD estimate/rank frames are ~1 s inside noise.
    "o72_kmv_threshold": {("Project", 2), ("Filter", 3), ("Filter", 2),
                          ("Aggregate", 2)},
}


@pytest.mark.slow
def test_no_unvetted_expensive_duplicate_subtrees(spark, sf_dir):
    from relationaldecomposition_spark.plans.subtree import (
        SubtreeAudit, audit_registered_subtrees)

    audits = audit_registered_subtrees(spark, sf_dir)
    assert len(audits) == 100
    violations = []
    for name, a in audits.items():
        if not isinstance(a, SubtreeAudit):
            violations.append((name, f"audit error: {a}"))
            continue
        allowed = ALLOWED_EXPENSIVE.get(name, set())
        for dup in a.expensive_dups:
            if (dup.node_name, dup.count) not in allowed:
                violations.append(
                    (name, f"x{dup.count} {dup.cost_class} {dup.node_name} "
                           f"nodes={dup.n_nodes} ops={dup.shuffle_ops} "
                           f"head={dup.head[:80]}"))
    assert not violations, (
        "un-vetted expensive duplicated subtrees (fix with the "
        "lazy-checkpoint remedy or allowlist WITH a measurement):\n"
        + "\n".join(f"  {q}: {msg}" for q, msg in violations))


def test_auditor_flags_planted_duplicate(spark, sf_dir):
    """The auditor itself must catch the canonical offender shape: a
    groupBy + join-back re-evaluating one aggregate-bearing subtree."""
    from pyspark.sql import functions as F

    from conftest import load
    from relationaldecomposition_spark.plans.subtree import audit_subtrees

    li = load(spark, "lineitem", sf_dir)
    agg = (li.groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("q")))
    # two consumers of one aggregate-bearing subtree (the aliases must
    # survive optimization unchanged — a rename would be collapsed INTO
    # the aggregate head and break the structural identity, which is
    # itself correct auditor behavior: those are different plans)
    bad = agg.where(F.col("q") > 1).unionByName(agg.where(F.col("q") <= 1))
    a = audit_subtrees(bad, physical_hint=False)
    assert any(d.expensive and d.count >= 2 for d in a.dups), a.dups
    # and the remedy erases the finding: a checkpointed frame reads as a
    # materialized leaf
    fixed = agg.localCheckpoint(eager=False)
    good = fixed.where(F.col("q") > 1).unionByName(
        fixed.where(F.col("q") <= 1))
    g = audit_subtrees(good, physical_hint=False)
    assert not [d for d in g.dups if d.expensive], g.dups
