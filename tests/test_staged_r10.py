"""The r9-staged / r10-registered surface (GATE_r09.md "Round-10 rotation
plan" #0): builders landed in r9 fully oracle-verified; round 10
registered them via ``queries/__init__`` (only q59's rank surrogate and
bloom comments changed before registration — both budgeted in-window).

Checked here:

1. **Registration** — every formerly-staged entry is now in
   ``all_queries()`` with its oracle intact, and ``register()`` stays
   idempotent (queries/__init__ already called it once at import).
2. **Per-family semantics** beyond the hash oracle (Bloom has no false
   negatives, the CDC diff hits every planted branch, the weighted
   sample actually upweights, the z-layout shows locality, the HLL union
   lands in bounds, the JL projection preserves norms). Driver-faithful
   oracle parity is covered by test_oracle_parity.py now that the
   entries are registered.
"""

from __future__ import annotations

from bucket_to_bigquery_spark.queries import all_queries
from bucket_to_bigquery_spark.queries import (  # noqa: F401
    bloom,
    hll,
    layout,
    projections,
    sampling_ext,
    snapshot,
)
from bucket_to_bigquery_spark.queries.registry import (
    REGISTRY,
    Query,
    _with_tuning,
)

_STAGED_MODULES = (bloom, snapshot, sampling_ext, layout, hll, projections)

STAGED: dict[str, Query] = {
    name: Query(name, _with_tuning(fn), oracle, desc, tags)
    for mod in _STAGED_MODULES
    for name, (fn, oracle, desc, tags) in mod.STAGED.items()
}


# ---------------------------------------------------------------------------
# 1. Registration
# ---------------------------------------------------------------------------


def test_staged_entries_are_registered():
    """Round 10 wiring: every formerly-staged entry is in the registry
    with its oracle and description (queries/__init__ calls register())."""
    reg = all_queries()
    for name, q in STAGED.items():
        assert name in reg, f"{name} not registered — queries/__init__ wiring lost"
        assert reg[name].oracle == q.oracle
        assert reg[name].description


def test_register_is_idempotent():
    """Re-calling register() (already run once at package import) must not
    duplicate or mutate entries."""
    before = dict(REGISTRY)
    for mod in _STAGED_MODULES:
        mod.register()
    assert set(REGISTRY) == set(before)
    for name in STAGED:
        assert REGISTRY[name].oracle == before[name].oracle


# ---------------------------------------------------------------------------
# Per-family semantics
# ---------------------------------------------------------------------------


def test_q57_bloom_has_no_false_negatives(spark, sf_dir):
    rows = STAGED["q57_bloom_decontamination"].builder(spark, sf_dir).collect()
    assert rows
    contaminated = [r for r in rows if r["n_exact_contaminated"] > 0]
    assert contaminated, "no exact contamination — the benchmark split is wrong"
    for r in rows:
        # Bloom membership is a superset of true membership, per shingle —
        # so per doc the flagged count can never undercount
        assert r["n_bloom_flagged"] >= r["n_exact_contaminated"], r
        assert r["n_false_positive"] == r["n_bloom_flagged"] - r["n_exact_contaminated"]
        if r["n_exact_contaminated"] > 0:
            assert r["bloom_would_drop"], r
        assert 0 <= r["n_bloom_flagged"] <= r["n_shingles"] or r["n_shingles"] == 0


def test_q58_diff_hits_every_planted_branch(spark, sf_dir):
    rows = STAGED["q58_snapshot_diff"].builder(spark, sf_dir).collect()
    by_status: dict = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
    assert set(by_status) == {"added", "removed", "changed"}
    for r in by_status["removed"]:
        assert r["doc_id"] % 13 == 7 and r["new_fp"] is None, r
    for r in by_status["changed"]:
        assert r["doc_id"] % 11 == 5 and r["old_fp"] != r["new_fp"], r
    for r in by_status["added"]:
        assert r["doc_id"] >= 900000 and r["old_fp"] is None, r


def test_q59_sample_upweights_and_ranks_contiguously(spark, sf_dir):
    from pyspark.sql import functions as F

    from bucket_to_bigquery_spark.queries.registry import tables

    rows = STAGED["q59_weighted_sample"].builder(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["rank"])
    for lang, ranks in by_lang.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), lang
    # the exponential key favors heavy docs: the sampled mean weight must
    # exceed the corpus mean. The margin is bounded by the corpus's own
    # weight dispersion (A-ES inclusion ∝ weight, so the sample mean
    # approaches E[w²]/E[w] ≈ 1.1–1.2× here — n_chars is not very
    # dispersed); 5% cleanly separates 'weighted' from 'uniform' noise
    # at every sf without overfitting the margin to one corpus.
    corpus_mean = (
        tables(spark, sf_dir)["documents"]
        .agg(F.avg(F.greatest(F.col("n_chars"), F.lit(1))))
        .head()[0]
    )
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > 1.05 * corpus_mean, (sample_mean, corpus_mean)


def test_q60_zorder_buckets_show_two_dim_locality(spark, sf_dir):
    from bucket_to_bigquery_spark.queries.registry import tables

    rows = STAGED["q60_zorder_layout"].builder(spark, sf_dir).collect()
    assert 1 < len(rows) <= 64
    total = sum(r["n_rows"] for r in rows)
    assert total == tables(spark, sf_dir)["events"].count()
    full = 1 << 10
    # every z-bucket confines BOTH dimensions: with 6 bucket bits (3 per
    # dim) each span is at most ~1/8 of the domain, not the full range a
    # single-dim sort leaves on its secondary column
    for r in rows:
        assert r["d1_span"] <= full // 8, r
        assert r["d2_span"] <= full // 8, r


def test_q62_projection_preserves_norms(spark, sf_dir):
    """The JL guarantee the q62 docstring claims: E[(Σ sᵢxᵢ)²] = ‖x‖² per
    output dim, so the per-vector mean of squared projected components
    tracks the squared input norm. One fixed ±1 matrix has variance, so
    pin per-vector ratios loosely and the corpus-mean ratio tightly."""
    import numpy as np

    from bucket_to_bigquery_spark.queries.registry import tables

    rows = STAGED["q62_jl_sign_projection"].builder(spark, sf_dir).collect()
    src = {
        r["vec_id"]: np.asarray(r["embedding"], dtype="float64")
        for r in tables(spark, sf_dir)["embeddings"].collect()
    }
    assert len(rows) == len(src)
    ratios = []
    for r in rows:
        proj = np.array([int(v) for v in r["proj"].split(",")], dtype="float64")
        assert proj.shape == (16,)
        norm2 = float(np.sum(np.rint(src[r["vec_id"]] * 1e6) ** 2))
        ratios.append(float(np.mean(proj**2)) / norm2)
    ratios = np.asarray(ratios)
    assert np.all((ratios > 0.05) & (ratios < 20)), (ratios.min(), ratios.max())
    assert 0.5 < float(ratios.mean()) < 2.0, ratios.mean()


def test_q61_union_estimates_in_bounds(spark, sf_dir):
    rows = STAGED["q61_hll_sketch_union"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["union_ok"], r
        assert 1 <= r["n_shards"] <= 8, r
        assert r["exact_users"] >= 1
