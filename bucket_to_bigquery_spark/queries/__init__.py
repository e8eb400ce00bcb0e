"""Declared query surface. Importing this package registers every query
module into ``registry.REGISTRY``.

Modules are imported eagerly — an ImportError inside any of them must
surface loudly, not silently shrink the registry (and with it the
correctness/coverage gates).
"""

from __future__ import annotations

from . import relational  # noqa: F401
from . import scalar  # noqa: F401
from . import ingest_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import udf_queries  # noqa: F401
from . import llm_queries  # noqa: F401
from . import skew_queries  # noqa: F401
from . import pipeline_queries  # noqa: F401
from . import formats  # noqa: F401

# The r8-staged surface (GATE_r08.md "Round-9 rotation plan" #1): these
# modules shipped in round 8 fully oracle-verified but unregistered (the
# r8 gate window was at capacity); round 9 wires them in here. The
# modules themselves are unchanged at registration time, so each entry
# costs exactly its own GATE_PRIORITY slot and pulls no family.
from . import incremental  # noqa: E402
from . import joins_ext  # noqa: E402
from . import maintenance  # noqa: E402
from . import mixture  # noqa: E402
from . import sketches  # noqa: E402

# The r9-staged surface (GATE_r09.md "Round-10 rotation plan" #0 /
# tools/r10_surface_plan.md): round 10 wires in q57 Bloom
# decontamination, q58 snapshot diff, q59 weighted sampling, q60 Z-order
# layout, q61 HLL sketch union, q62 JL sign projection. Each entry costs
# its own GATE_PRIORITY slot and pulls no family (the modules were staged
# in r9; r10 touched only q59's rank surrogate and bloom comments before
# registration — both modules' entries are in-window).
from . import bloom  # noqa: E402
from . import hll  # noqa: E402
from . import layout  # noqa: E402
from . import projections  # noqa: E402
from . import sampling_ext  # noqa: E402
from . import snapshot  # noqa: E402

# New r10 surface (GATE_r10.md): event analytics (sessionization, funnel,
# cohorts, windowed top-k), distribution stats (quantile bands), skew
# diagnostics (heavy keys, frequency histogram), tokenizer induction
# (BPE pair merge). These register via the plain @query decorator at
# import; each entry is budgeted in GATE_PRIORITY. None depend on
# scratch.py or any r11-window module (the r11 scratch schedule relies
# on this — see GATE_r10.md).
from . import cohorts  # noqa: F401, E402
from . import keystats  # noqa: F401, E402
from . import quantiles  # noqa: F401, E402
from . import sessions  # noqa: F401, E402
from . import tokenstats  # noqa: F401, E402
from . import vectors_ext  # noqa: F401, E402
from . import windows_ext  # noqa: F401, E402

# Second r10 batch, same contract: SCD-2 dimension build (the warehouse
# CDC fold of the loaded event log), overlapping document chunking (the
# RAG/context-window preprocessing primitive), and the leakage-safe
# dedup-group split + its audit. New modules only — the r11 scratch
# window is untouched.
from . import chunking  # noqa: F401, E402
from . import scd  # noqa: F401, E402
from . import splits  # noqa: F401, E402

# Third r10 batch, same contract: the declarative data-quality
# constraint suite (the pre-publish gate between loader.run and
# queryability) and the changelog upsert (latest-state compaction, the
# merge-on-read twin of scd's full-history fold).
from . import quality  # noqa: F401, E402
from . import upsert  # noqa: F401, E402

# Fourth r10 batch, same contract: BM25 ranked retrieval (the IR /
# contamination-triage primitive over the document corpus), frequent
# co-occurring item pairs (market-basket mining with the a-priori
# support prune), and last-touch attribution (the per-key as-of lookup
# as a running window). New modules only; no scratch.py, no r11-window
# module — the committed r11 scratch rotation stays at exactly 50.
from . import attribution  # noqa: F401, E402
from . import basket  # noqa: F401, E402
from . import retrieval  # noqa: F401, E402

# Fifth r10 batch, same contract: graph analytics over the part
# co-occurrence graph (exact-integer PageRank, degree-oriented triangle
# count — complementing q46c's connected components) and
# sorted-neighborhood entity linkage (the record-linkage primitive).
# graphs.py is deliberately free of operators/graph.py (llm-family
# fan-in); the r11 scratch window stays exactly 50.
from . import graphs  # noqa: F401, E402
from . import linkage  # noqa: F401, E402

# Sixth r10 batch, same contract: categorical-association profiling
# (chi-square / Cramér's V), exponential time-decay scoring (the
# recency feature), and the skyline / Pareto-frontier operator. New
# modules only; the r11 scratch window stays exactly 50.
from . import decay  # noqa: F401, E402
from . import skyline  # noqa: F401, E402
from . import stats_ext  # noqa: F401, E402

# Seventh r10 batch, same contract: distribution-shift detection
# (per-source Jensen-Shannon divergence over a bounded vocabulary) and
# daily volume anomaly flags (the ingest monitoring primitive). New
# modules only; the r11 scratch window stays exactly 50.
from . import anomaly  # noqa: F401, E402
from . import shift  # noqa: F401, E402

# Eighth r10 batch, same contract: Markov transition estimation (the
# sequence-modeling primitive), RFM customer scoring (rank-bucketed
# feature engineering), week-over-week revenue deltas (time-series
# reporting). New modules only; the r11 scratch window stays exactly 50.
from . import markov  # noqa: F401, E402
from . import rfm  # noqa: F401, E402
from . import trend  # noqa: F401, E402

# Ninth (final) r10 batch, same contract: Gini concentration (the
# dataset-governance inequality metric) and pairwise source content
# overlap (ingest governance over the q47 shingle contract). New
# modules only; the r11 scratch window stays exactly 50.
from . import concentration  # noqa: F401, E402
from . import overlap  # noqa: F401, E402

# The r12 window (GATE_r12.md): the four pre-booked staged registrations
# — q90 PIT enrichment, q91 A/B lift, q92 top event paths, q89b MinHash
# source overlap (closing the q89 `weak` mark; q89 is re-labeled the
# flagged-pair verifier) — plus the NEW q48g IVF scan-stats side-channel
# (the full-value-oracle twin that narrows q48c/d's no_oracle
# declaration to the seeded fit). Each entry is budgeted in
# GATE_PRIORITY; sketch_overlap/scan_stats dependency pull-in is mapped
# in tools/check_gate_rotation.py.
from . import ab  # noqa: F401, E402
from . import paths  # noqa: F401, E402
from . import pit  # noqa: F401, E402
from . import scan_stats  # noqa: F401, E402
from . import sketch_overlap  # noqa: F401, E402

# The r13 window (GATE_r13.md): the 15 staged modules built across
# r11 — PMI collocations, functional-dependency audit, shingle novelty,
# PSI drift, association rules, Zipf slope, inter-arrival burstiness,
# class separation, k-anonymity, source scorecard, new-vs-returning
# growth, Benford audit, unigram entropy, unit-price dispersion,
# correlation matrix. Each was value-oracled at sf0.001+sf0.01,
# brute-force replayed, plan-pinned and 10x-probed BEFORE registration
# (tests/test_staged_r13*.py, tools/probe_staged_scale.py); each entry
# costs exactly one GATE_PRIORITY slot. collocations/novelty/zipf/
# scorecard/entropy share the q46-family tokenizer/normalize contracts,
# so MODULE_DEPS maps them onto llm_queries.py — registration itself
# does not change that file, so no extra pull-in (GATE_r12.md slot
# math).
# Mid-r13 registration (GATE_r13.md "Mid-round registrations"): q48h,
# the full-value-oracle IVF top-k with injected deterministic centroids
# — registers via @query at import; its slot is paid by evicting the
# q31c stale-refresh alias (file untouched, r10 row stays valid).
from . import ann_exact  # noqa: F401, E402
from . import anonymity  # noqa: F401, E402
# Mid-r13 registration #2 (GATE_r13.md): q108, notification-driven
# ingest from a live socket (the A5/A17 PubSub-pull parity leg) —
# slot paid by evicting the q72b stale-refresh alias.
from . import notify  # noqa: F401, E402
from . import arrivals  # noqa: F401, E402
from . import benford  # noqa: F401, E402
from . import collocations  # noqa: F401, E402
from . import correlation  # noqa: F401, E402
from . import dispersion  # noqa: F401, E402
from . import entropy  # noqa: F401, E402
from . import fd  # noqa: F401, E402
from . import growth  # noqa: F401, E402
from . import novelty  # noqa: F401, E402
from . import psi  # noqa: F401, E402
from . import rules  # noqa: F401, E402
from . import scorecard  # noqa: F401, E402
from . import separation  # noqa: F401, E402
from . import zipf  # noqa: F401, E402

# The r14 window (GATE_r13.md "Round-14/15/16 plan"): the 21 booked
# staged registrations q109-q114, q118-q131, q134 — TPC-H Q5/Q10/Q14/Q8
# shapes, single-pass column profile, temperature-scaled mixture
# weights, trailing-7-day actives, the TPC-H subquery-machinery batch
# (Q4/Q7/Q13/Q17/Q18/Q19/Q15/Q22 shapes), per-label embedding outliers,
# hourly seasonality, ship-latency percentiles, the Lloyd-update step
# audit, peak concurrent sessions, and funnel time-to-convert
# percentiles. Each was value-oracled at sf0.001+sf0.01 (+sf0.1 sweeps),
# brute-force replayed, plan-pinned, edge-corpus-matched and 10x-probed
# BEFORE registration (tests/test_staged_r14*.py, GATE_r13.md "Staged
# r14/r16 surface"); registration touches only this file + the
# GATE_PRIORITY aliases — no behavioral edit to any staged module.
# q115/q116/q117 and q132/q133 stay UNREGISTERED until after the r15
# llm_queries.py rotation (their tokenizer/fold MODULE_DEPS would grow
# that window past 50 — the GATE_r13.md slot math).
from . import actives  # noqa: F401, E402
from . import concurrency  # noqa: F401, E402
from . import embed_outliers  # noqa: F401, E402
from . import funnel_ttc  # noqa: F401, E402
from . import latency  # noqa: F401, E402
from . import lloyd_step  # noqa: F401, E402
from . import profiling  # noqa: F401, E402
from . import seasonality  # noqa: F401, E402
from . import temperature  # noqa: F401, E402
from . import tpch_ext  # noqa: F401, E402
from . import tpch_ext2  # noqa: F401, E402

# r16 registration (GATE_r15.md "Held back" / the r16 similarity
# rotation plan): the q115/q116/q117 simhash-adjacency family and the
# q132/q133 near-dup connected-components pair, staged since r13/r14
# (tests/test_staged_r14b/f) and held back from r15 because their
# llm_queries/dedup MODULE_DEPS edges would have pushed that round's
# 49-entry window to 52. Registration touches only this file (INFRA)
# + the GATE_PRIORITY aliases — no behavioral edit to any staged
# module; all five entries are budgeted in-window this round.
from . import coverage  # noqa: F401, E402
from . import hamming  # noqa: F401, E402
from . import inflation  # noqa: F401, E402
from . import neardup_cc  # noqa: F401, E402

for _staged in (incremental, joins_ext, maintenance, mixture, sketches,
                bloom, hll, layout, projections, sampling_ext, snapshot,
                ab, paths, pit, sketch_overlap,
                anonymity, arrivals, benford, collocations, correlation,
                dispersion, entropy, fd, growth, novelty, psi, rules,
                scorecard, separation, zipf,
                actives, concurrency, embed_outliers, funnel_ttc, latency,
                lloyd_step, profiling, seasonality, temperature, tpch_ext,
                tpch_ext2,
                coverage, hamming, inflation, neardup_cc):
    _staged.register()
del _staged

from .registry import REGISTRY, Query  # noqa: E402


def all_queries() -> dict[str, Query]:
    return dict(REGISTRY)
