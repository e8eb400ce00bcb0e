"""Pre-flight check for the correctness-gate rotation invariant.

The driver gate records only the first ``GATE_WINDOW`` (50) entries of
``__spark_entry__.queries()`` in name-sorted order; the registry has more.
``__spark_entry__.GATE_PRIORITY`` aliases a chosen subset into the window.
This check mechanizes the invariant that used to be maintained by hand
(VERDICT r4, "What's wrong" #4):

    every registry entry whose implementing files changed since the last
    driver round commit MUST sort inside the gate window.

Mapping policy (file-level, conservative):

- an entry's implementing files = its builder's source module plus that
  module's operator/ingest dependencies (``MODULE_DEPS``);
- shared infra (``INFRA_FILES``) is exempt: a change there affects every
  entry equally, cannot be rotated into a 50-slot window, and any breakage
  shows in whatever rows the round records;
- a changed package file that is neither mapped nor exempt FAILS the check
  (the map must be extended, not silently skipped).

Usage::

    python tools/check_gate_rotation.py [BASE_REF]

``BASE_REF`` defaults to the most recent commit whose subject matches
``round <N>:`` — the driver's round-boundary commit. Run as pytest via
tests/test_gate_rotation.py.
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GATE_WINDOW = 50
PKG = "bucket_to_bigquery_spark/"

# Query-module -> operator/ingest files its builders execute. Keys and
# values are repo-relative paths.
MODULE_DEPS: dict[str, list[str]] = {
    PKG + "queries/llm_queries.py": [
        PKG + "operators/dedup.py",
        PKG + "operators/graph.py",
        PKG + "operators/similarity.py",
        PKG + "operators/multimodal.py",
        # relational.py was a dep here through r6 (q48d executed its
        # _scratch/_materialize_once helpers); r7 migrated q48d to
        # scratch.materialize_once (GATE_r07.md "Policy changes"), so a
        # relational.py change no longer pulls the llm surface in-window.
        PKG + "operators/lm.py",
        PKG + "scratch.py",
    ],
    PKG + "queries/relational.py": [
        PKG + "operators/asof_join.py",
        PKG + "operators/range_join.py",
        # q02/q02b/q05 materialize scratch inputs through scratch.py
        # since the r8 migration (GATE_r07.md plan #1)
        PKG + "scratch.py",
    ],
    PKG + "queries/ingest_queries.py": [
        PKG + "ingest/loader.py",
        PKG + "ingest/fs.py",
        PKG + "ingest/schema_registry.py",
        PKG + "ingest/events.py",
        PKG + "ingest/manifest.py",
        # the r8 migration moved the scratch-helper imports off
        # relational.py onto scratch.py — the relational edge is retired
        PKG + "scratch.py",
    ],
    PKG + "queries/streaming_queries.py": [
        PKG + "streaming/__init__.py",
        PKG + "ingest/events.py",
        # see the ingest_queries note above (r8 migration)
        PKG + "scratch.py",
    ],
    PKG + "queries/scalar.py": [],
    PKG + "queries/formats.py": [
        PKG + "scratch.py",
    ],
    PKG + "queries/udf_queries.py": [],
    PKG + "queries/skew_queries.py": [
        PKG + "operators/salted_join.py",
    ],
    # Staged r9 surface (GATE_r08.md "Round-9 rotation plan"): these
    # modules are NOT imported by queries/__init__ yet, so they register
    # ZERO entries this round — the mapping exists so the "unmapped
    # changed file" guard knows them, and so their r9 registration
    # inherits correct dependency pull-in from day one.
    PKG + "queries/joins_ext.py": [],
    PKG + "queries/mixture.py": [],
    PKG + "queries/sketches.py": [
        PKG + "operators/dedup.py",
    ],
    PKG + "queries/maintenance.py": [
        PKG + "ingest/loader.py",
        PKG + "ingest/fs.py",
        PKG + "ingest/schema_registry.py",
        PKG + "ingest/events.py",
        PKG + "ingest/manifest.py",
        PKG + "scratch.py",
    ],
    PKG + "queries/incremental.py": [
        PKG + "operators/dedup.py",
        PKG + "scratch.py",
    ],
    # Staged r10 surface (GATE_r09.md "Round-10 rotation plan"): NOT
    # imported by queries/__init__ yet — zero registered entries this
    # round; mapped so the unmapped-changed-file guard knows them and so
    # their registration inherits correct dependency pull-in.
    PKG + "queries/bloom.py": [
        PKG + "operators/dedup.py",
        # q57's oracle is built from llm_queries' _TOKS_SQL/_SH5_SQL
        # (one tokenizer definition, per the r9 review) — a change there
        # must pull the bloom entries once registered
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/snapshot.py": [],
    PKG + "queries/sampling_ext.py": [],
    PKG + "queries/layout.py": [],
    PKG + "queries/hll.py": [],
    PKG + "queries/projections.py": [
        # the Arrow projection shares the scaled-int rounding contract
        # (_round_nearest_ties_away_e12) with the q48 scorer
        PKG + "operators/similarity.py",
    ],
    # New r10 surface (GATE_r10.md): self-contained event/relational
    # analytics modules — deliberately free of scratch.py and of every
    # r11-window module, so the committed r11 scratch rotation stays at
    # exactly 50 slots.
    PKG + "queries/sessions.py": [],
    PKG + "queries/cohorts.py": [],
    PKG + "queries/quantiles.py": [],
    PKG + "queries/keystats.py": [],
    PKG + "queries/windows_ext.py": [],
    PKG + "queries/vectors_ext.py": [],
    # Second r10 batch — same self-containment constraint (no scratch.py,
    # no r11-window module).
    PKG + "queries/scd.py": [],
    PKG + "queries/chunking.py": [],
    # Third r10 batch — same constraint.
    PKG + "queries/quality.py": [],
    PKG + "queries/upsert.py": [],
    # Fourth r10 batch — same constraint. retrieval.py shares the
    # tokenizer contract (Spark: operators.dedup.tokens; oracle:
    # llm_queries._TOKS_SQL) — a change on either side must pull q75.
    PKG + "queries/retrieval.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/basket.py": [],
    PKG + "queries/attribution.py": [],
    # Fifth r10 batch — same constraint; graphs.py implements PageRank /
    # triangles inline precisely so it does NOT pull operators/graph.py
    # (whose fan-in is the llm family).
    PKG + "queries/graphs.py": [],
    PKG + "queries/linkage.py": [],
    # Sixth r10 batch — same constraint.
    PKG + "queries/stats_ext.py": [],
    PKG + "queries/decay.py": [],
    PKG + "queries/skyline.py": [],
    # Seventh r10 batch — same constraint; shift.py shares the tokenizer
    # contract (operators.dedup.tokens / llm_queries._TOKS_SQL).
    PKG + "queries/shift.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/anomaly.py": [],
    # Eighth r10 batch — same constraint.
    PKG + "queries/markov.py": [],
    PKG + "queries/rfm.py": [],
    PKG + "queries/trend.py": [],
    # Ninth r10 batch — same constraint; overlap.py keys on the q47
    # SHINGLE contract (shingles(tokens, 5) / _SH5_SQL, like q47d).
    PKG + "queries/concentration.py": [],
    PKG + "queries/overlap.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    # Staged r12 surface (GATE_r10.md round-11/12 plan): NOT imported by
    # queries/__init__ — zero registered entries until r12; mapped so
    # the unmapped-changed-file guard knows them and registration
    # inherits correct dependency pull-in.
    PKG + "queries/pit.py": [],
    PKG + "queries/ab.py": [],
    PKG + "queries/paths.py": [],
    # q89b shares the q47 shingle contract like overlap.py
    PKG + "queries/sketch_overlap.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    # New r12 surface: q48g exercises the IVF scan-stats machinery in
    # operators/similarity.py — a change there must pull it in-window
    # (like projections.py's q62).
    PKG + "queries/scan_stats.py": [
        PKG + "operators/similarity.py",
    ],
    # New r13 surface: q48h runs the IVF probe+rank path with injected
    # centroids, reusing similarity.py's e12 primitives read-only — a
    # change there must pull it in-window (like scan_stats.py's q48g).
    PKG + "queries/ann_exact.py": [
        PKG + "operators/similarity.py",
    ],
    # New r13 surface #2: q108 consumes A5-shaped envelopes through the
    # ingest decode path, the streaming idempotent sink, and a scratch-
    # materialized feed — a behavioral change to any of them must pull
    # it in-window.
    PKG + "queries/notify.py": [
        PKG + "ingest/events.py",
        PKG + "streaming/__init__.py",
        PKG + "scratch.py",
    ],
    PKG + "queries/splits.py": [
        # the split keys on operators.dedup.normalize_text (q46's exact
        # dedup-group key) and imports llm_queries._NORM_SQL for the
        # oracle — a normalization change on either side must pull
        # q72/q72b
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/tokenstats.py": [
        # tokenizer parity: Spark side uses operators.dedup.tokens, the
        # oracle llm_queries' _TOKS_SQL — changes there must pull q67
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    # Staged r13 surface (GATE_r11.md round-12 slot math: r12 is booked
    # solid, so this batch registers in r13): NOT imported by
    # queries/__init__ — zero registered entries until then; mapped so
    # the unmapped-changed-file guard knows them and registration
    # inherits correct dependency pull-in. collocations/novelty share
    # the tokenizer/shingle contract (operators.dedup.tokens/shingles,
    # llm_queries._TOKS_SQL/_SH5_SQL).
    PKG + "queries/collocations.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/novelty.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/fd.py": [],
    PKG + "queries/psi.py": [],
    # Second staged-r13 batch — same containment. zipf shares the
    # tokenizer contract; rules/arrivals/separation are self-contained
    # (separation implements the q69 scaled-int shape inline).
    PKG + "queries/rules.py": [],
    PKG + "queries/zipf.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/arrivals.py": [],
    PKG + "queries/separation.py": [],
    # Third staged-r13 batch — same containment. scorecard shares the
    # q46 normalize contract; anonymity/growth are self-contained.
    PKG + "queries/anonymity.py": [],
    PKG + "queries/scorecard.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/growth.py": [],
    # Fourth staged batch — same containment. entropy shares the
    # tokenizer contract; benford is self-contained.
    PKG + "queries/benford.py": [],
    PKG + "queries/entropy.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    # Fifth staged batch — self-contained numeric-profiling modules.
    PKG + "queries/dispersion.py": [],
    PKG + "queries/correlation.py": [],
    # Staged r14 surface (GATE_r13.md "Staged r14 surface": built late
    # r13, register in r14) — NOT imported by queries/__init__, zero
    # registered entries until then; mapped so the unmapped-changed-file
    # guard knows them and registration inherits correct pull-in.
    # tpch_ext2 imports the revenue expression/column from tpch_ext;
    # hamming/inflation/coverage share the tokenizer contract (and
    # inflation imports hamming's _SIMHASH_SQL fold twin).
    PKG + "queries/tpch_ext.py": [],
    PKG + "queries/tpch_ext2.py": [PKG + "queries/tpch_ext.py"],
    PKG + "queries/profiling.py": [],
    PKG + "queries/temperature.py": [],
    PKG + "queries/hamming.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/inflation.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
        PKG + "queries/hamming.py",
    ],
    PKG + "queries/coverage.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/actives.py": [],
    PKG + "queries/embed_outliers.py": [],
    PKG + "queries/seasonality.py": [],
    PKG + "queries/latency.py": [],
    # lloyd_step reuses similarity primitives READ-ONLY (the q48h
    # ann_exact precedent) — the edge pulls it into any similarity.py
    # rotation (r16 per the GATE_r13 plan).
    PKG + "queries/lloyd_step.py": [PKG + "operators/similarity.py"],
    # STAGED r16 (registers with the r18 dedup round,
    # tools/r18_dedup_round_plan.md): q48i reuses similarity primitives
    # READ-ONLY — same edge discipline as lloyd_step/ann_exact.
    PKG + "queries/ivf_fit.py": [PKG + "operators/similarity.py"],
    # concurrency restates the q63 sessionization contract — a
    # sessions.py contract change must pull it in-window.
    PKG + "queries/concurrency.py": [PKG + "queries/sessions.py"],
    # neardup_cc consumes the q115 adjacency + the CC operator + the
    # shared fingerprint/tokenizer contracts — registers in r16 with
    # q115/q116/q117 (the llm_queries hold-back, GATE_r13).
    PKG + "queries/neardup_cc.py": [
        PKG + "queries/hamming.py",
        PKG + "queries/llm_queries.py",
        PKG + "operators/dedup.py",
        PKG + "operators/graph.py",
    ],
    # funnel_ttc restates the q63b funnel chaining contract — a
    # sessions.py contract change must pull it in-window.
    PKG + "queries/funnel_ttc.py": [PKG + "queries/sessions.py"],
    # --- staged r17 batch (built late r13; registry-only fan-in
    # except robust, which restates q129's disc percentile rank rule:
    # a latency.py contract change must pull it in-window). ks restates
    # the q131 segmented-scan DECOMPOSITION but shares no value
    # contract with concurrency (different domain, own oracle), and
    # pq_ann re-derives the e12 d2 contract inline (the q48h/ann_exact
    # rationale) — both deliberately edge-free.
    PKG + "queries/recon.py": [],
    PKG + "queries/ks.py": [],
    PKG + "queries/robust.py": [PKG + "queries/latency.py"],
    PKG + "queries/cooccur.py": [],
    PKG + "queries/pq_ann.py": [],
    PKG + "queries/fuzzy.py": [],
    # regression restates q107's DECIMAL(38,0) exact-moment + e6
    # output contract — a correlation.py contract change must pull it
    # in-window once both register.
    PKG + "queries/regression.py": [PKG + "queries/correlation.py"],
    PKG + "queries/multitouch.py": [],
    PKG + "queries/sq.py": [],
    PKG + "queries/triples.py": [],
    PKG + "queries/bfs.py": [],
    PKG + "queries/ivfpq.py": [],
    # receval imports q138's builder + oracle text — a cooccur.py
    # change must pull the eval in-window once both register.
    PKG + "queries/receval.py": [PKG + "queries/cooccur.py"],
    PKG + "queries/cohits.py": [],
    # lloyd2 reuses similarity's ivf_operating_point READ-ONLY (the
    # q130 precedent) — must stay UNREGISTERED through the r16
    # similarity rotation (the edge would grow that window past 50);
    # registers r18.
    PKG + "queries/lloyd2.py": [PKG + "operators/similarity.py"],
    # bpe2 shares the q67 tokenizer contract (tokens/_TOKS_SQL) AND
    # q67's pair statistic (round 1 is behaviorally pinned to it) —
    # a tokenstats.py change must pull the chain in-window once it
    # registers (r18, after the r15 llm rotation).
    PKG + "queries/bpe2.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
        PKG + "queries/tokenstats.py",
    ],
    # srccontain imports q89's fold twin + the shingle contract — an
    # overlap.py/llm/dedup change must pull it once registered (r18,
    # after the r15 llm rotation).
    PKG + "queries/srccontain.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
        PKG + "queries/overlap.py",
    ],
    # survival restates the q63 sessionization contract — a
    # sessions.py contract change must pull it in-window (the
    # concurrency/funnel_ttc precedent).
    PKG + "queries/survival.py": [PKG + "queries/sessions.py"],
    PKG + "queries/pipeline_queries.py": [
        PKG + "operators/substring.py",
        # q51/q53/q54 build on the planted-dup corpus + tokenization +
        # gate/pair CTEs from the llm surface; q54 additionally runs the
        # dedup pair miner and connected components — a change in ANY of
        # these must pull the pipeline entries in-window too.
        PKG + "queries/llm_queries.py",
        PKG + "operators/dedup.py",
        PKG + "operators/graph.py",
        # the planted-corpus builders the pipeline entries execute live
        # in llm_queries but materialize through scratch.py — map it
        # directly (the dep map is NOT transitive)
        PKG + "scratch.py",
    ],
    # Staged r19 surface (built r14, GATE_r14.md "Staged r19 surface"):
    # NOT imported by queries/__init__ yet — zero registered entries;
    # mapped so the unmapped-changed-file guard knows them and so their
    # registration inherits correct dependency pull-in.
    PKG + "queries/tpch_ext3.py": [],
    PKG + "queries/rankchurn.py": [],
    # markov_eval restates q85's (ts, event_id) transition total order —
    # a markov.py contract change must pull the eval in-window once it
    # registers (the survival.py/sessions.py precedent).
    PKG + "queries/markov_eval.py": [PKG + "queries/markov.py"],
    # packstats calls pipeline_queries.pack_chunks and embeds _Q52_SQL —
    # map pipeline_queries plus ITS packing-relevant inputs directly
    # (the dep map is NOT transitive): _Q52_SQL interpolates the
    # llm tokenizer twin and pack_chunks tokenizes via operators/dedup.
    PKG + "queries/packstats.py": [
        PKG + "queries/pipeline_queries.py",
        PKG + "queries/llm_queries.py",
        PKG + "operators/dedup.py",
    ],
    PKG + "queries/saltadvisor.py": [],
    # pq_recall calls pq_ann.pq_adc_topk and embeds _Q141_ORACLE +
    # the e12 distance twins — a pq_ann.py change must pull the audit
    # in-window once both register (the receval/cooccur precedent).
    PKG + "queries/pq_recall.py": [PKG + "queries/pq_ann.py"],
    PKG + "queries/lift.py": [],
    # Staged r20 surface (built r14, GATE_r14.md "Staged r20 surface"):
    # checksums imports operators/dedup.shingle_hash (the one fold
    # definition); histogram/negatives restate the q131-q136 segmented
    # scan / e12 distance DECOMPOSITIONS deliberately edge-free (the
    # ks/pq_ann precedent — no shared value contract); profile_drift
    # shares only the q113 fixed-column-list *convention*.
    PKG + "queries/checksums.py": [PKG + "operators/dedup.py"],
    PKG + "queries/histogram.py": [],
    PKG + "queries/negatives.py": [],
    PKG + "queries/profile_drift.py": [],
    # Second staged r20 batch (late r14): boilerplate/postings share
    # the q47/q49 tokenizer-shingle twins (the overlap/retrieval
    # pattern); apportion keys on character mass (registry-only, the
    # temperature.py convention); qq restates the q162 segmented-scan
    # decomposition edge-free; layout_advisor is registry-only.
    PKG + "queries/boilerplate.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/apportion.py": [],
    PKG + "queries/postings.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/qq.py": [],
    PKG + "queries/layout_advisor.py": [],
    # Staged r19 streaming entry (late r14): q170 calls
    # streaming_queries._events_stream and run_stream_to_memory — map
    # the full chain directly (the dep map is NOT transitive). It
    # registers in r19, the round that rotates this family in-window
    # for the events.py try_to_binary fix anyway.
    # Third staged r20 batch (late r14): rendezvous is registry-only
    # (its md5 fold twins are inline, the pq_ann edge-free choice);
    # datacard shares the tokenizer twins (dedup + llm_queries).
    PKG + "queries/rendezvous.py": [],
    PKG + "queries/embedhealth.py": [],
    PKG + "queries/bursts.py": [],
    PKG + "queries/consample.py": [],
    # langeval calls q49c's registered builder and pulls its oracle
    # from the registry — a llm_queries.py change must pull the eval
    # in-window once it registers (plus the tokenizer operator).
    PKG + "queries/langeval.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/datacard.py": [
        PKG + "operators/dedup.py",
        PKG + "queries/llm_queries.py",
    ],
    PKG + "queries/outer_join_stream.py": [
        PKG + "queries/streaming_queries.py",
        PKG + "streaming/__init__.py",
        PKG + "ingest/events.py",
        PKG + "scratch.py",
    ],
}

# Shared infra: exercised by every entry, exempt from rotation. Exemption
# is for STRUCTURAL plumbing only (import wiring, registry mechanics) —
# a break there fails every recorded row, so it cannot hide.
INFRA_FILES = {
    PKG + "__init__.py",
    PKG + "catalog.py",
    PKG + "run.py",
    PKG + "queries/__init__.py",
    PKG + "queries/registry.py",
    PKG + "operators/__init__.py",
    PKG + "ingest/__init__.py",
    PKG + "functions/__init__.py",
    PKG + "streaming/__init__.py",  # also a dep of streaming_queries
}

# Multi-round rotation deferral (r11, the scratch.py 2-round split).
#
# A wide-fan-in file (scratch.py: 88 dependent entries) cannot fit one
# 50-slot window, so its behavioral change ships under an explicit
# 2-round plan (GATE_r{N}.md). The plan is mechanized by a deferral file
# so the second half cannot silently slip:
#
# - The round that makes the change CREATES ``tools/deferred_rotation.json``
#   listing (a) the changed files the deferral covers and (b) the affected
#   entries whose rotation is postponed. Those entries are exempt from the
#   in-window requirement THIS round only — and only when every changed
#   implementing file of the entry is covered by the deferral (no
#   piggybacking other behavioral changes under the exemption).
# - The NEXT round must DELETE the file and rotate every listed entry
#   in-window (its window plan is written around them). If the file
#   survives into a second round, the check fails; if it is deleted
#   without the listed entries in-window, the check fails.
# - Boundary quirk (ADVICE r15 #1): the driver's ``round N:`` commit is
#   its own base ref, so at the start of round N+1 the file exists at
#   BOTH base and HEAD even though nothing has slipped yet. When the
#   deferral's ``created_round`` equals the base commit's round number,
#   the carry error is therefore deferred until behavioral package work
#   has actually begun this round without resolving the obligation —
#   the round still cannot end green with the file alive, because any
#   rotation work is itself a behavioral change.
DEFERRAL_FILE = "tools/deferred_rotation.json"

# Result-AFFECTING infra: session config (AQE/ANSI/timezone) can change
# query RESULTS, not just break them, so it may not be silently exempted
# (ADVICE r5 #1). A change here affects all entries at once — more than the
# 50-slot window holds — so the check FAILS, forcing the round to either
# split the change or explicitly document a full-rotation plan in
# GATE_r{N}.md before relaxing this by hand.
RESULT_AFFECTING_INFRA = {
    PKG + "session.py",
}


def _git(*args: str) -> str:
    return subprocess.check_output(["git", *args], cwd=REPO, text=True)


def ast_fingerprint(src: str) -> str | None:
    """Structural fingerprint of a Python source: the AST dump with every
    docstring normalized away. Two sources with the same fingerprint can
    only differ in comments, whitespace/formatting, or docstrings — none
    of which can change a query result. ``None`` when unparseable (the
    caller must then treat the file as changed)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (
            isinstance(body, list) and body
            and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)
        ):
            node.body = body[1:] or [ast.Pass()]
    return ast.dump(tree, include_attributes=False)


def _behavior_changed(path: str, base: str) -> bool:
    """True unless the base→HEAD diff of ``path`` is comment/docstring-only.

    The rotation invariant exists to surface BEHAVIOR changes in the gate
    window; a file-level diff would also flag pure documentation fixes,
    which matters because wide-fan-in files (scratch.py: 88 dependent
    entries) can never fit one 50-slot window — without this, a stale
    docstring there would be permanently unfixable. Conservative on every
    edge: added files, unreadable revisions, or unparseable content count
    as changed."""
    try:
        old = _git("show", f"{base}:{path}")
        new = _git("show", f"HEAD:{path}")
    except subprocess.CalledProcessError:
        return True  # added/removed/renamed → behavioral by definition
    fp_old, fp_new = ast_fingerprint(old), ast_fingerprint(new)
    if fp_old is None or fp_new is None:
        return True
    return fp_old != fp_new


def evaluate_deferral(
    base_deferral: dict | None,
    head_deferral: dict | None,
    registry: set[str],
    changed: set[str],
    in_window,
    impl_changed: dict[str, set[str]],
    base_round_n: int | None = None,
    gate_file_changed: bool = False,
) -> tuple[list[str], set[str]]:
    """Apply the DEFERRAL_FILE rules. Returns (problems, exempt entries).

    - file at base AND at HEAD with a HEAD ``created_round`` equal to
      ``base_round_n + 1`` (and different from the base file's): the
      current round resolved the old deferral and created a NEW one —
      legal exactly when the old file's listed entries are in-window
      this round (the deleted-at-HEAD rule) and the new file passes the
      created-at-HEAD rules below (r16: the optimization round resolves
      the r15 dedup deferral in its booked window AND needs its own
      deferral for the llm-surface optimization split);
    - file at base AND at HEAD otherwise: carried a second round →
      problem, UNLESS
      the deferral's ``created_round`` equals ``base_round_n`` (the base
      ref is the boundary commit of the round that created the deferral,
      so HEAD is the resolution round itself, not a second-round carry —
      ADVICE r15 #1). In that case the obligation trips once gate work
      exists this round without the file having been deleted: behavioral
      package changes (``changed`` non-empty) OR an edit to the gate
      file itself (``gate_file_changed`` — every rotation starts with a
      GATE_PRIORITY rewrite, so a resolution round cannot do its window
      bookkeeping while leaving the obligation silent). Residual gap,
      accepted: a round that touches neither the package nor the gate
      file stays green with the file alive — such a round did no
      gate-relevant work, and the next boundary still hard-fails it;
    - file at base, deleted at HEAD: this round resolves it — every
      listed entry must be in-window, else problem;
    - file created at HEAD: listed entries are exempt from the in-window
      requirement, but ONLY those whose changed implementing files are
      all covered by the deferral's ``changed_files`` (no piggybacking
      unrelated behavioral changes under the exemption). Unknown entry
      names and covered-but-unchanged files are problems.
    """
    problems: list[str] = []
    exempt: set[str] = set()
    if (
        base_deferral is not None
        and head_deferral is not None
        and base_round_n is not None
        and head_deferral.get("created_round") == base_round_n + 1
        and base_deferral.get("created_round") != head_deferral.get("created_round")
    ):
        # The head file is a NEW deferral created by the current round
        # (created_round == base round + 1), not the base one carried:
        # the base deferral is resolved THIS round exactly as if its
        # file had been deleted (every listed entry in-window), and the
        # new deferral applies with the created-at-HEAD rules below.
        # Anything else (same created_round, missing/wrong round
        # numbers) keeps the conservative carry semantics.
        overdue = [
            n for n in base_deferral.get("entries", [])
            if n in registry and not in_window(n)
        ]
        if overdue:
            problems.append(
                f"{DEFERRAL_FILE} was replaced by a round-"
                f"{base_round_n + 1} deferral but these round-"
                f"{base_deferral.get('created_round')} deferred entries "
                f"are not in the gate window: {sorted(overdue)}"
            )
        base_deferral = None  # fall through to the created-at-HEAD rules
    if base_deferral is not None and head_deferral is not None:
        created = base_deferral.get("created_round")
        if (base_round_n is not None and created == base_round_n):
            if changed or gate_file_changed:
                problems.append(
                    f"{DEFERRAL_FILE} (created round {created}) is due "
                    "THIS round: gate work exists (behavioral package "
                    "changes or a gate-file edit) but the deferral is "
                    "unresolved — delete the file and rotate "
                    f"{sorted(base_deferral.get('entries', []))} in-window"
                )
        else:
            problems.append(
                f"{DEFERRAL_FILE} existed at the base round AND still "
                "exists at HEAD — a deferred rotation must be resolved "
                "(file deleted, entries in-window) in the very next "
                "round, not carried"
            )
    elif base_deferral is not None:
        # an entry deregistered/renamed since the deferral was written
        # is satisfied trivially (its code is gone — there is nothing
        # left to rotate); requiring it would brick the round
        overdue = [
            n for n in base_deferral.get("entries", [])
            if n in registry and not in_window(n)
        ]
        if overdue:
            problems.append(
                f"{DEFERRAL_FILE} was deleted but these deferred entries "
                f"are not in the gate window this round: {sorted(overdue)}"
            )
    elif head_deferral is not None:
        dfiles = set(head_deferral.get("changed_files", []))
        dentries = set(head_deferral.get("entries", []))
        bogus = dentries - registry
        if bogus:
            problems.append(
                f"{DEFERRAL_FILE} lists unknown entries: {sorted(bogus)}"
            )
        stray = dfiles - changed
        if stray:
            problems.append(
                f"{DEFERRAL_FILE} covers files that did not behaviorally "
                f"change this round (stale deferral?): {sorted(stray)}"
            )
        for name, files in impl_changed.items():
            if name in dentries and files <= dfiles:
                exempt.add(name)
    return problems, exempt


def _load_deferral_head() -> dict | None:
    """The working-tree deferral file, or None when absent/unreadable."""
    import json

    path = os.path.join(REPO, DEFERRAL_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _load_deferral_rev(base: str) -> dict | None:
    """The deferral file as of ``base``, or None when absent there."""
    import json

    try:
        return json.loads(subprocess.check_output(
            ["git", "show", f"{base}:{DEFERRAL_FILE}"], cwd=REPO,
            text=True, stderr=subprocess.DEVNULL))
    except subprocess.CalledProcessError:
        return None


def default_base_ref() -> str | None:
    for line in _git("log", "--format=%H %s").splitlines():
        sha, _, subject = line.partition(" ")
        if re.match(r"round \d+:", subject):
            return sha
    return None


def base_round_number(base: str) -> int | None:
    """The N of the ``round N:`` subject at ``base``, else None.

    None (an explicit BASE_REF that is not a boundary commit, or an
    unreadable ref) keeps the conservative carry semantics in
    evaluate_deferral."""
    try:
        subject = _git("log", "-1", "--format=%s", base).strip()
    except subprocess.CalledProcessError:
        return None
    m = re.match(r"round (\d+):", subject)
    return int(m.group(1)) if m else None


def check(base_ref: str | None = None) -> list[str]:
    """Return a list of problem strings (empty = invariant holds)."""
    from __spark_entry__ import GATE_PRIORITY, _gate_name
    from bucket_to_bigquery_spark.queries import all_queries

    reg = all_queries()
    problems: list[str] = []

    unknown = GATE_PRIORITY - set(reg)
    if unknown:
        problems.append(f"GATE_PRIORITY names not in registry: {sorted(unknown)}")
    if len(GATE_PRIORITY) > GATE_WINDOW:
        problems.append(
            f"GATE_PRIORITY has {len(GATE_PRIORITY)} entries; window is "
            f"{GATE_WINDOW} — changed entries would spill out of the gate"
        )

    gate_order = sorted(_gate_name(n) for n in reg)
    window = set(gate_order[:GATE_WINDOW])

    base = base_ref or default_base_ref()
    if base is None:
        print("check_gate_rotation: no 'round N:' commit found; "
              "nothing to diff against (fresh repo) — skipping diff check")
        changed: set[str] = set()
        gate_file_changed = False
    else:
        diff_names = _git("diff", "--name-only", f"{base}..HEAD").splitlines()
        touched = {
            f for f in diff_names
            if f.startswith(PKG) and f.endswith(".py")
        }
        gate_file_changed = "__spark_entry__.py" in diff_names
        changed = {f for f in touched if _behavior_changed(f, base)}
        doc_only = touched - changed
        if doc_only:
            print(f"comment/docstring-only (exempt from rotation): "
                  f"{sorted(doc_only)}")

    hot_infra = changed & RESULT_AFFECTING_INFRA
    if hot_infra:
        problems.append(
            f"result-affecting infra changed: {sorted(hot_infra)} — this "
            f"affects ALL {len(reg)} entries, which cannot fit the "
            f"{GATE_WINDOW}-slot window. Split the change across rounds or "
            "document a deliberate full-rotation plan in GATE_r{N}.md"
        )

    unmapped = {
        f for f in changed
        if f not in INFRA_FILES
        and f not in RESULT_AFFECTING_INFRA
        and f not in MODULE_DEPS
        and not any(f in deps for deps in MODULE_DEPS.values())
    }
    if unmapped:
        problems.append(
            f"changed package files not covered by MODULE_DEPS/INFRA_FILES "
            f"(extend the map): {sorted(unmapped)}"
        )

    # entry -> implementing files
    affected: list[str] = []
    impl_changed: dict[str, set[str]] = {}
    for name, q in reg.items():
        fn = getattr(q.builder, "__wrapped__", q.builder)
        mod = os.path.relpath(fn.__code__.co_filename, REPO)
        impl = {mod, *MODULE_DEPS.get(mod, [])}
        if impl & changed:
            affected.append(name)
            impl_changed[name] = impl & changed

    # Multi-round deferral (see DEFERRAL_FILE note above). With no base
    # commit there is no diff to defer against — skip, like the diff
    # check itself (a shallow/squashed clone must not fail on the
    # committed deferral file's stray-files guard).
    exempt: set[str] = set()
    if base is not None:
        head_deferral = _load_deferral_head()
        base_deferral = _load_deferral_rev(base)
        dproblems, exempt = evaluate_deferral(
            base_deferral, head_deferral, set(reg), changed,
            lambda n: _gate_name(n) in window, impl_changed,
            base_round_n=base_round_number(base),
            gate_file_changed=gate_file_changed,
        )
        problems.extend(dproblems)
    if exempt:
        print(f"deferred to next round per {DEFERRAL_FILE} "
              f"({len(exempt)} entries): {sorted(exempt)}")

    out_of_window = [
        n for n in affected
        if _gate_name(n) not in window and n not in exempt
    ]
    if out_of_window:
        problems.append(
            "entries with changed implementing files OUTSIDE the gate "
            f"window (add to GATE_PRIORITY): {sorted(out_of_window)}"
        )

    ungated = sorted(n for n in reg if _gate_name(n) not in window)
    print(f"gate window: {GATE_WINDOW}/{len(reg)} entries; base={base and base[:9]}")
    print(f"changed package files: {len(changed)}; affected entries: "
          f"{len(affected)} (all in-window: {not out_of_window})")
    print(f"out-of-window this round ({len(ungated)}; rely on prior-round "
          f"rows, files unchanged): {ungated}")
    return problems


def main() -> int:
    problems = check(sys.argv[1] if len(sys.argv) > 1 else None)
    for p in problems:
        print(f"FAIL: {p}", file=sys.stderr)
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
