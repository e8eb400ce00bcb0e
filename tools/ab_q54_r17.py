"""Interleaved 3-way A/B of the q54 exact-survivor front ends (r17).

Variants (the back half — pair mining, CC, scrub, packing — is the
committed code in all three):

  old    — the r16 shape verbatim: gates over the FULL corpus, join,
           exact_dedup_groups over the gated frame, survivor join, one
           eager localCheckpoint (gate chain 2x full-corpus, 8 parquet
           scans below the barrier).
  minby  — dedup-first as ONE fused aggregate: groupBy(sha256(norm))
           with min(doc_id) + min_by(text, doc_id) (plans as
           SortAggregate — string agg buffer), checkpoint, gates ONCE
           over survivors, checkpoint.
  join   — dedup-first via exact_dedup_groups (HashAggregate, text
           pruned to the hash) + survivor join back against the corpus
           scan, checkpoint, gates ONCE over survivors, checkpoint.

Interleaved in one session (old, minby, join, old, ...) so all variants
share the host regime; wall + process-tree CPU per rep.

Usage: python tools/ab_q54_r17.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bench import _calibrate, _execute, _sweep_state, _warm_python_workers  # noqa: E402
from bucket_to_bigquery_spark.operators.dedup import (  # noqa: E402
    exact_dedup_groups,
    ngram_jaccard_pairs,
    normalize_text,
)
from bucket_to_bigquery_spark.operators.graph import connected_components  # noqa: E402
from bucket_to_bigquery_spark.operators.substring import substring_scrub_counts  # noqa: E402
from bucket_to_bigquery_spark.queries.llm_queries import _dedup_corpus, quality_gates  # noqa: E402
from bucket_to_bigquery_spark.queries.pipeline_queries import (  # noqa: E402
    _Q51_WINDOW,
    pack_chunks_counts,
)

_TICK = os.sysconf("SC_CLK_TCK")


def _children_map() -> dict[int, list[int]]:
    kids: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            ppid = int(parts[1])
        except (OSError, IndexError, ValueError):
            continue
        kids.setdefault(ppid, []).append(int(pid))
    return kids


def _tree_cpu_s() -> float:
    kids = _children_map()
    total = 0.0
    stack = [os.getpid()]
    while stack:
        pid = stack.pop()
        try:
            with open(f"/proc/{pid}/stat") as fh:
                parts = fh.read().rsplit(") ", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / _TICK
        except (OSError, IndexError, ValueError):
            pass
        stack.extend(kids.get(pid, []))
    return total


def _back_half(exact_surv):
    pairs = ngram_jaccard_pairs(
        exact_surv, "doc_id", "text", n=3, threshold=0.6, max_shingle_df=100
    )
    comp = connected_components(
        pairs, src="id_a", dst="id_b",
        nodes=exact_surv.select("doc_id"), node_col="doc_id",
        nodes_unique=True, edges_unique=True,
    )
    surv = (
        comp.where(F.col("node") == F.col("cluster_id"))
        .select(F.col("node").alias("doc_id"))
    )
    final = exact_surv.join(surv, "doc_id")
    scrubbed = substring_scrub_counts(
        final, "doc_id", "text", window=_Q51_WINDOW, min_doc_freq=2
    )
    return pack_chunks_counts(
        scrubbed.where(F.col("n_kept") > 0)
        .select("doc_id", F.col("n_kept").alias("n_tok"))
    )


def _old(spark, sf_dir):
    corpus = _dedup_corpus(spark, sf_dir)
    kept = quality_gates(corpus).where("kept").select("doc_id")
    clean = corpus.join(kept, "doc_id")
    groups = exact_dedup_groups(clean, "doc_id", "text")
    exact_surv = clean.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id"
    )
    return _back_half(exact_surv.localCheckpoint(eager=True))


def _minby(spark, sf_dir):
    corpus = _dedup_corpus(spark, sf_dir)
    keepers = (
        corpus.select(
            "doc_id", "text",
            F.sha2(normalize_text("text"), 256).alias("h"),
        )
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    kept = quality_gates(keepers).where("kept").select("doc_id")
    return _back_half(
        keepers.join(kept, "doc_id").localCheckpoint(eager=True)
    )


def _join(spark, sf_dir):
    corpus = _dedup_corpus(spark, sf_dir)
    groups = exact_dedup_groups(corpus, "doc_id", "text")
    keepers = corpus.join(
        groups.select(F.col("keep_id").alias("doc_id")), "doc_id"
    ).localCheckpoint(eager=True)
    kept = quality_gates(keepers).where("kept").select("doc_id")
    return _back_half(
        keepers.join(kept, "doc_id").localCheckpoint(eager=True)
    )


def main() -> None:
    from bucket_to_bigquery_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    rounds = int(args[1]) if len(args) > 1 else 4
    spark = get_spark("b2bqs-ab-q54-r17")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_python_workers(spark)

    variants = {"old": _old, "minby": _minby, "join": _join}
    # warm (untimed): one pass each
    for b in variants.values():
        _execute(b(spark, sf_dir))
        _sweep_state(spark)

    rows: dict[str, list[dict]] = {k: [] for k in variants}
    for r in range(rounds):
        for label, b in variants.items():
            _sweep_state(spark)
            cpu0 = _tree_cpu_s()
            t0 = time.perf_counter()
            _execute(b(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            cpu = round(_tree_cpu_s() - cpu0, 2)
            rows[label].append({"wall_s": dt, "cpu_s": cpu})
            print(f"round {r} {label}: wall={dt} cpu={cpu} "
                  f"calib={_calibrate(spark)}", file=sys.stderr)
    out = {}
    for label, rs in rows.items():
        walls = sorted(x["wall_s"] for x in rs)
        cpus = sorted(x["cpu_s"] for x in rs)
        out[label] = {
            "wall_median": walls[len(walls) // 2], "wall_min": walls[0],
            "cpu_median": cpus[len(cpus) // 2], "cpu_min": cpus[0],
            "reps": rs,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
