"""Round-16 probe: does the IVF probed fraction FALL as N grows?

VERDICT r15 "Next round" #3: the √N operating point
(operators/similarity.ivf_operating_point — n_lists = √N capped 4096,
n_probe recall-calibrated) reads scan_frac 0.609 at the sf0.1 corpus
(N=2000, n_lists=45, n_probe=27) — recall-first calibration at toy
scale. The design claim is that the fraction shrinks as N grows (probe
width tracks the recall target, list count tracks √N); the r15 10×
probes covered wall time only. This probe records the (N, n_lists,
n_probe, candidates, scan_frac) trajectory itself:

- the three testdata SFs (N = 500 / 500 / 2000), and
- synthetic 10× / 100× expansions of the sf0.1 embeddings (N = 20,000 /
  200,000) in TWO growth shapes, both deterministic (integer hash of
  (vec_id, element, copy) — no RNG; copy 0 stays byte-identical so the
  query set vec_id < 10 is the real one):

  * ``near`` — per-element jitter ≤ ~5e-3 on unit-norm vectors: each
    original seeds a tight cluster of near-copies, the shape a
    dedup-bound corpus actually has. Here the probe calibration is
    expected to COLLAPSE (a query's true top-5 are its own near-copies,
    all in one list) — scan_frac falls steeply, but that is the easy
    case, not general evidence.
  * ``diffuse`` — jitter at the element-std scale (~±0.125 per element,
    cosine(copy, original) ≈ 0.87): growth spreads mass instead of
    stacking it, the adversarial-for-IVF shape. The trajectory to watch.

Usage::

    python tools/probe_ivf_scanfrac_r16.py [factor ...]

defaults to the committed trajectory (sf dirs + factors 10 and 100 on
sf0.1, both shapes). Prints one row per corpus and a JSON line; the
committed result table lives in BASELINE.md (round-16 measurements).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from bucket_to_bigquery_spark.operators.similarity import (  # noqa: E402
    ivf_scan_stats,
)
from bucket_to_bigquery_spark.queries.registry import tables  # noqa: E402
from bucket_to_bigquery_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def expanded(spark, sf_dir: str, factor: int, scale: float = 1e-4):
    """factor copies per vector, deterministic jitter, copy 0 exact.

    ``scale`` = 1e-4 → ``near`` shape (max per-element shift ~5e-3);
    2.6e-3 → ``diffuse`` shape (~±0.125, the element std of the
    unit-norm testdata embeddings)."""
    emb = tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    n0 = emb.count()
    copies = spark.range(factor).select(F.col("id").alias("c"))
    jitter = (
        # integer hash -> [-48, 48] * scale; element index i is 0-based
        lambda x, i: x + (
            (F.col("vec_id") * 31 + i * 7 + F.col("c") * 13) % 97 - 48
        ).cast("double") * F.lit(scale)
    )
    return emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("c") * F.lit(n0)).alias("vec_id"),
        F.when(F.col("c") == 0, F.col("embedding"))
        .otherwise(F.transform("embedding", jitter).cast("array<float>"))
        .alias("embedding"),
    )


def probe(spark, label: str, corpus) -> dict:
    t0 = time.perf_counter()
    st = ivf_scan_stats(corpus, corpus.where(F.col("vec_id") < 10), k=5)
    st = dict(st, label=label, wall_s=round(time.perf_counter() - t0, 1))
    print(
        f"{label:>14}  N={st['n_corpus']:>7}  n_lists={st['n_lists']:>4}  "
        f"n_probe={st['n_probe']:>4}  candidates={st['candidates']:>9}  "
        f"scan_frac={st['scan_frac']:.4f}  ({st['wall_s']}s)",
        flush=True,
    )
    return st


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [10, 100]
    spark = get_spark("b2bqs-probe-ivf-r16")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        rows.append(probe(spark, f"sf{sf}", tables(spark, sf_dir)["embeddings"]))
    for f in factors:
        for shape, scale in (("near", 1e-4), ("diffuse", 2.6e-3)):
            big = expanded(spark, SF01, f, scale).cache()
            big.count()  # materialize once; fit/assign passes reuse it
            rows.append(probe(spark, f"sf0.1 x{f} {shape}", big))
            big.unpersist()
    print(json.dumps({"probe": "ivf_scanfrac_r16", "rows": rows}))


if __name__ == "__main__":
    main()
