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
  200,000): copy c gets vec_id += c·N₀ and a deterministic per-element
  jitter of ≤ ~5e-3 (integer hash of (vec_id, element, copy) — no RNG,
  reproducible), copy 0 stays byte-identical so the query set
  (vec_id < 10) is the real one. Each original therefore seeds a tight
  local cluster of 10/100 near-copies — adversarially CLUSTERED growth,
  not uniform dilution, so a falling fraction here is conservative
  evidence.

Usage::

    python tools/probe_ivf_scanfrac_r16.py [factor ...]

defaults to the committed trajectory (sf dirs + factors 10 and 100 on
sf0.1). Prints one row per corpus and a JSON line; the committed result
table lives in BASELINE.md (round-16 measurements).
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


def expanded(spark, sf_dir: str, factor: int):
    """factor near-copies per vector, deterministic jitter, copy 0 exact."""
    emb = tables(spark, sf_dir)["embeddings"].select("vec_id", "embedding")
    n0 = emb.count()
    copies = spark.range(factor).select(F.col("id").alias("c"))
    jitter = (
        # integer hash -> [-48, 48] * 1e-4; element index i is 0-based
        lambda x, i: x + (
            (F.col("vec_id") * 31 + i * 7 + F.col("c") * 13) % 97 - 48
        ).cast("double") * F.lit(1e-4)
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
        big = expanded(spark, SF01, f).cache()
        big.count()  # materialize once so the fit/assign passes reuse it
        rows.append(probe(spark, f"sf0.1 x{f}", big))
        big.unpersist()
    print(json.dumps({"probe": "ivf_scanfrac_r16", "rows": rows}))


if __name__ == "__main__":
    main()
