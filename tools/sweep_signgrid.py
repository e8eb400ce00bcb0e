"""Reproduce the sign-grid ANN operating-point sweep (round 6).

Measures recall@5 vs brute force and candidate fraction (of all
query-corpus pairs) for a set of (bands, bits, probe-radius) configs on
the real testdata embeddings — pure numpy + DuckDB, no Spark session, so
it runs in seconds and is the designed feedback loop for picking
``signgrid_ann_topk`` defaults (operators/similarity.py documents the
resulting frontier).

Usage::

    python tools/sweep_signgrid.py [sf_dir ...]

defaults to all three testdata SFs. Ground truth matches q48's contract:
top-5 by exact cosine, self excluded, ties broken by ascending vec_id.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

DEFAULT_SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

# (bands, bits, probe_hamming) — the r6 frontier + its neighborhood.
CONFIGS = [
    (10, 6, 0),   # pre-r6 default: 0.40-class recall at ~14% candidates
    (11, 5, 0),   # r6 DEFAULT: >=0.6 recall at <=30% candidates, all SFs
    (12, 5, 0),
    (8, 8, 1),
    (7, 7, 1),
    (9, 7, 1),    # multi-probe sweet spot: ~0.8 recall at ~44%
    (13, 4, 0),
    (16, 4, 0),   # high-recall exact point the probe configs dominate
    # r16 corners (VERDICT r15 #4 — what does recall >= 0.95 COST?):
    # the cheapest >=0.95 points scan ~0.65-0.69 of all pairs — barely
    # sub-brute-force, so q48e PINS 0.84 as its declared floor instead
    # of buying recall with candidates (the q48c/d IVF members own the
    # high-recall role at real sub-linear cost).
    (9, 6, 1),    # 0.92@0.64 / 0.96@0.65 (sf0.01 / sf0.1)
    (10, 6, 1),   # 0.94@0.68 / 0.96@0.69
    (11, 5, 1),   # 1.00@0.90 / 1.00@0.90
]


def load(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    con = duckdb.connect()
    rel = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchnumpy()
    return np.array(rel["embedding"].tolist()), np.asarray(rel["vec_id"])


def evaluate(
    x: np.ndarray, ids: np.ndarray, bands: int, bits: int, probe: int
) -> tuple[float, float] | None:
    n, dim = x.shape
    if bands * bits > dim:
        return None
    qmask = ids < 10
    qx, qids = x[qmask], ids[qmask]
    norms = np.linalg.norm(x, axis=1)
    cos = (qx @ x.T) / (np.linalg.norm(qx, axis=1)[:, None] * norms[None, :])
    weights = 1 << np.arange(bits)
    signs = x > 0
    codes = np.stack(
        [signs[:, j * bits:(j + 1) * bits] @ weights for j in range(bands)],
        axis=1,
    )  # (n, bands)
    qcodes = codes[qmask]
    popcnt = np.vectorize(lambda v: bin(int(v)).count("1"))
    hits = cand = 0
    for qi, qid in enumerate(qids):
        order = sorted(range(n), key=lambda j: (-cos[qi, j], ids[j]))
        truth = {ids[j] for j in [jj for jj in order if ids[jj] != qid][:5]}
        xor = codes ^ qcodes[qi][None, :]
        if probe == 0:
            match = (xor == 0).any(axis=1)
        else:
            match = (popcnt(xor) <= probe).any(axis=1)
        match[ids == qid] = False
        hits += len(truth & set(ids[match]))
        cand += int(match.sum())
    n_q = len(qids)
    return hits / (5 * n_q), cand / (n_q * (n - 1))


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SF_DIRS
    data = {d: load(d) for d in sf_dirs}
    header = "config            " + "  ".join(
        d.rstrip("/").rsplit("/", 1)[-1].ljust(11) for d in sf_dirs
    )
    print(header)
    print("-" * len(header))
    for bands, bits, probe in CONFIGS:
        cells = []
        for d in sf_dirs:
            res = evaluate(*data[d], bands, bits, probe)
            cells.append(
                f"{res[0]:.2f}@{res[1]:.2f}".ljust(11) if res else "n/a".ljust(11)
            )
        tag = f"{bands:2d}x{bits} r={probe}" + (" *" if (bands, bits, probe) == (11, 5, 0) else "  ")
        print(f"{tag:18s}" + "  ".join(cells))
    print("\n* = shipped default (recall@candidate-fraction; recall@5 vs brute force)")


if __name__ == "__main__":
    main()
