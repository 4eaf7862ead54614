"""Benchmark: per-scan end-to-end loop-closure latency on one TPU chip.

Measures the full per-scan pipeline (descriptor build + queryRangedKNN against
a populated database + DB append) in steady state on synthetic scans, and
compares with the reference's single-thread C++ baseline on KITTI 08
(10.8-11.2 ms/scan end-to-end, log/timing_cont2_paper.txt — see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_MS = 11.0  # reference end-to-end per-scan, KITTI 08


def synth_scan(rng, pose, world):
    sys.path.insert(0, "tests")
    from synth import render_scan
    return render_scan(world, pose, seed=int(rng.integers(1 << 30)))


def main():
    sys.path.insert(0, "tests")
    from synth import make_world

    import jax

    from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
    from contour_context_tpu.db import ContourDB
    from contour_context_tpu.ops.descriptor import build_descriptor
    from contour_context_tpu.utils.io import pad_points

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=131072))
    rng = np.random.default_rng(0)
    world = make_world(1, n_structs=300, extent=400.0)

    n_fill = 120     # scans pre-inserted into the DB
    n_meas = 40      # measured steady-state scans

    db = ContourDB(cfg, capacity=n_fill + n_meas + 8)
    poses = [(4.0 * i, 0.5 * (i % 7), 0.05 * (i % 11)) for i in range(n_fill + n_meas)]
    clouds = [pad_points(synth_scan(rng, p, world), cfg.cm.max_points)
              for p in poses]

    # warm up + fill
    for i in range(n_fill):
        desc = build_descriptor(clouds[i], cfg.cm, cfg.gmm)
        if i >= 3:  # let a few queries run to compile the query path
            db.query_ranged_knn(desc)
        db.add_scan(desc, i, float(i))
        db.push_and_balance(float(i))
    jax.block_until_ready(db.store)

    # measure
    t0 = time.perf_counter()
    for j in range(n_meas):
        i = n_fill + j
        desc = build_descriptor(clouds[i], cfg.cm, cfg.gmm)
        db.query_ranged_knn(desc)
        db.add_scan(desc, i, float(i))
        db.push_and_balance(float(i))
    jax.block_until_ready(db.store)
    dt_ms = (time.perf_counter() - t0) / n_meas * 1e3

    print(json.dumps({
        "metric": "per-scan end-to-end loop-closure latency (synthetic, 120-scan DB)",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / dt_ms, 3),
    }))


if __name__ == "__main__":
    main()
