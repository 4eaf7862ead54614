"""End-to-end recognition-quality regression: a fixed loopy sequence must
keep max-F1 high with zero false positives at the reference threshold.

This is the CI-sized version of scripts/synth_benchmark.py: any change that
degrades descriptor, cascade, merge or GMM quality shows up here as recall or
precision loss long before a full dataset run would reveal it.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from synth import make_world, render_scan, se3_from_xyt  # noqa: E402

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.eval.evaluator import ContLCDEvaluator
from contour_context_tpu.eval.pr_mpe import score_outcome
from contour_context_tpu.pipeline import LoopClosurePipeline


def square_lap():
    """20-pose square circuit (8 m steps) used by the quality tests."""
    lap = []
    for k in range(20):
        side, k4 = divmod(k, 5)
        if side == 0:
            lap.append((8.0 * k4, 0.0, 0.0))
        elif side == 1:
            lap.append((40.0, 8.0 * k4, 1.5708))
        elif side == 2:
            lap.append((40.0 - 8.0 * k4, 40.0, 3.1416))
        else:
            lap.append((0.0, 40.0 - 8.0 * k4, -1.5708))
    return lap


@pytest.mark.slow
def test_reverse_direction_loop_closure():
    """Rotation invariance end-to-end: lap 2 retraces the circuit in the
    OPPOSITE direction (heading flipped by pi), so every revisit differs by
    ~180 deg yaw. The constellation/BCI design is rotation-invariant by
    construction (reference contour_mng.h:288-388 encodes only relative
    distances/bearings); this pins that property through the whole pipeline:
    high recall on the window-eligible reverse revisits, zero FPs, and the
    recovered SE(2) includes the pi yaw."""
    from contour_context_tpu.db import ContourDB
    from contour_context_tpu.utils.io import pad_points
    from contour_context_tpu.utils.se2 import eval_metric_est, se2_mat

    rng = np.random.default_rng(3)
    world = make_world(3, n_structs=240, extent=140.0)
    lap = square_lap()
    poses = list(lap)
    poses += [(x + rng.uniform(-0.4, 0.4), y + rng.uniform(-0.4, 0.4),
               th + np.pi + rng.uniform(-0.05, 0.05))
              for x, y, th in reversed(lap)]

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    db = ContourDB(cfg, capacity=len(poses) + 4)
    found = {}
    for i, p in enumerate(poses):
        ts = 2.0 * i   # query i sees scans j <= i-8 (>=15 s window)
        pts = render_scan(world, p, seed=900 + i)
        h = db.step_async(pad_points(pts, cfg.cm.max_points), i, ts)
        r = h.get()
        if r is not None and r[1] >= cfg.correlation_thres:
            found[i] = (db.seq_of_gidx[r[0]], r[1], r[2])

    # lap-2 scan q's counterpart is lap-1 pose 39-q; searchable once 39-q <=
    # q-8, i.e. q >= 24 -> 16 window-eligible reverse revisits
    tp = fp = 0
    for q, (c, corr, T3) in found.items():
        pq, pc = poses[q], poses[c]
        if (np.hypot(pq[0] - pc[0], pq[1] - pc[1]) < 5.0
                and q >= 20 and c < 20):
            tp += 1
            Te = eval_metric_est(se2_mat(*T3), se3_from_xyt(pc),
                                 se3_from_xyt(pq), cfg.cm.n_row, cfg.cm.n_col,
                                 cfg.cm.reso_row)
            assert np.hypot(Te[0, 2], Te[1, 2]) < 0.3, (q, c, Te)
            assert abs(np.arctan2(Te[1, 0], Te[0, 0])) < np.deg2rad(0.5), (q, c)
        else:
            fp += 1
    assert fp == 0, found
    assert tp >= 11, (tp, found)   # 14/16 measured; margin for jitter


@pytest.mark.slow
def test_end_to_end_recognition_quality(tmp_path):
    rng = np.random.default_rng(3)
    world = make_world(3, n_structs=240, extent=140.0)
    # two laps of a 20-pose square circuit (8 m steps)
    lap = square_lap()
    poses = list(lap)
    poses += [(x + rng.uniform(-0.4, 0.4), y + rng.uniform(-0.4, 0.4),
               th + rng.uniform(-0.05, 0.05)) for x, y, th in lap]

    # 2 s per scan -> the lap-2 revisit is 40 s older than its query, safely
    # past the 15-25 s insertion-delay staircase (TreeBucket semantics: a
    # candidate between 15 and 25 s old may legitimately not be searchable
    # yet — reference contour_db.h:102-143, replicated exactly)
    pl, ll = [], []
    for i, p in enumerate(poses):
        pts = render_scan(world, p, seed=900 + i)
        arr = np.zeros((len(pts), 4), np.float32)
        arr[:, :3] = pts
        bp = str(tmp_path / ("%06d.bin" % i))
        arr.tofile(bp)
        T = se3_from_xyt(p)
        pl.append("%.6f %s" % (2.0 * i, " ".join(
            "%.6f" % v for v in T[:3, :4].reshape(-1))))
        ll.append("%.6f %d %s" % (2.0 * i, i, bp))
    f_pose = str(tmp_path / "pose.txt")
    f_laser = str(tmp_path / "laser.txt")
    open(f_pose, "w").write("\n".join(pl))
    open(f_laser, "w").write("\n".join(ll))

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    ev = ContLCDEvaluator(f_pose, f_laser, cfg.correlation_thres)
    pipe = LoopClosurePipeline(cfg, ev, capacity=len(poses) + 4)
    pipe.run_blocked(block=8)
    f_out = str(tmp_path / "outcome.txt")
    pipe.save_outcome(f_out)

    tp = sum(1 for r in pipe.results if r.tfpn == 0)
    fp = sum(1 for r in pipe.results if r.tfpn == 1)
    fn = sum(1 for r in pipe.results if r.tfpn == 3)
    # lap 2 revisits lap 1 (40 s gap): near-total recall, zero FPs at the
    # reference operating threshold
    assert fp == 0, (tp, fp, fn)
    assert tp >= 15, (tp, fp, fn)
    assert fn <= 5, (tp, fp, fn)

    res = score_outcome(f_pose, f_out, excl_frames=8)   # 15 s at 2 s/frame
    assert res.max_f1 >= 0.9, res
    assert res.trans_mean < 0.3 and res.rot_mean_deg < 0.5, res
