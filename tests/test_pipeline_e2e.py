"""End-to-end loop closure on a synthetic trajectory with revisits.

Mirrors the reference's metric-driven integration strategy (SURVEY.md §4):
drive a sequence through the full pipeline, assert loop closures are found at
revisits and not elsewhere, and that the outcome file scores cleanly.
"""

import os

import numpy as np
import pytest

from synth import make_world, render_scan, se3_from_xyt

from contour_context_tpu.config import (
    ContourManagerConfig,
    ContourDBConfig,
    PipelineConfig,
)
from contour_context_tpu.db import ContourDB
from contour_context_tpu.utils.io import pad_points


def make_trajectory():
    """A loop: go out along a path, come back through the same poses."""
    poses = []
    # outbound: 12 poses moving along x
    for i in range(12):
        poses.append((10.0 * i, 0.0, 0.0))
    # a detour far away
    for i in range(4):
        poses.append((110.0, 15.0 * (i + 1), 0.5))
    # revisit pose #2 and #4 with small offsets
    poses.append((20.5, 1.0, 0.15))   # ~pose 2
    poses.append((40.0, -1.5, -0.1))  # ~pose 4
    return poses


@pytest.mark.slow
def test_e2e_loop_closure(tmp_path):
    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(7, n_structs=220, extent=160.0)
    poses = make_trajectory()

    from contour_context_tpu.ops.descriptor import build_descriptor

    db = ContourDB(cfg, capacity=32)
    results = []
    for i, pose in enumerate(poses):
        ts = float(i)  # 1 s per scan; window: pop at >25 s, searchable <15 s old
        pts = render_scan(world, pose, seed=100 + i)
        desc = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
        res = db.query_ranged_knn(desc)
        results.append(res)
        db.add_scan(desc, i, ts)
        db.push_and_balance(ts)

    # revisit scans are the last two (indices 16, 17) at ts 16, 17; scans older
    # than ts-15 are searchable: scans 0..1 at query 16, 0..2 at query 17.
    # pose16 ~ pose2 (not yet searchable at t=16: searchable are ts<1 -> scan 0)
    # --> adjust: with 1 s steps the window lets only very early scans in.
    # Check: no false positives on the outbound+detour part.
    for i in range(16):
        r = results[i]
        if r is not None:
            # any match there must be genuinely close (it cannot be: all poses
            # 0..15 are spatially distinct and the window blocks recent ones)
            assert r[1] < cfg.correlation_thres, (i, r)


@pytest.mark.slow
def test_q16_transport_pipeline(tmp_path):
    """The int16 wire format finds the same revisits through the file driver."""
    import sys

    sys.path.insert(0, "tests")
    import numpy as np

    from synth import make_world, render_scan, se3_from_xyt

    from contour_context_tpu.eval.evaluator import ContLCDEvaluator
    from contour_context_tpu.pipeline import LoopClosurePipeline

    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)] + [(10.5, 0.8, 0.2)]
    pl, ll = [], []
    for i, p in enumerate(poses):
        pts = render_scan(world, p, seed=500 + i)
        arr = np.zeros((len(pts), 4), np.float32)
        arr[:, :3] = pts
        bp = str(tmp_path / ("%06d.bin" % i))
        arr.tofile(bp)
        T = se3_from_xyt(p)
        pl.append("%.6f %s" % (6.0 * i, " ".join(
            "%.6f" % v for v in T[:3, :4].reshape(-1))))
        ll.append("%.6f %d %s" % (6.0 * i, i, bp))
    f_pose = str(tmp_path / "p.txt")
    f_laser = str(tmp_path / "l.txt")
    open(f_pose, "w").write("\n".join(pl))
    open(f_laser, "w").write("\n".join(ll))

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    ev = ContLCDEvaluator(f_pose, f_laser, cfg.correlation_thres)
    pipe = LoopClosurePipeline(cfg, ev, capacity=16, q16_transport=True)
    pipe.run()
    found = {r.q_seq: r for r in pipe.results
             if r.correlation >= cfg.correlation_thres}
    assert 8 in found and found[8].cand_seq == 1, pipe.results


@pytest.mark.slow
def test_fused_step_pipeline(tmp_path):
    """fused_step mode (ONE dispatch/scan) finds the same revisit through the
    file driver, including with the int16 wire format."""
    import sys

    sys.path.insert(0, "tests")

    from contour_context_tpu.eval.evaluator import ContLCDEvaluator
    from contour_context_tpu.pipeline import LoopClosurePipeline

    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)] + [(10.5, 0.8, 0.2)]
    pl, ll = [], []
    for i, p in enumerate(poses):
        pts = render_scan(world, p, seed=500 + i)
        arr = np.zeros((len(pts), 4), np.float32)
        arr[:, :3] = pts
        bp = str(tmp_path / ("%06d.bin" % i))
        arr.tofile(bp)
        T = se3_from_xyt(p)
        pl.append("%.6f %s" % (6.0 * i, " ".join(
            "%.6f" % v for v in T[:3, :4].reshape(-1))))
        ll.append("%.6f %d %s" % (6.0 * i, i, bp))
    f_pose = str(tmp_path / "p.txt")
    f_laser = str(tmp_path / "l.txt")
    open(f_pose, "w").write("\n".join(pl))
    open(f_laser, "w").write("\n".join(ll))

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    for q16 in (False, True):
        ev = ContLCDEvaluator(f_pose, f_laser, cfg.correlation_thres)
        pipe = LoopClosurePipeline(cfg, ev, capacity=16, fused_step=True,
                                   q16_transport=q16)
        pipe.run()
        found = {r.q_seq: r for r in pipe.results
                 if r.correlation >= cfg.correlation_thres}
        assert 8 in found and found[8].cand_seq == 1, (q16, pipe.results)
        assert all(q == 8 for q in found), (q16, found)


@pytest.mark.slow
def test_e2e_revisit_found(tmp_path):
    """Spread timestamps so revisits are searchable, assert the loop is found."""
    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)

    from contour_context_tpu.ops.descriptor import build_descriptor

    db = ContourDB(cfg, capacity=16)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    # revisit pose 1 and pose 3
    poses.append((10.5, 0.8, 0.2))
    poses.append((30.0, -1.0, -0.15))
    truth = {8: 1, 9: 3}

    found = {}
    for i, pose in enumerate(poses):
        ts = 6.0 * i  # 6 s per scan: at query 8 (t=48), scans with ts<33 seen
        pts = render_scan(world, pose, seed=500 + i)
        desc = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
        res = db.query_ranged_knn(desc)
        if res is not None and res[1] >= cfg.correlation_thres:
            found[i] = (db.seq_of_gidx[res[0]], res[1], res[2])
        db.add_scan(desc, i, ts)
        db.push_and_balance(ts)

    for q, want in truth.items():
        assert q in found, (q, found)
        got_seq, corr, T3 = found[q]
        assert got_seq == want, (q, found[q])
        # pose estimate sanity: translate BEV delta to sensor frame and compare
        from contour_context_tpu.utils.se2 import eval_metric_est, se2_mat
        T_err = eval_metric_est(
            se2_mat(T3[0], T3[1], T3[2]),
            se3_from_xyt(poses[want]), se3_from_xyt(poses[q]),
            cfg.cm.n_row, cfg.cm.n_col, cfg.cm.reso_row)
        terr = np.hypot(T_err[0, 2], T_err[1, 2])
        rerr = abs(np.arctan2(T_err[1, 0], T_err[0, 0]))
        assert terr < 1.0, (q, terr)
        assert rerr < 0.1, (q, rerr)
    # no false positives
    for q in found:
        assert q in truth, (q, found[q])
