"""Online streaming mode: detections on a live feed + pause/resume control."""

import os
import time

import numpy as np
import pytest

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.online import OnlineSpinner


@pytest.mark.slow
def test_online_stream_with_control(tmp_path):
    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    poses.append((10.5, 0.8, 0.2))    # revisit pose 1
    poses.append((30.0, -1.0, -0.15))  # revisit pose 3

    hits = []
    ctrl = str(tmp_path / "status")
    sp = OnlineSpinner(cfg, capacity=16, on_loop=hits.append,
                       control_file=ctrl, drain_block=2)
    sp.start()
    for i, pose in enumerate(poses):
        pts = render_scan(world, pose, seed=500 + i)
        assert sp.feed(pts, i, 6.0 * i, timeout=120)
        if i == 4:   # exercise the control file round trip mid-stream
            open(ctrl, "w").write("pause")
            # generous deadline: the spinner may be inside a long first
            # compile before it polls the control file again
            deadline = time.time() + 240
            while not sp._paused.is_set() and time.time() < deadline:
                time.sleep(0.05)
            assert sp._paused.is_set()
            open(ctrl, "w").write("resume")
    sp.finish()

    assert sp.n_processed == len(poses)
    found = {d.q_seq: d for d in sp.detections
             if d.correlation >= cfg.correlation_thres}
    assert set(found) == {8, 9}, sp.detections
    assert found[8].cand_seq == 1
    assert found[9].cand_seq == 3
    assert hits  # callback fired

    # terminate() stops accepting scans
    sp2 = OnlineSpinner(cfg, capacity=4)
    sp2.terminate()
    assert not sp2.feed(np.zeros((10, 3), np.float32), 0, 0.0)


def test_reindex_dataset(tmp_path):
    """MulRan stationary-time reindexing: irregular wall-clock timestamps
    (a 60 s red-light stop) become uniform i/hz time; the rewritten files
    round-trip through the evaluator with order and paths preserved."""
    from synth import se3_from_xyt

    from contour_context_tpu.eval.evaluator import ContLCDEvaluator

    poses = [(5.0 * i, 0.0, 0.0) for i in range(6)]
    # wall-clock: a 60 s stop between scans 2 and 3
    tss = [0.0, 0.1, 0.2, 60.3, 60.4, 60.5]
    pl, ll = [], []
    for i, (p, ts) in enumerate(zip(poses, tss)):
        bp = str(tmp_path / ("%06d.bin" % i))
        np.zeros((8, 4), np.float32).tofile(bp)
        T = se3_from_xyt(p)
        pl.append("%.6f %s" % (ts, " ".join(
            "%.6f" % v for v in T[:3, :4].reshape(-1))))
        ll.append("%.6f %d %s" % (ts, i, bp))
    f_pose, f_laser = str(tmp_path / "p.txt"), str(tmp_path / "l.txt")
    open(f_pose, "w").write("\n".join(pl))
    open(f_laser, "w").write("\n".join(ll))

    ev = ContLCDEvaluator(f_pose, f_laser, 0.6)
    f_pose2, f_laser2 = str(tmp_path / "p2.txt"), str(tmp_path / "l2.txt")
    assert ev.save_reindexed_dataset(f_pose2, f_laser2, hz=10.0) == 6

    ev2 = ContLCDEvaluator(f_pose2, f_laser2, 0.6)
    assert len(ev2) == 6
    for i, info in enumerate(ev2.laser_info):
        assert info.ts == pytest.approx(i / 10.0)   # uniform, stop removed
        assert info.seq == i
        assert info.fpath.endswith("%06d.bin" % i)
        np.testing.assert_allclose(info.sens_pose[:3, :4],
                                   ev.laser_info[i].sens_pose[:3, :4],
                                   atol=1e-6)


def test_io_small_utils(tmp_path):
    from contour_context_tpu.utils.io import (
        format_mulran_as_kitti,
        raw_kitti_ts_to_seconds,
    )

    # format_mulran_as_kitti: copies listed bins into %06d.bin layout
    srcs = []
    for i in range(3):
        p = str(tmp_path / ("raw_%d.bin" % i))
        np.full(8, i, np.float32).tofile(p)
        srcs.append(p)
    lst = str(tmp_path / "used_bins.txt")
    open(lst, "w").write("\n".join(srcs) + "\n")
    outdir = str(tmp_path / "velodyne")
    assert format_mulran_as_kitti(lst, outdir) == 3
    got = np.fromfile(os.path.join(outdir, "000002.bin"), np.float32)
    np.testing.assert_array_equal(got, np.full(8, 2, np.float32))

    # raw_kitti_ts_to_seconds
    tsf = str(tmp_path / "timestamps.txt")
    open(tsf, "w").write("2011-09-30 12:10:57.392236000\n"
                         "2011-09-30 12:10:57.495450000\n")
    outf = str(tmp_path / "sec.txt")
    raw_kitti_ts_to_seconds(tsf, outf)
    vals = [float(x) for x in open(outf)]
    assert len(vals) == 2
    assert 0.05 < vals[1] - vals[0] < 0.2


def test_read_oxts_poses(tmp_path):
    """KITTI-raw OXTS reader (io_bin.h:28-148 parity): mercator projection,
    zyx Euler, first-frame rebase, imu->velo extrinsic composition."""
    import math

    from contour_context_tpu.utils.io import read_oxts_poses

    date, seq = "2011_01_01", "2011_01_01_drive_0001_sync"
    droot = tmp_path / date
    (droot / seq / "oxts" / "data").mkdir(parents=True)
    # identity imu->velo plus a translation, to exercise the composition
    (droot / "calib_imu_to_velo.txt").write_text(
        "R: 1 0 0 0 1 0 0 0 1\nT: 0.5 0 -0.2\n")
    lat0, lon0 = 48.98, 8.39
    frames = [(lat0, lon0, 110.0, 0.0, 0.0, 0.0),
              (lat0, lon0 + 1e-5, 110.5, 0.0, 0.0, math.pi / 2)]
    for i, f in enumerate(frames):
        # 30 columns in real OXTS; only the first 6 are read
        vals = list(f) + [0.0] * 24
        (droot / seq / "oxts" / "data" / ("%010d.txt" % i)).write_text(
            " ".join("%.9f" % v for v in vals))

    poses = read_oxts_poses(str(tmp_path), date, seq)
    assert len(poses) == 2
    # frame 0: R = I, trans rebased to zero => T_w_velod = inv(T_imu_velod)
    np.testing.assert_allclose(poses[0][:3, :3], np.eye(3), atol=1e-12)
    np.testing.assert_allclose(poses[0][:3, 3], [-0.5, 0.0, 0.2], atol=1e-12)
    # frame 1: yaw 90deg; mercator x advance = scale * dlon * pi * er / 180
    er, scale = 6378137.0, math.cos(lat0 * math.pi / 180.0)
    dx = scale * 1e-5 * math.pi * er / 180.0
    R1 = poses[1][:3, :3]
    np.testing.assert_allclose(
        R1, [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-9)
    # T_w_velod = T_w_imu @ inv(T_imu_velod): t = t_imu - R1 @ t_iv
    expect_t = np.array([dx, 0.0, 0.5]) - R1 @ np.array([0.5, 0.0, -0.2])
    np.testing.assert_allclose(poses[1][:3, 3], expect_t, atol=1e-9)


def test_finish_while_paused_does_not_deadlock():
    """finish() must return even when the spinner is paused with a full
    feed queue (end-of-stream overrides pause)."""
    import numpy as np

    from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
    from contour_context_tpu.online import OnlineSpinner

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=2048))
    sp = OnlineSpinner(cfg, capacity=8, queue_depth=2)
    sp.start()
    sp.pause()
    pts = np.zeros((100, 3), np.float32)
    n_fed = 0
    while sp.feed(pts, n_fed, float(n_fed), timeout=0.05):  # fill the queue
        n_fed += 1
    sp.finish()                                  # must not hang
    assert sp._thread is not None and not sp._thread.is_alive()
    # every fed scan is accounted for: processed before the pause landed, or
    # counted as dropped by the eos-while-paused exit (never silently lost)
    assert sp.n_processed + sp.dropped == n_fed
    assert sp.dropped > 0                        # the queue was full at exit


def test_spin_error_reraised_by_finish():
    """An exception on the spin thread surfaces in finish() instead of a
    silently truncated stream."""
    import pytest

    from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
    from contour_context_tpu.online import OnlineSpinner

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=2048))
    sp = OnlineSpinner(cfg, capacity=8)
    sp.start()
    sp.feed("not a point cloud", 0, 0.0)        # raises inside spin
    with pytest.raises(Exception):
        sp.finish()
    assert sp.error is not None
