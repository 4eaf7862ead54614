"""Live loop view (the rviz connection-line analog, spinner_ros.h:147-196)."""

import os
import threading

import matplotlib
import numpy as np

matplotlib.use("Agg")

from contour_context_tpu.liveview import LiveLoopView
from contour_context_tpu.online import LoopDetection


def test_incremental_render_and_colors(tmp_path):
    out = str(tmp_path / "live.png")
    gt = np.array([[0.0, 0.0], [10.0, 0.0], [0.5, 0.2], [50.0, 50.0]])
    view = LiveLoopView(out, gt_xy=gt, gt_radius=5.0, every=1)
    for seq, (x, y) in enumerate(gt):
        view.add_pose(seq, x, y)
    # TP: seq 2 vs 0 are 0.54 m apart; FP: seq 3 vs 1 are far
    view.add_loop(LoopDetection(2, 0, 0.9, np.zeros(3)))
    assert view.maybe_render()
    view.add_loop(LoopDetection(3, 1, 0.7, np.zeros(3)))
    view.render(final=True)
    assert view.n_tp == 1 and view.n_fp == 1
    assert os.path.getsize(out) > 0


def test_every_cadence_batches_renders(tmp_path):
    view = LiveLoopView(str(tmp_path / "v.png"), every=3)
    for seq in range(6):
        view.add_pose(seq, float(seq), 0.0)
    view.add_loop((3, 0))
    view.add_loop((4, 1))
    assert not view.maybe_render()          # below cadence: no redraw yet
    view.add_loop((5, 2, 0.8))
    assert view.maybe_render()              # third loop triggers
    assert view.n_tp == 3                   # no gt -> all green
    view.close()


def test_threaded_feed_then_render(tmp_path):
    """add_pose/add_loop from worker threads (the spinner wiring) while the
    owning thread renders — no matplotlib calls off-thread, no lost events."""
    view = LiveLoopView(str(tmp_path / "t.png"), every=1000)

    def feed(base):
        for i in range(50):
            view.add_pose(base + i, float(base + i), 1.0)
            if i % 5 == 0 and i >= 20:
                view.add_loop((base + i, base + i - 20))

    ts = [threading.Thread(target=feed, args=(b,)) for b in (0, 100)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    view.render(final=True)
    assert view._drawn_poses == 100
    assert not view._pending_loops          # all endpoints arrived
    assert view.n_tp + view.n_fp == view._taken_loops > 0
    view.close()


def test_loop_before_pose_is_retried(tmp_path):
    """A detection draining before its endpoint pose is fed must not be
    dropped: it stays pending and draws at a later render (the feed and
    drain threads have no ordering guarantee between add_pose/add_loop)."""
    view = LiveLoopView(str(tmp_path / "v.png"), every=1)
    view.add_pose(0, 0.0, 0.0)
    view.add_loop((5, 0, 0.9))              # q_seq 5 pose not fed yet
    view.render()
    assert view.n_tp == 0                   # pending, not counted or dropped
    view.add_pose(5, 1.0, 1.0)
    view.render(final=True)
    assert view.n_tp == 1                   # retried and drawn
    view.close()
