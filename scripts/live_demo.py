#!/usr/bin/env python
"""Online streaming demo with the live loop view — the bag_play_test + rviz
session (bag_play_test.cpp:188-344, spinner_ros.h:147-196) without ROS.

Streams a synthetic out-and-back trajectory through OnlineSpinner (fused
one-dispatch-per-scan path) while LiveLoopView redraws the trajectory and
green/red loop connections; headless backends get a continuously-rewritten
PNG instead of a window.

Usage: python scripts/live_demo.py [out.png] [--scans N] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="live.png")
    ap.add_argument("--scans", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from synth import make_world, render_scan

    from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
    from contour_context_tpu.liveview import LiveLoopView
    from contour_context_tpu.online import OnlineSpinner

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=32768))
    world = make_world(2, n_structs=260, extent=180.0)
    n = args.scans
    half = n // 2
    poses = [(5.0 * i, 0.4 * (i % 5), 0.05 * (i % 3)) for i in range(half)]
    poses += [(5.0 * (2 * half - 2 - i), 0.6, 0.1) for i in range(half, n)]
    gt_xy = np.array([[p[0], p[1]] for p in poses])

    view = LiveLoopView(args.out, gt_xy=gt_xy, every=1)
    sp = OnlineSpinner(cfg, capacity=n + 4, on_loop=view.add_loop,
                       drain_block=8)
    sp.start()
    for i, p in enumerate(poses):
        pts = render_scan(world, p, seed=1000 + i)
        view.add_pose(i, p[0], p[1])
        sp.feed(pts, i, 6.0 * i)        # 6 s/scan: revisits clear the window
        view.maybe_render()             # render on the feeder thread
    sp.finish()
    view.render(final=True)
    print("processed %d scans, %d loops (TP %d / FP %d) -> %s"
          % (sp.n_processed, len(sp.detections), view.n_tp, view.n_fp,
             args.out))


if __name__ == "__main__":
    main()
