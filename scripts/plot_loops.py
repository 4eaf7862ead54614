#!/usr/bin/env python
"""Trajectory + loop-closure visualization from an outcome file (the rviz
view of BaseROSSpinner, spinner_ros.h:147-196, as a static plot): the gt path
with green TP / red FP loop connection lines.

Usage: python scripts/plot_loops.py ts-sens_pose.txt outcome.txt [out.png]
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, ".")
from contour_context_tpu.eval.pr_mpe import (  # noqa: E402
    load_gt_sens_poses,
    parse_outcome_file,
)


def main():
    fp_pose, fp_outcome = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "loops.png"
    gt = load_gt_sens_poses(fp_pose)
    pts = gt[:, [3, 7, 11]]
    lines = parse_outcome_file(fp_outcome)

    fig, ax = plt.subplots(figsize=(9, 9))
    ax.plot(pts[:, 0], pts[:, 1], "-", color="#bbbbbb", lw=0.8, label="gt path")
    n_tp = n_fp = 0
    for ln in lines:
        if ln.idx_best < 0:
            continue
        a, b = pts[ln.idx_curr], pts[ln.idx_best]
        if ln.tfpn == 0:
            ax.plot([a[0], b[0]], [a[1], b[1]], "-", color="#228833", lw=1.0)
            n_tp += 1
        elif ln.tfpn == 1:
            ax.plot([a[0], b[0]], [a[1], b[1]], "-", color="#ee6677", lw=1.2)
            n_fp += 1
    ax.set_aspect("equal")
    ax.set_title("%s: %d TP (green), %d FP (red)" % (fp_outcome, n_tp, n_fp))
    ax.legend()
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
