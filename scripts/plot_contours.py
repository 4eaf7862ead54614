#!/usr/bin/env python
"""Draw contour-ellipse overlays from a 20-column dump (reference
scripts/plot_contours.py equivalent; reads both our dumps and the C++ ones).

Usage: python scripts/plot_contours.py contours-000123.txt [out.png]
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import Ellipse

sys.path.insert(0, ".")
from contour_context_tpu.utils.dumps import load_contours  # noqa: E402

LEVEL_COLORS = ["#4477aa", "#66ccee", "#228833", "#ccbb44", "#ee6677",
                "#aa3377", "#bbbbbb"]


def plot_contours(rows: np.ndarray, ax, min_cell: int = 5):
    for r in rows:
        lev, cell_cnt = int(r[0]), int(r[1])
        if cell_cnt < min_cell:
            continue
        mean = r[2:4]
        eig = r[8:10]
        # major eigvec column (col 1 of V, stored column-major at 12:14)
        vx, vy = r[12], r[13]
        ang = np.degrees(np.arctan2(vy, vx))
        e = Ellipse(xy=(mean[1], mean[0]),
                    width=3 * np.sqrt(max(eig[1], 1e-6)),
                    height=3 * np.sqrt(max(eig[0], 1e-6)),
                    angle=90 - ang, fill=False,
                    color=LEVEL_COLORS[lev % len(LEVEL_COLORS)], lw=0.8)
        ax.add_patch(e)
        ax.plot(mean[1], mean[0], ".",
                color=LEVEL_COLORS[lev % len(LEVEL_COLORS)], ms=2)


def main():
    fpath = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else fpath.rsplit(".", 1)[0] + ".png"
    rows = load_contours(fpath)
    fig, ax = plt.subplots(figsize=(8, 8))
    plot_contours(rows, ax)
    ax.set_xlim(0, 150)
    ax.set_ylim(150, 0)
    ax.set_aspect("equal")
    ax.set_title(fpath)
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
