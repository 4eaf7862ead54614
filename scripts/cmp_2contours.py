#!/usr/bin/env python
"""Overlay the contour ellipses of two scans for visual pairwise comparison
(reference scripts/cmp_2contours.py equivalent).

Usage: python scripts/cmp_2contours.py dumpA.txt dumpB.txt [out.png]
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

sys.path.insert(0, ".")
from contour_context_tpu.utils.dumps import load_contours  # noqa: E402
from plot_contours import plot_contours  # noqa: E402


def main():
    fa, fb = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "cmp_contours.png"
    fig, axs = plt.subplots(1, 2, figsize=(16, 8))
    for ax, fp in zip(axs, (fa, fb)):
        plot_contours(load_contours(fp), ax)
        ax.set_xlim(0, 150)
        ax.set_ylim(150, 0)
        ax.set_aspect("equal")
        ax.set_title(fp)
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
