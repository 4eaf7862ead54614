#!/usr/bin/env python
"""1-D Gaussian-mixture view of the bearing-consensus angles (reference
scripts/plot_gmm.py equivalent): reads one angle (rad) per line and plots the
smoothed density plus the pi/16 consensus window around its mode.

Usage: python scripts/plot_gmm.py angles.txt [out.png]
"""

import math
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ANG_RANGE = math.pi / 16   # the consensus window (contour_mng.h:340-358)


def main():
    angs = np.loadtxt(sys.argv[1]).reshape(-1)
    out = sys.argv[2] if len(sys.argv) > 2 else "gmm_bearing.png"
    xs = np.linspace(-math.pi, math.pi, 2048)
    sigma = 0.05
    dens = np.zeros_like(xs)
    for a in angs:
        d = np.angle(np.exp(1j * (xs - a)))
        dens += np.exp(-0.5 * (d / sigma) ** 2)
    mode = xs[int(np.argmax(dens))]
    fig, ax = plt.subplots(figsize=(9, 4))
    ax.plot(xs, dens, lw=1.2)
    ax.axvspan(mode, mode + ANG_RANGE, alpha=0.25, color="#ee6677",
               label="consensus window (pi/16)")
    ax.plot(angs, np.zeros_like(angs), "|", ms=16, color="#228833",
            label="pair bearing deltas")
    ax.set_xlabel("bearing difference (rad)")
    ax.legend()
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
