"""Contour dump round-trip, BEV image writer, and the plotting scripts."""

import os
import subprocess
import sys

import numpy as np

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, GMMOptConfig
from contour_context_tpu.ops.descriptor import build_descriptor, rasterize_bev
from contour_context_tpu.utils.dumps import (
    load_contours,
    save_bev_image,
    save_contours,
)
from contour_context_tpu.utils.io import pad_points

CFG = ContourManagerConfig(max_points=16384)


def _desc(seed=1, pose=(0.0, 0.0, 0.0)):
    import jax

    world = make_world(0)
    pts = render_scan(world, pose, seed=seed)
    d = build_descriptor(pad_points(pts, CFG.max_points), CFG, GMMOptConfig())
    return jax.device_get(d), pts


def test_contour_dump_roundtrip(tmp_path):
    desc, _ = _desc()
    fp = str(tmp_path / "contours-000000.txt")
    save_contours(fp, desc, CFG)
    rows = load_contours(fp)
    n_valid = int(np.asarray(desc.valid).sum())
    assert rows.shape == (n_valid, 20)
    # rows appear level-major in contour order; spot-check the first
    lev = int(rows[0, 0])
    np.testing.assert_allclose(rows[0, 2:4], np.asarray(desc.mean)[lev, 0],
                               rtol=1e-5)
    assert int(rows[0, 1]) == int(np.asarray(desc.cnt)[lev, 0])
    # eccen in [0, 1); flags are 0/1
    assert ((rows[:, 14] >= 0) & (rows[:, 14] < 1)).all()
    assert set(np.unique(rows[:, 18])) <= {0.0, 1.0}
    assert set(np.unique(rows[:, 19])) <= {0.0, 1.0}


def test_reference_dump_parses():
    """Our parser reads the C++ writer's format (same DATA markers/columns)."""
    ref = "/root/reference/results"  # no bundled contour dump; synthesize one
    txt = "\nDATA_START\n" + "\t".join(["1", "42"] + ["0.5"] * 16 + ["1", "0"]) \
        + "\t\nDATA_END\n"
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(txt)
        name = f.name
    rows = load_contours(name)
    assert rows.shape == (1, 20)
    assert rows[0, 0] == 1 and rows[0, 1] == 42 and rows[0, 18] == 1
    os.unlink(name)


def test_bev_image_and_plot_scripts(tmp_path):
    desc, pts = _desc()
    bev, _, _ = rasterize_bev(pad_points(pts, CFG.max_points), CFG)
    img = str(tmp_path / "bev.png")
    save_bev_image(img, np.asarray(bev).reshape(CFG.n_row, CFG.n_col))
    assert os.path.exists(img) or os.path.exists(str(tmp_path / "bev.pgm"))

    fa = str(tmp_path / "a.txt")
    fb = str(tmp_path / "b.txt")
    save_contours(fa, desc, CFG)
    desc_b, _ = _desc(seed=2, pose=(2.0, 1.0, 0.1))
    save_contours(fb, desc_b, CFG)

    try:
        import matplotlib  # noqa: F401
    except ImportError:
        return  # plotting scripts need matplotlib; dump round-trip covered
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r1 = subprocess.run([sys.executable, "scripts/plot_contours.py", fa,
                         str(tmp_path / "a.png")], cwd=root, env=env,
                        capture_output=True, text=True, timeout=120)
    assert r1.returncode == 0, r1.stderr
    assert os.path.exists(str(tmp_path / "a.png"))
    r2 = subprocess.run([sys.executable, "scripts/cmp_2contours.py", fa, fb,
                         str(tmp_path / "ab.png")], cwd=root, env=env,
                        capture_output=True, text=True, timeout=120)
    assert r2.returncode == 0, r2.stderr
    angs = str(tmp_path / "angs.txt")
    np.savetxt(angs, np.random.default_rng(0).uniform(-3, 3, 40))
    r3 = subprocess.run([sys.executable, "scripts/plot_gmm.py", angs,
                         str(tmp_path / "g.png")], cwd=root, env=env,
                        capture_output=True, text=True, timeout=120)
    assert r3.returncode == 0, r3.stderr

    # loop visualization (spinner_ros analog) over a tiny synthetic outcome
    fp_pose = str(tmp_path / "pose.txt")
    rows = []
    for i in range(5):
        T = np.eye(4)
        T[0, 3] = 10.0 * i
        rows.append("%.6f %s" % (6.0 * i, " ".join(
            "%.6f" % v for v in T[:3, :4].reshape(-1))))
    open(fp_pose, "w").write("\n".join(rows))
    fp_out = str(tmp_path / "outcome.txt")
    open(fp_out, "w").write(
        "2\t0-x\t0\t0\t0\t0\ta\tx\n"
        "0\t3-0\t0.9\t0.1\t0.1\t0.01\ta\tb\n"
        "1\t4-1\t0.8\t0.2\t0.2\t0.02\ta\tb\n")
    r4 = subprocess.run([sys.executable, "scripts/plot_loops.py", fp_pose,
                         fp_out, str(tmp_path / "loops.png")], cwd=root,
                        env=env, capture_output=True, text=True, timeout=120)
    assert r4.returncode == 0, r4.stderr
    assert os.path.exists(str(tmp_path / "loops.png"))
