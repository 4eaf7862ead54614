"""Sweep harness: cfg parsing (vs the reference's bundled file), grid
generation, and the resumable per-runid driver."""

import os

import numpy as np
import pytest

from contour_context_tpu.config import (
    ContourManagerConfig,
    PipelineConfig,
)
from contour_context_tpu.eval.sweep import (
    gen_thres_dirs,
    gen_thres_dirs_manual,
    load_check_thres,
    run_sweep_id,
)

REF_CFG = "/root/reference/config/score_thres_kitti_bag_play.cfg"


def test_load_check_thres_reference_file():
    if not os.path.exists(REF_CFG):
        pytest.skip("reference not mounted")
    lb, ub = load_check_thres(REF_CFG)
    assert (lb.sim_constell.i_ovlp_sum, ub.sim_constell.i_ovlp_sum) == (3, 6)
    assert (lb.sim_constell.i_ovlp_max_one, ub.sim_constell.i_ovlp_max_one) == (3, 6)
    assert (lb.sim_constell.i_in_ang_rng, ub.sim_constell.i_in_ang_rng) == (3, 6)
    assert (lb.sim_pair.i_indiv_sim, ub.sim_pair.i_indiv_sim) == (3, 6)
    assert (lb.sim_pair.i_orie_sim, ub.sim_pair.i_orie_sim) == (4, 6)
    assert (lb.sim_post.correlation, ub.sim_post.correlation) == (0.3, 0.75)
    assert (lb.sim_post.area_perc, ub.sim_post.area_perc) == (0.03, 0.15)
    assert (lb.sim_post.neg_est_dist, ub.sim_post.neg_est_dist) == (-5.01, -5.0)


def test_gen_thres_dirs(tmp_path):
    root = str(tmp_path / "grid")
    n = gen_thres_dirs(root)
    assert n == 108  # 4 constell x 3 corr x 3 area x 3 ndist
    lb, ub = load_check_thres(os.path.join(root, "000", "batch_pr.cfg"))
    assert lb.sim_constell.i_ovlp_sum == 3 and ub.sim_constell.i_ovlp_sum == 6
    assert abs(lb.sim_post.correlation - 0.3) < 1e-9
    # regenerating on top must refuse to overwrite (reference exits -1)
    with pytest.raises(FileExistsError):
        gen_thres_dirs(root)
    n2 = gen_thres_dirs_manual(str(tmp_path / "manual"),
                               [[3, 0.1, 0.01, -10], [7, 0.75, 0.15, -4]])
    assert n2 == 2


@pytest.mark.slow
def test_run_sweep_resume(tmp_path):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth import make_world, render_scan, se3_from_xyt

    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(6)] + [(10.5, 0.8, 0.2)]
    pl, ll = [], []
    for i, p in enumerate(poses):
        pts = render_scan(world, p, seed=500 + i)
        arr = np.zeros((len(pts), 4), np.float32)
        arr[:, :3] = pts
        bp = str(tmp_path / ("%06d.bin" % i))
        arr.tofile(bp)
        T = se3_from_xyt(p)
        pl.append("%.6f %s" % (6.0 * i, " ".join("%.6f" % v
                                                 for v in T[:3, :4].reshape(-1))))
        ll.append("%.6f %d %s" % (6.0 * i, i, bp))
    f_pose = str(tmp_path / "pose.txt")
    f_laser = str(tmp_path / "laser.txt")
    open(f_pose, "w").write("\n".join(pl))
    open(f_laser, "w").write("\n".join(ll))

    root = str(tmp_path / "grid")
    gen_thres_dirs_manual(root, [[3, 0.1, 0.01, -10.01]])
    base = PipelineConfig(cm=ContourManagerConfig(max_points=16384))

    rc = run_sweep_id(root, 0, f_pose, f_laser, "synth", cfg_base=base)
    assert rc == 0
    brief = open(os.path.join(root, "000", "brief-synth.txt")).read().split("\t")
    assert len(brief) == 3
    tp, fn, fp = map(int, brief)
    assert tp == 1 and fn == 0, brief        # the planted revisit is found
    assert os.path.exists(os.path.join(root, "000", "outcome-synth.txt"))

    # resume: brief exists -> skip; missing config -> code 2
    assert run_sweep_id(root, 0, f_pose, f_laser, "synth", cfg_base=base) == 1
    assert run_sweep_id(root, 7, f_pose, f_laser, "synth", cfg_base=base) == 2
