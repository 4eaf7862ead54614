"""Config system: YAML loader parsed against the reference's bundled file."""

import os

import pytest

from contour_context_tpu.config import (
    PipelineConfig,
    load_pipeline_config_yaml,
    mulran_pipeline_config,
)

REF_YAML = "/root/reference/config/batch_bin_test_config.yaml"


def test_load_reference_yaml():
    if not os.path.exists(REF_YAML):
        pytest.skip("reference not mounted")
    cfg, io_paths = load_pipeline_config_yaml(REF_YAML)
    assert cfg.db.nnk == 50
    assert cfg.db.max_fine_opt == 10
    assert cfg.db.q_levels == (1, 2, 3)
    assert cfg.db.cont_sim.ta_cell_cnt == 6.0
    assert cfg.db.cont_sim.ta_h_bar == 0.3
    assert cfg.db.tb.max_elapse == 25.0
    assert cfg.db.tb.min_elapse == 15.0
    assert cfg.cm.lv_grads == (1.5, 2.0, 2.5, 3.0, 3.5, 4.0)
    assert cfg.cm.n_row == 150 and cfg.cm.n_col == 150
    assert cfg.cm.lidar_height == 2.0 and cfg.cm.blind_sq == 9.0
    assert cfg.cm.min_cont_key_cnt == 9 and cfg.cm.min_cont_cell_cnt == 3
    assert cfg.cm.piv_firsts == 6 and cfg.cm.dist_firsts == 10
    assert cfg.cm.roi_radius == 10.0
    assert abs(cfg.correlation_thres - 0.64928) < 1e-9
    assert cfg.thres_lb.sim_constell.i_ovlp_sum == 3
    assert cfg.thres_lb.sim_pair.i_orie_sim == 4
    assert cfg.thres_lb.sim_post.neg_est_dist == -5.01
    assert cfg.thres_ub.sim_constell.i_in_ang_rng == 6
    assert cfg.thres_ub.sim_post.correlation == 0.75
    # the YAML's defaults equal our dataclass defaults (single source of truth)
    dflt = PipelineConfig()
    assert cfg.thres_lb == dflt.thres_lb
    assert cfg.thres_ub == dflt.thres_ub


def test_mulran_operating_point():
    cfg = mulran_pipeline_config()
    assert cfg.cm.lv_grads == (1.0, 2.5, 4.0, 5.5, 7.0, 8.5)
    assert cfg.db.cont_sim.ta_h_bar == 0.75


def test_configs_hashable_for_jit():
    """Every config object is a static jit argument; hashability is load-bearing."""
    a, b = PipelineConfig(), PipelineConfig()
    assert hash(a) == hash(b) and a == b
    assert hash(mulran_pipeline_config()) != hash(a) or mulran_pipeline_config() != a


def test_grid_too_large_for_int16_counts_rejected():
    """ScanDesc.cnt is int16; grids whose cell count could overflow it must
    be rejected loudly (review finding: silent wraparound corrupts checkSim
    ratios and GMM weights)."""
    import pytest

    from contour_context_tpu.config import ContourManagerConfig

    with pytest.raises(ValueError, match="int16"):
        ContourManagerConfig(n_row=200, n_col=200)
    ContourManagerConfig(n_row=181, n_col=181)     # 32761 cells: fine
