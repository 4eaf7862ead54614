"""JAX descriptor vs the NumPy oracle on synthetic scans."""

import numpy as np
import pytest

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig
from contour_context_tpu import oracle
from contour_context_tpu.utils.io import pad_points

CFG = ContourManagerConfig(max_points=16384)


@pytest.fixture(scope="module")
def scene():
    world = make_world(0)
    pts = render_scan(world, (0.0, 0.0, 0.0), seed=1)
    return pts


@pytest.fixture(scope="module")
def built(scene):
    from contour_context_tpu.ops.descriptor import build_descriptor
    import jax

    osc = oracle.build_scan(scene, CFG, 0)
    desc = build_descriptor(pad_points(scene, CFG.max_points), CFG)
    desc = jax.tree.map(np.asarray, desc)
    return osc, desc


def test_bev_parity(scene):
    from contour_context_tpu.ops.descriptor import rasterize_bev

    ob = oracle.make_bev(scene, CFG)
    bev, rowf, colf = rasterize_bev(pad_points(scene, CFG.max_points), CFG)
    bev = np.asarray(bev).reshape(CFG.n_row, CFG.n_col)
    rowf = np.asarray(rowf).reshape(CFG.n_row, CFG.n_col)
    np.testing.assert_allclose(bev, ob.bev, atol=1e-5)
    occ = ob.bev > -999
    np.testing.assert_allclose(rowf.reshape(-1)[occ.reshape(-1)],
                               ob.rowf[occ], atol=1e-4)


def test_cc_flush_lowerings_identical(scene):
    """cc_labels' two run-flush lowerings (associative_scan vs Hillis-Steele
    doubling) are label-identical on real scans — cc_flush is a pure speed
    knob (config.ContourManagerConfig.cc_flush)."""
    import jax.numpy as jnp

    from contour_context_tpu.ops.descriptor import cc_labels, rasterize_bev

    bev, _, _ = rasterize_bev(pad_points(scene, CFG.max_points), CFG)
    grads = jnp.array(CFG.lv_grads, jnp.float32)
    masks = bev.reshape(CFG.n_row, CFG.n_col)[None] > grads[:, None, None]
    lab_scan = np.asarray(cc_labels(masks, "scan"))
    lab_hillis = np.asarray(cc_labels(masks, "hillis"))
    np.testing.assert_array_equal(lab_hillis, lab_scan)
    assert (lab_scan < CFG.n_row * CFG.n_col).any()   # non-degenerate


def test_contour_tables(built):
    osc, desc = built
    for ll in range(CFG.n_levels):
        conts = osc.cont_views[ll]
        assert int(desc.n_cont[ll]) == len(conts)
        assert int(desc.layer_cell_cnt[ll]) == osc.layer_cell_cnt[ll]
        for k, c in enumerate(conts[: CFG.max_contours]):
            assert int(desc.cnt[ll, k]) == c.cell_cnt, (ll, k)
            np.testing.assert_allclose(desc.mean[ll, k], c.pos_mean,
                                       atol=2e-3, rtol=1e-4)
            np.testing.assert_allclose(desc.eig_vals[ll, k], c.eig_vals,
                                       atol=5e-3, rtol=1e-3)
            np.testing.assert_allclose(abs(float(np.dot(desc.eig_vecs[ll, k][:, 1],
                                                        c.eig_vecs[:, 1]))),
                                       1.0, atol=1e-3)
            np.testing.assert_allclose(desc.vol3_mean[ll, k], c.vol3_mean,
                                       atol=2e-3, rtol=1e-4)
            assert bool(desc.ecc_feat[ll, k]) == c.ecc_feat, (ll, k)


def test_keys(built):
    osc, desc = built
    np.testing.assert_allclose(desc.keys, osc.keys, atol=2e-2, rtol=2e-3)


def test_bcis(built):
    osc, desc = built
    for ll in range(CFG.n_levels):
        for seq in range(CFG.piv_firsts):
            ob = osc.bcis[ll][seq]
            nv = np.asarray(desc.nei_valid[ll, seq])
            if ob is None:
                assert not nv.any()
                continue
            n = int(nv.sum())
            assert n == len(ob.nei_bit), (ll, seq)
            np.testing.assert_array_equal(desc.nei_bit[ll, seq][:n], ob.nei_bit)
            np.testing.assert_array_equal(desc.nei_level[ll, seq][:n], ob.nei_level)
            np.testing.assert_array_equal(desc.nei_seq[ll, seq][:n], ob.nei_seq)
            np.testing.assert_allclose(desc.nei_theta[ll, seq][:n], ob.nei_theta,
                                       atol=1e-4)


def test_quantized_transport_parity(scene, built):
    """int16 wire format (1/256 m) reproduces the f32 descriptor closely."""
    import jax.numpy as jnp

    from contour_context_tpu.ops.descriptor import build_descriptor
    from contour_context_tpu.utils.io import quantize_points_q16

    _, d32 = built
    q = quantize_points_q16(pad_points(scene, CFG.max_points))
    dq = build_descriptor(jnp.asarray(q), CFG)
    # 4 mm quantization can flip points sitting exactly on cell boundaries,
    # shifting a cell between contours: require 99% of key elements tight and
    # every element within 10% relative
    kq = np.asarray(dq.keys)
    k32 = np.asarray(d32.keys)
    close = np.isclose(kq, k32, atol=0.15, rtol=0.02)
    assert close.mean() > 0.99, (1 - close.mean())
    np.testing.assert_allclose(kq, k32, atol=0.3, rtol=0.1)
    # a cell flip can swap the order of near-equal contours, so match means
    # set-wise per level: every big f32 contour has a quantized counterpart
    mq = np.asarray(dq.mean)
    vq = np.asarray(dq.valid)
    for lev in range(CFG.n_levels):
        big = (d32.cnt[lev] > 20) & d32.valid[lev]
        cand = mq[lev][vq[lev]]
        for m in d32.mean[lev][big]:
            d = np.linalg.norm(cand - m, axis=1).min()
            assert d < 0.1, (lev, m, d)
    assert abs(int(np.asarray(dq.n_cont).sum()) - int(d32.n_cont.sum())) <= 2


def test_gmm_summary(built):
    from contour_context_tpu.config import GMMOptConfig

    osc, desc = built
    model = oracle.build_gmm(osc, GMMOptConfig())
    np.testing.assert_allclose(float(desc.auto_corr), model.auto_corr, rtol=2e-3)
