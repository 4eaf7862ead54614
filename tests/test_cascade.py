"""Batched check cascade vs the sequential oracle on a synthetic revisit."""

import math

import numpy as np
import pytest

from synth import make_world, render_scan

from contour_context_tpu.config import (
    ContourManagerConfig,
    ContourSimThresConfig,
    DEFAULT_THRES_LB,
    GMMOptConfig,
)
from contour_context_tpu import oracle
from contour_context_tpu.utils.io import pad_points

CFG = ContourManagerConfig(max_points=16384)
SIM = ContourSimThresConfig()
LB = DEFAULT_THRES_LB


@pytest.fixture(scope="module")
def pair():
    world = make_world(3)
    pts_a = render_scan(world, (0.0, 0.0, 0.0), seed=10)
    pts_b = render_scan(world, (2.0, 1.0, 0.3), seed=11)
    osc_a = oracle.build_scan(pts_a, CFG, 0)
    osc_b = oracle.build_scan(pts_b, CFG, 1)

    import jax
    from contour_context_tpu.ops.descriptor import build_descriptor

    da = build_descriptor(pad_points(pts_a, CFG.max_points), CFG)
    db_ = build_descriptor(pad_points(pts_b, CFG.max_points), CFG)
    return osc_a, osc_b, da, db_


def _oracle_hint(osc_src, osc_tgt, level, ss, st):
    """Sequential reference chain for one hint; returns dict of outcomes."""
    out = dict(pass1=False, pass2=False, pass3=False)
    if not (len(osc_src.cont_views[level]) > ss and len(osc_tgt.cont_views[level]) > st):
        return out
    if not oracle.check_sim(osc_src.cont_views[level][ss],
                            osc_tgt.cont_views[level][st], SIM):
        return out
    out["pass1"] = True
    bs = osc_src.bcis[level][ss]
    bt = osc_tgt.bcis[level][st]
    if bs is None or bt is None:
        return out
    score2, pairs = oracle.check_constell_sim(bs, bt, LB.sim_constell)
    out["score2"] = score2
    if pairs is None:
        return out
    out["pass2"] = True
    score3, pairs2, percs = oracle.check_constell_corresp_sim(
        osc_src, osc_tgt, pairs, LB.sim_pair, SIM)
    out["score3"] = score3
    if pairs2 is None:
        return out
    out["pass3"] = True
    out["pairs"] = set(pairs2)
    out["T"] = oracle.umeyama_se2(osc_src, osc_tgt, pairs2)
    return out


def test_cascade_vs_oracle(pair):
    import jax
    import jax.numpy as jnp
    from contour_context_tpu.db import _gather_and_cascade

    osc_a, osc_b, da, db_ = pair
    store = jax.tree.map(lambda x: x[None], da)

    hints = []
    for level in (1, 2, 3):
        for ss in range(CFG.piv_firsts):
            for st in range(CFG.piv_firsts):
                if np.abs(osc_a.keys[level][ss]).sum() > 0 and \
                   np.abs(osc_b.keys[level][st]).sum() > 0:
                    hints.append((level, ss, st))
    H = len(hints)
    assert H > 4
    lev = jnp.asarray([h[0] for h in hints], jnp.int32)
    ss_ = jnp.asarray([h[1] for h in hints], jnp.int32)
    st_ = jnp.asarray([h[2] for h in hints], jnp.int32)
    res = _gather_and_cascade(store, db_, jnp.zeros(H, jnp.int32), lev, ss_, st_,
                              jnp.ones(H, bool), LB, SIM)
    res = jax.tree.map(np.asarray, res)

    n_pass3 = 0
    for i, (level, ss, st) in enumerate(hints):
        o = _oracle_hint(osc_a, osc_b, level, ss, st)
        assert bool(res.pass1[i]) == o["pass1"], (i, hints[i], "pass1")
        assert bool(res.pass2[i]) == o["pass2"], (i, hints[i], "pass2",
                                                  o.get("score2"),
                                                  (res.ovlp_sum[i], res.ovlp_max_one[i],
                                                   res.in_ang_rng[i]))
        assert bool(res.pass3[i]) == o["pass3"], (i, hints[i], "pass3", o.get("score3"),
                                                  (res.i_indiv_sim[i], res.i_orie_sim[i]))
        if o["pass2"]:
            assert int(res.ovlp_sum[i]) == o["score2"][0]
            assert int(res.ovlp_max_one[i]) == o["score2"][1]
            assert int(res.in_ang_rng[i]) == o["score2"][2]
        if o["pass3"]:
            n_pass3 += 1
            got = {(int(res.pair_level[i, j]), int(res.pair_seq_src[i, j]),
                    int(res.pair_seq_tgt[i, j]))
                   for j in np.flatnonzero(res.pair_valid[i])}
            assert got == o["pairs"], (i, hints[i])
            T_o = o["T"]
            np.testing.assert_allclose(res.T_delta[i, 0], T_o[0, 2], atol=5e-2)
            np.testing.assert_allclose(res.T_delta[i, 1], T_o[1, 2], atol=5e-2)
            th_o = math.atan2(T_o[1, 0], T_o[0, 0])
            np.testing.assert_allclose(res.T_delta[i, 2], th_o, atol=1e-2)
    # the revisit must produce at least one full pass
    assert n_pass3 >= 1


@pytest.mark.slow
def test_cascade_fuzz_multi_seed():
    """Hint-for-hint cascade parity across several worlds/pose offsets."""
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import _gather_and_cascade
    from contour_context_tpu.ops.descriptor import build_descriptor

    cases = [(5, (1.0, -2.0, -0.2), (20, 21)),
             (8, (4.0, 3.0, 0.7), (30, 31)),
             (13, (0.2, 0.1, 0.02), (40, 41)),
             # extra worlds aimed at the edge paths: large rotations
             # (orientation screen + shaft selection), near-identity pairs
             # (angle-difference ties), and a dense world (window pressure)
             (21, (2.5, -1.5, 3.0), (50, 51)),
             (34, (0.0, 0.0, 0.0), (60, 61)),
             (55, (-3.0, 2.0, -1.4), (70, 71))]
    for wseed, pose_b, (sa, sb) in cases:
        world = make_world(wseed)
        pts_a = render_scan(world, (0.0, 0.0, 0.0), seed=sa)
        pts_b = render_scan(world, pose_b, seed=sb)
        osc_a = oracle.build_scan(pts_a, CFG, 0)
        osc_b = oracle.build_scan(pts_b, CFG, 1)
        da = build_descriptor(pad_points(pts_a, CFG.max_points), CFG)
        db_ = build_descriptor(pad_points(pts_b, CFG.max_points), CFG)
        store = jax.tree.map(lambda x: x[None], da)

        hints = [(lv, ss, st)
                 for lv in (1, 2, 3)
                 for ss in range(CFG.piv_firsts)
                 for st in range(CFG.piv_firsts)
                 if np.abs(osc_a.keys[lv][ss]).sum() > 0
                 and np.abs(osc_b.keys[lv][st]).sum() > 0]
        if not hints:
            continue
        lev = jnp.asarray([h[0] for h in hints], jnp.int32)
        ss_ = jnp.asarray([h[1] for h in hints], jnp.int32)
        st_ = jnp.asarray([h[2] for h in hints], jnp.int32)
        res = _gather_and_cascade(store, db_, jnp.zeros(len(hints), jnp.int32),
                                  lev, ss_, st_, jnp.ones(len(hints), bool),
                                  LB, SIM)
        res = jax.tree.map(np.asarray, res)
        for i, (level, ss, st) in enumerate(hints):
            o = _oracle_hint(osc_a, osc_b, level, ss, st)
            assert bool(res.pass1[i]) == o["pass1"], (wseed, hints[i])
            assert bool(res.pass2[i]) == o["pass2"], (wseed, hints[i])
            assert bool(res.pass3[i]) == o["pass3"], (wseed, hints[i])
            if o["pass3"]:
                got = {(int(res.pair_level[i, j]), int(res.pair_seq_src[i, j]),
                        int(res.pair_seq_tgt[i, j]))
                       for j in np.flatnonzero(res.pair_valid[i])}
                assert got == o["pairs"], (wseed, hints[i])


def test_gmm_vs_oracle(pair):
    import jax
    import jax.numpy as jnp
    from contour_context_tpu.ops.gmm import (
        gmm_from_desc, init_correlation, optimize_correlation)

    osc_a, osc_b, da, db_ = pair
    gcfg = GMMOptConfig()
    ga = oracle.build_gmm(osc_a, gcfg)
    gb = oracle.build_gmm(osc_b, gcfg)

    # true relative pose in BEV pixel frame: B at (2, 1, 0.3) vs A at origin.
    # T maps src(A)-frame BEV coords to tgt(B)-frame: p_B = R(-dth) (p_A - dt)
    # Build from the known sensor poses like getEstSensTF inverted.
    dth = -0.3
    c, s = math.cos(dth), math.sin(dth)
    ox = CFG.n_row / 2 - 0.5
    # sensor delta: T_tgt_src: src origin expressed in tgt frame
    dx_w, dy_w = -2.0, -1.0
    cs, ss_ = math.cos(-0.3), math.sin(-0.3)
    dx = cs * dx_w - ss_ * dy_w
    dy = ss_ * dx_w + cs * dy_w
    # BEV-origin-frame delta (inverse of getEstSensTF conjugation)
    tx = dx + ox - (c * ox - s * ox)
    ty = dy + ox - (s * ox + c * ox)
    T_init = np.array([tx, ty, dth])
    T33 = np.array([[c, -s, tx], [s, c, ty], [0, 0, 1.0]])

    sel_o = oracle.gmm_select_pairs(ga, gb, T33, gcfg)
    corr_o = oracle.gmm_correlation(ga, gb, sel_o, T_init, gcfg)

    jga = gmm_from_desc(da, gcfg)
    jgb = gmm_from_desc(db_, gcfg)
    batch = jax.tree.map(lambda x: jnp.asarray(x)[None], jga)
    corr_j, sel_j = init_correlation(batch, jgb, jnp.asarray(T_init, jnp.float32)[None])
    np.testing.assert_allclose(float(corr_j[0]), corr_o, rtol=2e-2)
    assert corr_o > 0.3  # a genuine revisit correlates

    corr_f, T_f = optimize_correlation(batch, jgb,
                                       jnp.asarray(T_init, jnp.float32)[None], sel_j)
    assert float(corr_f[0]) >= float(corr_j[0]) - 1e-4
