"""Fused device query step vs the host-side CandidateManager spec replica.

The fused path (db._query_step: search -> compaction -> cascade -> on-device
merge -> tidy -> GMM) must reproduce the host path (db.query_ranged_knn_host,
itself oracle-tested) on sequences with genuine revisits: same candidate, same
correlation, same pose, same no-result decisions.
"""

import numpy as np
import pytest

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.db import ContourDB
from contour_context_tpu.utils.io import pad_points


def drive(world, poses, ts_step, cfg, seed0=500):
    """Run the sequence through both query paths on one DB; compare."""
    from contour_context_tpu.ops.descriptor import build_descriptor

    db = ContourDB(cfg, capacity=len(poses) + 2)
    outcomes = []
    for i, pose in enumerate(poses):
        ts = ts_step * i
        pts = render_scan(world, pose, seed=seed0 + i)
        desc = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
        r_dev = db.query_ranged_knn(desc)
        r_host = db.query_ranged_knn_host(desc)
        outcomes.append((i, r_dev, r_host))
        db.add_scan(desc, i, ts)
        db.push_and_balance(ts)
    return db, outcomes


@pytest.mark.slow
def test_fused_matches_host():
    # caps raised so the fused path processes every hit the host path sees
    # (the synthetic world is denser than KITTI; defaults cap at 128 hints
    # and count the overflow instead)
    from contour_context_tpu.config import ContourDBConfig

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384),
                         db=ContourDBConfig(max_check_cands=1024,
                                            max_pass_hints=128))
    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    poses.append((10.5, 0.8, 0.2))    # revisit pose 1
    poses.append((30.0, -1.0, -0.15))  # revisit pose 3
    poses.append((110.0, 40.0, 0.6))  # nowhere near anything

    db, outcomes = drive(world, poses, 6.0, cfg)

    n_found = 0
    for i, r_dev, r_host in outcomes:
        if r_host is None:
            assert r_dev is None, (i, r_dev)
            continue
        assert r_dev is not None, (i, r_host)
        n_found += 1
        assert r_dev[0] == r_host[0], (i, r_dev, r_host)
        np.testing.assert_allclose(r_dev[1], r_host[1], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(r_dev[2], r_host[2], rtol=1e-3, atol=1e-3)
    assert n_found >= 2, outcomes

    # counters flowed (one record per fused query that ran); with the raised
    # caps nothing may overflow, else the host comparison above is vacuous
    assert db.counters["n_hints"] > 0
    assert db.counters["overflow_hints"] == 0
    assert db.counters["overflow_pass"] == 0
    assert db.counters["overflow_cand"] == 0


@pytest.mark.slow
def test_check1_prefilter_bit_identical():
    """config.check1_prefilter is a cost optimization ONLY: the packed
    per-query records of a driven sequence are BIT-identical with the flag
    on and off. Caps are squeezed (cascade_chunk < max_check_cands, small
    merge budget) so the prefilter path genuinely compacts and the chunked
    cascade runs a different number of chunks between the two configs."""
    import dataclasses

    from contour_context_tpu.config import ContourDBConfig
    from contour_context_tpu.ops.descriptor import build_descriptor

    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    poses += [(10.5, 0.8, 0.2), (30.0, -1.0, -0.15), (50.2, 0.7, 0.1)]

    recs = {}
    for flag in (True, False):
        cfg = PipelineConfig(
            cm=ContourManagerConfig(max_points=16384),
            db=dataclasses.replace(ContourDBConfig(), check1_prefilter=flag,
                                   max_check_cands=96, cascade_chunk=32,
                                   max_pass_hints=48))
        db = ContourDB(cfg, capacity=len(poses) + 2)
        rows = []
        for i, pose in enumerate(poses):
            pts = render_scan(world, pose, seed=500 + i)
            desc = build_descriptor(pad_points(pts, cfg.cm.max_points),
                                    cfg.cm, cfg.gmm)
            h = db.query_async(desc)
            if h is not None:
                rows.append(np.asarray(h.rec))
            db.add_scan(desc, i, 6.0 * i)
            db.push_and_balance(6.0 * i)
        recs[flag] = np.stack(rows)

    np.testing.assert_array_equal(recs[True], recs[False])
    # the sequence must actually exercise the cascade (found loops + hints)
    assert recs[True][:, 6].max() > 0        # n_hints
    assert (recs[True][:, 0] > 0.5).sum() >= 1  # found


def test_p_pot_cap_bit_identical_when_not_overflowing():
    """config.p_pot (angular-window pair capacity, ops/cascade.P_POT when
    None) is a cost knob: whenever no hint's bit-adjacent pair pool exceeds
    the cap, the packed records are BIT-identical to the default — and when
    a tiny cap truncates, overflow_pot discloses it."""
    import dataclasses

    from contour_context_tpu.config import ContourDBConfig
    from contour_context_tpu.ops.descriptor import build_descriptor

    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    poses += [(10.5, 0.8, 0.2), (30.0, -1.0, -0.15), (50.2, 0.7, 0.1)]

    recs, pots = {}, {}
    for pot in (None, 128, 4):
        cfg = PipelineConfig(
            cm=ContourManagerConfig(max_points=16384),
            db=dataclasses.replace(ContourDBConfig(), p_pot=pot,
                                   max_check_cands=96, cascade_chunk=32,
                                   max_pass_hints=48))
        db = ContourDB(cfg, capacity=len(poses) + 2)
        rows = []
        for i, pose in enumerate(poses):
            pts = render_scan(world, pose, seed=500 + i)
            desc = build_descriptor(pad_points(pts, cfg.cm.max_points),
                                    cfg.cm, cfg.gmm)
            h = db.query_async(desc)
            if h is not None:
                rows.append(np.asarray(h.rec))
                h.get()     # counters accumulate on handle completion
            db.add_scan(desc, i, 6.0 * i)
            db.push_and_balance(6.0 * i)
        recs[pot] = np.stack(rows)
        pots[pot] = db.counters["overflow_pot"]

    # this world's pair pools stay under 128: cap-128 must be bit-identical
    assert pots[None] == 0 and pots[128] == 0, pots
    np.testing.assert_array_equal(recs[None], recs[128])
    assert recs[None][:, 6].max() > 0           # hints actually flowed
    assert (recs[None][:, 0] > 0.5).sum() >= 1  # and a loop closed
    # a cap of 4 genuinely truncates (a closed loop needs >=6 pairs inside
    # the angular window, so a survivor's pool exceeded 4) — the counter
    # must disclose it
    assert pots[4] > 0, pots


@pytest.mark.slow
def test_fused_matches_host_dynamic_thres():
    """Same parity under DYNAMIC_THRES=1 (rising lower bounds)."""
    from contour_context_tpu.config import ContourDBConfig

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384),
                         db=ContourDBConfig(max_check_cands=1024,
                                            max_pass_hints=128,
                                            dynamic_thres=True))
    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    poses.append((10.5, 0.8, 0.2))
    poses.append((30.0, -1.0, -0.15))

    _, outcomes = drive(world, poses, 6.0, cfg)
    n_found = 0
    for i, r_dev, r_host in outcomes:
        if r_host is None:
            assert r_dev is None, (i, r_dev)
            continue
        assert r_dev is not None, (i, r_host)
        n_found += 1
        assert r_dev[0] == r_host[0], (i, r_dev, r_host)
        np.testing.assert_allclose(r_dev[1], r_host[1], rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(r_dev[2], r_host[2], rtol=1e-3, atol=1e-3)
    assert n_found >= 1, outcomes


@pytest.mark.slow
def test_scan_step_matches_unfused():
    """db.step_async (ONE dispatch: build+query+append+window) must produce
    identical records and identical final DB state as the 4-dispatch
    build_descriptor / query_async / add_scan / push_and_balance sequence."""
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import _unpack_record
    from contour_context_tpu.ops.descriptor import build_descriptor

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(7, n_structs=200, extent=150.0)
    poses = [(9.0 * i, 0.0, 0.0) for i in range(7)]
    poses.append((9.2, 0.3, 0.05))     # revisit pose 1
    poses.append((27.2, -0.3, -0.05))  # revisit pose 3
    clouds = [pad_points(render_scan(world, p, seed=40 + i), cfg.cm.max_points)
              for i, p in enumerate(poses)]

    db_a = ContourDB(cfg, capacity=len(poses) + 2)
    db_b = ContourDB(cfg, capacity=len(poses) + 2)
    recs_a, recs_b = [], []
    for i, pts in enumerate(clouds):
        ts = 6.0 * i
        h = db_a.step_async(pts, i, ts)
        recs_a.append(np.asarray(jax.device_get(h.rec)))

        desc = build_descriptor(jnp.asarray(pts), cfg.cm, cfg.gmm)
        hb = db_b.query_async(desc)
        recs_b.append(None if hb is None
                      else np.asarray(jax.device_get(hb.rec)))
        db_b.add_scan(desc, i, ts)
        db_b.push_and_balance(ts)

    n_found = 0
    for i, (ra, rb) in enumerate(zip(recs_a, recs_b)):
        if rb is None:  # empty-DB query: fused path must report not-found
            assert _unpack_record(ra).found is False, i
            continue
        np.testing.assert_allclose(ra, rb, rtol=1e-4, atol=1e-4)
        n_found += int(_unpack_record(ra).found)
    assert n_found >= 1, [(_unpack_record(r).found) for r in recs_a]

    # final device state identical (store rows, timestamps, window)
    np.testing.assert_array_equal(np.asarray(db_a.state), np.asarray(db_b.state))
    np.testing.assert_array_equal(np.asarray(db_a.ts_store),
                                  np.asarray(db_b.ts_store))
    for la, lb in zip(jax.tree.leaves(db_a.store), jax.tree.leaves(db_b.store)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-5)


def test_merge_proposals_vs_host_replica():
    """Randomized proposal streams: device merge == host AnchorProp merge."""
    import jax.numpy as jnp

    from contour_context_tpu.db import HostCandidateManager
    from contour_context_tpu.ops.candidate import (
        NUM_SLOTS, N_SEQ, merge_proposals, tidy_candidates)

    cfg = PipelineConfig()
    rng = np.random.default_rng(3)
    H, P = 40, 8
    for trial in range(4):
        pass3 = rng.random(H) < 0.5
        gidx = rng.integers(0, 5, H).astype(np.int32)   # few poses -> merges
        T = np.stack([rng.uniform(-8, 8, H), rng.uniform(-8, 8, H),
                      rng.uniform(-0.8, 0.8, H)], axis=1).astype(np.float32)
        # clump transforms so some proposals merge
        T[rng.random(H) < 0.5, :2] = rng.uniform(-1, 1, 2).astype(np.float32)
        pv = rng.random((H, P)) < 0.8
        plev = rng.integers(1, 5, (H, P)).astype(np.int32)
        pss = rng.integers(0, N_SEQ, (H, P)).astype(np.int32)
        pst = rng.integers(0, N_SEQ, (H, P)).astype(np.int32)
        # make pairs unique within each hint (the cascade guarantees this)
        for h in range(H):
            seen = set()
            for j in range(P):
                while (plev[h, j], pss[h, j], pst[h, j]) in seen:
                    pst[h, j] = (pst[h, j] + 1) % N_SEQ
                seen.add((plev[h, j], pss[h, j], pst[h, j]))
        perc = rng.uniform(0, 0.2, (H, P)).astype(np.float32)

        st = merge_proposals(
            jnp.asarray(pass3), jnp.asarray(gidx), jnp.asarray(T),
            jnp.asarray(pv), jnp.asarray(plev), jnp.asarray(pss),
            jnp.asarray(pst), jnp.asarray(perc),
            n_cand_max=8, n_pass_max=64)
        tt = tidy_candidates(st, -1.0, -1e9, cfg.cm.n_row, cfg.cm.n_col,
                             cfg.cm.reso_row, cfg.cm.reso_col)
        T_sel, area, votes = tt.T_sel, tt.area, tt.votes

        mgr = HostCandidateManager(cfg)
        for h in range(H):
            if not pass3[h]:
                continue
            pairs = [(int(plev[h, j]), int(pss[h, j]), int(pst[h, j]))
                     for j in range(P) if pv[h, j]]
            percs = [float(perc[h, j]) for j in range(P) if pv[h, j]]
            mgr.add_passing_hint(int(gidx[h]), T[h].astype(np.float64),
                                 pairs, percs)
        stats = mgr.tidy_stats()

        st = type(st)(*[np.asarray(x) for x in st])
        assert int(st.n_cand) == len(mgr.order), trial
        for ci, g in enumerate(mgr.order):
            assert int(st.cand_gidx[ci]) == g
            host_cand = mgr.by_gidx[g]
            assert int(st.prop_n[ci]) == len(host_cand.props), (trial, ci)
        # tidy selection parity (tidy_stats swapped best prop to front)
        for cand, area_h, negd_h in stats:
            ci = mgr.order.index(cand.gidx)
            np.testing.assert_allclose(np.asarray(T_sel)[ci],
                                       cand.props[0].T, atol=1e-4)
            np.testing.assert_allclose(float(np.asarray(area)[ci]),
                                       area_h, atol=1e-5)
            np.testing.assert_allclose(float(np.asarray(tt.neg_d)[ci]),
                                       negd_h, atol=1e-4)
            assert int(np.asarray(votes)[ci]) == cand.props[0].vote_cnt


def test_topk_strategy_cover_plumbs_through_query():
    """ContourDBConfig.topk_strategy='cover' must reach the fused query's
    search (config threading / trace-time plumbing): same detections as the
    default 'block' strategy (both are exact min-k, so results are equal at
    every store size; at small stores both use the single-stage path and
    this asserts only that the alternate config compiles and runs)."""
    from contour_context_tpu.config import ContourDBConfig

    world = make_world(11, n_structs=120, extent=120.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(6)]
    poses.append((10.5, 0.8, 0.2))    # revisit pose 1
    results = {}
    for strat in ("block", "cover"):
        cfg = PipelineConfig(cm=ContourManagerConfig(max_points=8192),
                             db=ContourDBConfig(topk_strategy=strat))
        _, outcomes = drive(world, poses, 6.0, cfg)
        results[strat] = [(i, None if r is None else (r[0], round(float(r[1]), 5)))
                          for i, r, _ in outcomes]
    assert results["block"] == results["cover"]
    assert any(r is not None for _, r in results["block"])
