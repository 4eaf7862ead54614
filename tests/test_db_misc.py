"""DB auto-grow and the multi-chip sharded query step (8 virtual devices)."""

import numpy as np
import pytest

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.db import ContourDB
from contour_context_tpu.ops.descriptor import build_descriptor
from contour_context_tpu.utils.io import pad_points

CFG = PipelineConfig(cm=ContourManagerConfig(max_points=16384))


def _descs(n, world=None, step=10.0):
    world = world if world is not None else make_world(11, n_structs=220,
                                                       extent=160.0)
    out = []
    for i in range(n):
        pts = render_scan(world, (step * i, 0.0, 0.0), seed=500 + i)
        out.append(build_descriptor(pad_points(pts, CFG.cm.max_points),
                                    CFG.cm, CFG.gmm))
    return world, out


def test_topk_min_two_stage_exact():
    """_topk_min's large-row strategies ("block" two-stage and "cover"
    tile-min cover) must equal the single-stage lax.top_k
    element-for-element — values, indices, AND tie order — including a
    non-divisible (padded) width and duplicate values."""
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import MAX_DIST_SQ, TOPK_BLOCK, _topk_min

    rng = np.random.default_rng(7)
    k = 50
    for M in (4 * TOPK_BLOCK, 4 * TOPK_BLOCK + 1234, 98304):
        d = rng.uniform(0.0, 4.0, (3, 2, M)).astype(np.float32)
        # heavy value ties: quantize a stripe, and mask a block at MAX
        d[:, :, ::7] = np.round(d[:, :, ::7] * 4) / 4
        d[:, 1, 1000:40000] = MAX_DIST_SQ
        d = jnp.asarray(d)
        ref_neg, ref_idx = jax.lax.top_k(-d, k)
        for strategy in ("block", "cover"):
            got_d, got_i = _topk_min(d, k, strategy)
            np.testing.assert_array_equal(
                np.asarray(got_d), np.asarray(-ref_neg),
                err_msg=f"M={M} strategy={strategy}")
            np.testing.assert_array_equal(
                np.asarray(got_i), np.asarray(ref_idx),
                err_msg=f"M={M} strategy={strategy}")
    # below the threshold: the single-stage path, trivially identical
    d = jnp.asarray(rng.uniform(0.0, 4.0, (2, 2, 1440)).astype(np.float32))
    got_d, got_i = _topk_min(d, k)
    ref_neg, ref_idx = jax.lax.top_k(-d, k)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_idx))


def test_search_cover2_matches_cover():
    """The fused "cover2" search lowering (db._search_cover2 — tile-min
    without materializing the distance matrix, key-column re-gather) must
    equal the "cover" and "block" strategies element-for-element: hits,
    distances, indices, validity, tie order — including zero (invalid) key
    rows, a searchable prefix, tie values, and the non-divisible tile pad."""
    import jax.numpy as jnp

    from contour_context_tpu.db import TOPK_BLOCK, _search_impl

    rng = np.random.default_rng(11)
    A, D, L = 6, 10, 6
    N = (4 * TOPK_BLOCK) // A + 35          # NA non-divisible by TOPK_TILE
    NA = N * A
    keys = rng.uniform(0.5, 4.0, (L, D, NA)).astype(np.float32)
    keys[:, :, ::5] = np.round(keys[:, :, ::5] * 2) / 2     # value ties
    keys[:, :, 7::13] = 0.0                                 # invalid rows
    q_keys = rng.uniform(0.5, 4.0, (L, A, D)).astype(np.float32)
    q_keys[2, 3] = 0.0                                      # invalid anchor
    # plant exact duplicates of a query key -> distance-0 ties
    keys[1, :, 1200] = q_keys[1, 0]
    keys[1, :, 1201] = q_keys[1, 0]
    searchable = jnp.int32(N - 50)
    out = {}
    for strategy in ("block", "cover", "cover2"):
        out[strategy] = _search_impl(jnp.asarray(keys), jnp.asarray(q_keys),
                                     searchable, (1, 2, 3), 50, strategy)
    for strategy in ("cover", "cover2"):
        for a, b, nm in zip(out["block"], out[strategy],
                            ("gidx", "seq", "dist", "valid")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=f"{strategy}:{nm}")
    # the planted duplicates are found, in index order
    g, s, d, v = (np.asarray(x) for x in out["cover2"])
    assert v[0, 0, 0] and v[0, 0, 1]
    assert (g[0, 0, 0], s[0, 0, 0]) == (200, 0) and d[0, 0, 0] == 0.0
    assert (g[0, 0, 1], s[0, 0, 1]) == (200, 1) and d[0, 0, 1] == 0.0


def test_topk_min_k_above_block_falls_back():
    """k > TOPK_BLOCK (e.g. range_search cap > 4096) must fall back to the
    exact single-stage path: stage 1 of the two-stage reduction cannot
    return k winners from a TOPK_BLOCK-wide tile (XLA rejects top_k with
    k beyond the axis size)."""
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import TOPK_BLOCK, _topk_min

    rng = np.random.default_rng(3)
    M = 4 * TOPK_BLOCK                      # two-stage territory by width
    k = TOPK_BLOCK + 17
    d = jnp.asarray(rng.uniform(0.0, 4.0, (1, M)).astype(np.float32))
    got_d, got_i = _topk_min(d, k)
    ref_neg, ref_idx = jax.lax.top_k(-d, k)
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(got_d), np.asarray(-ref_neg))


@pytest.mark.slow
def test_db_grow():
    world, descs = _descs(6)
    db = ContourDB(CFG, capacity=4)
    for i, d in enumerate(descs):
        db.add_scan(d, i, 6.0 * i)      # grows past 4 at i=4
        db.push_and_balance(6.0 * i)
    assert db.capacity >= 6 and db.n == 6

    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   CFG.cm.max_points), CFG.cm, CFG.gmm)
    r = db.query_ranged_knn(q)
    assert r is not None and db.seq_of_gidx[r[0]] == 1, r


def _assert_keys_q_invariant(db):
    """The maintained search-layout copy must stay BIT-identical to the
    layout derived from the scan-major store (db._keys_to_q_layout, at the
    maintained copy's dtype — bf16 under the keys_bf16 default) — the
    invariant every search path relies on."""
    from contour_context_tpu.db import _keys_to_q_layout

    got = np.asarray(db.keys_q)
    want = np.asarray(_keys_to_q_layout(db.store.keys, db.keys_q.dtype))
    np.testing.assert_array_equal(got, want)


def test_keys_q_maintained_through_stream_grow_checkpoint_merge(tmp_path):
    """keys_q (the incrementally-maintained (L, D, cap*A) search layout)
    stays bit-identical to the derived layout across every mutation path:
    per-scan appends, capacity growth, checkpoint round-trip, and merge."""
    world, descs = _descs(6)
    db = ContourDB(CFG, capacity=4)
    for i, d in enumerate(descs):
        db.add_scan(d, i, 6.0 * i)          # add_scan path + grow at i=4
        db.push_and_balance(6.0 * i)
    _assert_keys_q_invariant(db)

    p = str(tmp_path / "kq.npz")
    db.save(p)
    db2 = ContourDB.load(p, CFG)            # load derives keys_q
    _assert_keys_q_invariant(db2)

    merged = ContourDB.merge([db, db2])     # merge derives keys_q
    _assert_keys_q_invariant(merged)
    """Capacity growth mid-stream through the fused one-dispatch step."""
    world = make_world(11, n_structs=220, extent=160.0)
    db = ContourDB(CFG, capacity=4)
    for i in range(6):
        pts = pad_points(render_scan(world, (10.0 * i, 0.0, 0.0), seed=500 + i),
                         CFG.cm.max_points)
        db.step_async(pts, i, 6.0 * i)      # grows past 4 at i=4
    assert db.capacity >= 6 and db.n == 6

    pts = pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                     CFG.cm.max_points)
    r = db.step_async(pts, 6, 36.0).get()
    assert r is not None and db.seq_of_gidx[r[0]] == 1, r


@pytest.mark.slow
def test_localize_block_matches_per_scan():
    """Map-serving mode: one batched dispatch over B query clouds ==
    per-scan query_async against the same frozen store; store unchanged."""
    import jax

    world, descs = _descs(8)
    db = ContourDB(CFG, capacity=8)
    for i, d in enumerate(descs):
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)

    q_pts = np.stack([
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   CFG.cm.max_points),          # revisit of scan 1
        pad_points(render_scan(world, (20.3, -0.5, -0.1), seed=901),
                   CFG.cm.max_points),          # revisit of scan 2
        pad_points(render_scan(world, (500.0, 500.0, 0.0), seed=902),
                   CFG.cm.max_points),          # nowhere
    ])
    n_before = db.n
    state_before = np.asarray(jax.device_get(db.state))
    stream_counters_before = dict(db.counters)
    blk = db.localize_block_async(q_pts).get()
    assert db.n == n_before
    np.testing.assert_array_equal(np.asarray(jax.device_get(db.state)),
                                  state_before)
    # serving traffic lands in serving_counters, not the stream's
    assert db.counters == stream_counters_before
    assert db.serving_counters["n_hints"] > 0

    for b in range(q_pts.shape[0]):
        d = build_descriptor(q_pts[b], CFG.cm, CFG.gmm)
        ref = db.query_async(d).get()
        if ref is None:
            assert blk[b] is None, (b, blk[b])
        else:
            assert blk[b] is not None, b
            assert blk[b][0] == ref[0], (b, blk[b], ref)
            np.testing.assert_allclose(blk[b][1], ref[1], rtol=1e-4)
            np.testing.assert_allclose(blk[b][2], ref[2], rtol=1e-4, atol=1e-4)
    assert blk[0] is not None and db.seq_of_gidx[blk[0][0]] == 1
    assert blk[2] is None


@pytest.mark.slow
def test_sharded_query_matches_single():
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import _query_step, _unpack_record
    from contour_context_tpu.parallel import (
        make_mesh, shard_store, sharded_query_step)

    world, descs = _descs(8)
    db = ContourDB(CFG, capacity=16)    # 16 rows over 8 devices = 2 each
    for i, d in enumerate(descs):
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)
    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   CFG.cm.max_points), CFG.cm, CFG.gmm)

    rec_1 = np.asarray(jax.device_get(_query_step(db.store, q, db.state, CFG)))

    mesh = make_mesh(jax.devices()[:8])
    sh_store = shard_store(db.store, mesh)
    rec_8 = np.asarray(jax.device_get(
        sharded_query_step(sh_store, q, jnp.asarray(db.state), CFG, mesh)))

    r1, r8 = _unpack_record(rec_1), _unpack_record(rec_8)
    assert r8.found == r1.found and r1.found
    assert r8.gidx == r1.gidx
    np.testing.assert_allclose(r8.corr, r1.corr, rtol=1e-4)
    np.testing.assert_allclose(r8.T, r1.T, rtol=1e-4, atol=1e-5)
    assert (r8.n_hints, r8.aft1, r8.aft3) == (r1.n_hints, r1.aft1, r1.aft3)


def test_select_hints_overflow_prioritizes_nearest():
    """Hint-cap selection: exact positional parity under the cap; nearest-by-
    key-distance survivors (still in positional order) under overflow."""
    import jax.numpy as jnp

    from contour_context_tpu.db import _select_hints

    rng = np.random.default_rng(0)
    H = 40
    valid = rng.random(H) < 0.6
    dist = rng.random(H).astype(np.float32)
    n_valid = int(valid.sum())

    # under / at the cap: selection == positional compaction of ALL valid hits
    for HC in (n_valid, H):
        perm, hv, nv, ovf = _select_hints(
            jnp.asarray(valid), jnp.asarray(dist), HC)
        perm, hv = np.asarray(perm), np.asarray(hv)
        assert (int(nv), int(ovf)) == (n_valid, 0)
        np.testing.assert_array_equal(perm[hv], np.flatnonzero(valid))

    # overflow: the HC nearest valid hits survive, in positional order
    HC2 = n_valid // 2
    perm2, hv2, nv2, ovf2 = _select_hints(
        jnp.asarray(valid), jnp.asarray(dist), HC2)
    perm2, hv2 = np.asarray(perm2), np.asarray(hv2)
    assert int(ovf2) == n_valid - HC2 and int(hv2.sum()) == HC2
    vi = np.flatnonzero(valid)
    expect = vi[np.argsort(dist[valid], kind="stable")][:HC2]
    kept = perm2[hv2]
    assert set(kept.tolist()) == set(expect.tolist())
    assert np.all(np.diff(kept) > 0)


def test_merge_budget_overflow_prioritizes_votes():
    """merge_proposals under merge-budget overflow keeps the strongest
    passing hints (by constellation vote count), in positional order."""
    import jax.numpy as jnp

    from contour_context_tpu.ops.candidate import merge_proposals

    H, P = 8, 8
    pass3 = jnp.ones(H, bool)
    gidx = jnp.arange(H, dtype=jnp.int32)          # distinct candidate rows
    T = jnp.stack([jnp.arange(H, dtype=jnp.float32) * 10.0,
                   jnp.zeros(H), jnp.zeros(H)], axis=1)
    # hint i carries i+1 valid pairs -> votes ascend with i
    pair_valid = jnp.arange(P)[None, :] < (jnp.arange(H)[:, None] + 1)
    pair_level = jnp.full((H, P), 1, jnp.int32)
    pair_seq = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None], (H, P))
    pair_perc = jnp.full((H, P), 0.05, jnp.float32)

    st = merge_proposals(pass3, gidx, T, pair_valid, pair_level,
                         pair_seq, pair_seq, pair_perc,
                         n_cand_max=8, n_pass_max=4)
    assert int(st.overflow_pass) == 4
    # hints 4..7 (most votes) survive, merged in positional order
    np.testing.assert_array_equal(np.asarray(st.cand_gidx[:4]), [4, 5, 6, 7])
    assert int(st.n_cand) == 4

    # no overflow: all hints survive in positional order
    st2 = merge_proposals(pass3, gidx, T, pair_valid, pair_level,
                          pair_seq, pair_seq, pair_perc,
                          n_cand_max=8, n_pass_max=8)
    assert int(st2.overflow_pass) == 0
    np.testing.assert_array_equal(np.asarray(st2.cand_gidx), np.arange(8))


@pytest.mark.slow
def test_range_search_vs_numpy_oracle():
    """range_search (layerRangeSearch analog, contour_db.h:204-216) returns
    exactly the searchable keys within the radius, ascending distance."""
    world, descs = _descs(6)
    db = ContourDB(CFG, capacity=8)
    for i, d in enumerate(descs):
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)
    assert db.searchable_n > 0

    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   CFG.cm.max_points), CFG.cm, CFG.gmm)
    r2 = 16.0
    hits, n_total = db.range_search(q, r2)
    assert n_total > 0        # vacuous otherwise

    # numpy oracle over the same key matrix + temporal mask
    keys = np.asarray(db.store.keys)            # (N, L, A, 10)
    qk = np.asarray(q.keys)                     # (L, A, 10)
    expect = set()
    for lev in CFG.db.q_levels:
        for a in range(qk.shape[1]):
            if np.abs(qk[lev, a]).sum() == 0:
                continue
            for g in range(db.searchable_n):
                for s in range(keys.shape[2]):
                    row = keys[g, lev, s]
                    if np.abs(row).sum() == 0:
                        continue
                    d2 = float(((row - qk[lev, a]) ** 2).sum())
                    if d2 < r2:
                        expect.add((g, lev, s, a))
    got = {(h[0], h[1], h[2], h[3]) for h in hits}
    assert n_total == len(expect)
    assert got == expect
    dists = [h[4] for h in hits]
    assert dists == sorted(dists)
    for g, lev, s, a, d2 in hits:
        ref = float(((keys[g, lev, s] - qk[lev, a]) ** 2).sum())
        # |q|^2+|r|^2-2qr in f32 cancels vs the oracle's direct diff^2
        np.testing.assert_allclose(d2, ref, rtol=2e-3, atol=2e-3)

    # cap truncation still reports the full in-range count
    hits2, n2 = db.range_search(q, r2, cap=2)
    assert n2 == n_total and len(hits2) == min(2, n_total)

    # an over-wide radius clamps at MAX_DIST_SQ: the masked sentinel rows
    # (invalid keys / unsearchable scans) must never surface as hits
    hits3, n3 = db.range_search(q, 1e12, cap=4096)
    assert n3 == len(expect_all := {
        (g, lev, s, a)
        for lev in CFG.db.q_levels
        for a in range(qk.shape[1]) if np.abs(qk[lev, a]).sum() > 0
        for g in range(db.searchable_n)
        for s in range(keys.shape[2]) if np.abs(keys[g, lev, s]).sum() > 0})
    assert {(h[0], h[1], h[2], h[3]) for h in hits3} == expect_all


def test_range_search_big_store_two_stage():
    """_range_search at a store size where _topk_min takes the two-stage
    path (flat width >= 4*TOPK_BLOCK): counts, membership and ascending
    order must match a vectorized numpy oracle."""
    import jax.numpy as jnp

    from contour_context_tpu.db import TOPK_BLOCK, _range_search

    rng = np.random.default_rng(5)
    N, L, A, D = 512, 6, 6, 10
    q_levels = (1, 2, 3)
    assert 3 * A * N * A >= 4 * TOPK_BLOCK
    keys = rng.uniform(0.1, 5.0, (N, L, A, D)).astype(np.float32)
    keys[::9] = 0.0                      # invalid rows
    qk = rng.uniform(0.1, 5.0, (L, A, D)).astype(np.float32)
    searchable = 400
    r2 = 9.0
    cap = 64
    packed = np.asarray(_range_search(jnp.asarray(keys), jnp.asarray(qk),
                                      jnp.int32(searchable), jnp.float32(r2),
                                      q_levels, cap))
    n_total = int(packed[0, 0]) * (1 << 20) + int(packed[0, 1])
    hits = packed[1:][packed[1:, 4] >= 0]

    # oracle: q (lev, a) is compared only against DB rows of the SAME level
    # dims: (q_level_idx, q_anchor, scan, db_anchor)
    d2_same = np.stack([
        (((keys[:searchable, lev][None] - qk[lev][:, None, None]) ** 2)
         .sum(-1)) for lev in q_levels])            # (Q, Aq, S, A)
    row_ok = np.stack([np.abs(keys[:searchable, lev]).sum(-1) > 0
                       for lev in q_levels])        # (Q, S, A)
    q_ok = np.stack([np.abs(qk[lev]).sum(-1) > 0 for lev in q_levels])
    inr = (d2_same < r2) & row_ok[:, None] & q_ok[..., None, None]
    assert n_total == int(inr.sum())
    got = {(int(h[0]), int(h[1]), int(h[2]), int(h[3])) for h in hits}
    expect_pairs = {(g, q_levels[qi], s, a)
                    for qi, a, g, s in zip(*np.nonzero(inr))}
    # cap truncation: got is the `cap` nearest of expect
    assert got <= expect_pairs
    assert len(hits) == min(cap, n_total)
    dd = [float(h[4]) for h in hits]
    assert dd == sorted(dd)
    if n_total > cap:
        thresh = sorted(d2_same[inr].tolist())[cap - 1]
        assert abs(dd[-1] - thresh) < 1e-2


@pytest.mark.slow
def test_bf16_keys_search_parity():
    """keys_bf16 keeps the maintained SEARCH-LAYOUT key copy (db.keys_q)
    bfloat16 (half the search HBM traffic) while the archived ScanDesc.keys
    stay exact f32; ranking perturbation is sub-percent, so the same loop
    is found with a near-identical score and pose."""
    import jax.numpy as jnp

    from contour_context_tpu.config import ContourManagerConfig as CMC

    cfg16 = PipelineConfig(cm=CMC(max_points=16384, keys_bf16=True))
    cfg32 = PipelineConfig(cm=CMC(max_points=16384, keys_bf16=False))
    world = make_world(11, n_structs=220, extent=160.0)

    results = {}
    for name, cfg in (("f32", cfg32), ("bf16", cfg16)):
        db = ContourDB(cfg, capacity=8)
        for i in range(6):
            pts = render_scan(world, (10.0 * i, 0.0, 0.0), seed=500 + i)
            d = build_descriptor(pad_points(pts, cfg.cm.max_points),
                                 cfg.cm, cfg.gmm)
            db.add_scan(d, i, 6.0 * i)
            db.push_and_balance(6.0 * i)
        # archived keys stay f32 either way; only the search copy narrows
        assert db.store.keys.dtype == jnp.float32
        assert db.keys_q.dtype == (jnp.bfloat16 if name == "bf16"
                                   else jnp.float32)
        q = build_descriptor(
            pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                       cfg.cm.max_points), cfg.cm, cfg.gmm)
        r = db.query_ranged_knn(q)
        assert r is not None
        results[name] = (db.seq_of_gidx[r[0]], r[1], r[2])

    assert results["f32"][0] == results["bf16"][0] == 1
    np.testing.assert_allclose(results["bf16"][1], results["f32"][1],
                               rtol=2e-2)
    np.testing.assert_allclose(results["bf16"][2], results["f32"][2],
                               rtol=2e-2, atol=2e-2)


def test_dense_pair_maps_first_insert_wins():
    """Duplicate (level, seq_src, seq_tgt) ids within one hint keep the
    FIRST pair's perc (reference setdefault, contour_db.h:305), not a sum."""
    import jax.numpy as jnp

    from contour_context_tpu.ops.candidate import (N_SEQ,
                                                   _dense_pair_maps_rows)

    pair_valid = jnp.array([[True, True, True, False]])
    pair_level = jnp.array([[1, 1, 2, 0]], jnp.int32)
    pair_seq = jnp.array([[3, 3, 4, 0]], jnp.int32)      # pairs 0,1 duplicate
    pair_perc = jnp.array([[0.10, 0.70, 0.20, 0.99]], jnp.float32)

    perc, taken = _dense_pair_maps_rows(pair_valid, pair_level, pair_seq,
                                        pair_seq, pair_perc)
    dup_id = 1 * (N_SEQ * N_SEQ) + 3 * N_SEQ + 3
    other_id = 2 * (N_SEQ * N_SEQ) + 4 * N_SEQ + 4
    assert bool(taken[0, dup_id]) and bool(taken[0, other_id])
    np.testing.assert_allclose(float(perc[0, dup_id]), 0.10)   # first wins
    np.testing.assert_allclose(float(perc[0, other_id]), 0.20)
    assert float(perc.sum()) == np.float32(0.10 + 0.20)


@pytest.mark.slow
def test_drain_after_get_no_double_count():
    """drain_handles must not re-accumulate counters for handles whose
    results were already fetched via get() (review regression)."""
    from contour_context_tpu.db import drain_handles

    world, descs = _descs(6)
    db = ContourDB(CFG, capacity=8)
    for i, d in enumerate(descs):
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)
    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   CFG.cm.max_points), CFG.cm, CFG.gmm)
    h = db.query_async(q)
    first = h.get()
    counters_after_get = dict(db.counters)
    assert counters_after_get["n_hints"] > 0
    res = drain_handles([h, None])
    assert res[0] == first and res[1] is None
    assert db.counters == counters_after_get


@pytest.mark.slow
def test_ring_drain_matches_per_handle_fetch():
    """The fused stream's records drain from the device record ring as ONE
    contiguous buffer (drain_handles fast path); every drained result must
    equal the record fetched directly from the handle's own `rec` buffer —
    across step_async scans, a process_block_async block (ring rows after a
    _grow), and a standalone query_async handle (non-ring fallback)."""
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import _unpack_record, drain_handles

    world, descs = _descs(8)
    db = ContourDB(CFG, capacity=6)          # forces a _grow mid-stream
    handles = []
    for i in range(5):
        pts = pad_points(render_scan(world, (10.0 * i, 0.0, 0.0),
                                     seed=500 + i), CFG.cm.max_points)
        handles.append(db.step_async(jnp.asarray(pts), i, float(6.0 * i)))
    bh = db.process_block_async(
        jax.tree.map(lambda *xs: jnp.stack(xs), *descs[5:8]),
        [5, 6, 7], np.asarray([30.0, 36.0, 42.0], np.float32))
    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   CFG.cm.max_points), CFG.cm, CFG.gmm)
    hq = db.query_async(q)
    assert hq.row is None and handles[0].row == 0 and bh.row0 == 5

    # direct per-buffer truth BEFORE draining (does not touch _host)
    direct = [_unpack_record(np.asarray(h.rec)) for h in handles + [hq]]
    direct_blk = [_unpack_record(r) for r in np.asarray(bh.recs)]

    res = drain_handles(handles + [hq])
    for r, d in zip(res, direct):
        if d.found:
            assert r is not None and r[0] == d.gidx
            np.testing.assert_allclose(r[1], d.corr, rtol=1e-6)
            np.testing.assert_array_equal(r[2], d.T)
        else:
            assert r is None
    for r, d in zip(bh.get(), direct_blk):
        if d.found:
            assert r is not None and r[0] == d.gidx
        else:
            assert r is None
    # the stream found at least one loop, so the ring carried real records
    assert any(r is not None for r in res) or any(d.found for d in direct_blk)
