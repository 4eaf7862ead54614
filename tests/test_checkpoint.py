"""DB checkpoint round-trip: save -> load -> identical query results."""

import numpy as np

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.db import ContourDB
from contour_context_tpu.ops.descriptor import build_descriptor
from contour_context_tpu.utils.io import pad_points


def test_save_load_roundtrip(tmp_path):
    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]

    db = ContourDB(cfg, capacity=16)
    for i, pose in enumerate(poses):
        pts = render_scan(world, pose, seed=500 + i)
        desc = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
        db.add_scan(desc, i, 6.0 * i)
        db.push_and_balance(6.0 * i)

    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   cfg.cm.max_points), cfg.cm, cfg.gmm)
    r0 = db.query_ranged_knn(q)
    assert r0 is not None

    path = str(tmp_path / "db.npz")
    db.save(path)
    db2 = ContourDB.load(path, cfg, capacity=32)   # grown capacity
    assert db2.n == db.n
    assert db2.seq_of_gidx == db.seq_of_gidx
    assert db2.searchable_n == db.searchable_n

    r1 = db2.query_ranged_knn(q)
    assert r1 is not None
    assert r1[0] == r0[0]
    np.testing.assert_allclose(r1[1], r0[1], rtol=1e-4)
    np.testing.assert_allclose(r1[2], r0[2], rtol=1e-4, atol=1e-5)

    # map serving from the checkpoint: batched localization on the restored
    # DB matches the original, including with a memory-bounding chunk size
    q_pts = np.stack([
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   cfg.cm.max_points),
        pad_points(render_scan(world, (20.3, -0.5, -0.1), seed=902),
                   cfg.cm.max_points),
        pad_points(render_scan(world, (500.0, 500.0, 0.0), seed=903),
                   cfg.cm.max_points),
    ])
    blk0 = db.localize_block_async(q_pts).get()
    blk1 = db2.localize_block_async(q_pts).get()
    blk2 = db2.localize_block_async(q_pts, chunk=2).get()   # 2 + tail(1)
    for a, b in ((blk0, blk1), (blk1, blk2)):
        for ra, rb in zip(a, b):
            if ra is None:
                assert rb is None
            else:
                assert rb is not None and ra[0] == rb[0]
                np.testing.assert_allclose(ra[1], rb[1], rtol=1e-4)
                np.testing.assert_allclose(ra[2], rb[2], rtol=1e-4, atol=1e-5)
    assert blk0[0] is not None and db.seq_of_gidx[blk0[0][0]] == 1

    # the restored DB keeps streaming: appends + window updates still work
    pts = render_scan(world, (80.0, 0.0, 0.0), seed=901)
    desc = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
    db2.add_scan(desc, 8, 48.0)
    db2.push_and_balance(48.0)
    assert db2.n == db.n + 1
    assert db2.searchable_n >= db.searchable_n


def test_save_keeps_epoch_scale_ts_exact(tmp_path):
    """Absolute epoch-scale timestamps (~1.7e9 s) round-trip through save/load
    at f64 precision via the host ts list; the f32 device ts_store alone would
    quantize them by ~100 s (r1 advisor finding)."""
    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=2048))
    world = make_world(3, n_structs=40, extent=60.0)
    db = ContourDB(cfg, capacity=8)
    stamps = [1.7e9 + 0.1 * i for i in range(4)]
    for i, t in enumerate(stamps):
        pts = render_scan(world, (5.0 * i, 0.0, 0.0), seed=40 + i)
        desc = build_descriptor(pad_points(pts, cfg.cm.max_points),
                                cfg.cm, cfg.gmm)
        db.add_scan(desc, i, t)          # host-float ts populates db.ts
    path = str(tmp_path / "ts.npz")
    db.save(path)
    db2 = ContourDB.load(path, cfg)
    assert db2.ts == stamps              # exact, not f32-quantized
    # delta chain preserves the same precision
    pts = render_scan(world, (20.0, 0.0, 0.0), seed=50)
    desc = build_descriptor(pad_points(pts, cfg.cm.max_points),
                            cfg.cm, cfg.gmm)
    db.add_scan(desc, 4, 1.7e9 + 0.45)
    p2 = str(tmp_path / "ts_delta.npz")
    db.save(p2, since=4)
    db3 = ContourDB.load_chain([path, p2], cfg)
    assert db3.ts == stamps + [1.7e9 + 0.45]


def test_streamed_save_roundtrip_32k_rows(tmp_path):
    """City-scale checkpoint: 32768 rows saved through the streaming writer
    (many small device fetches, bounded host memory) round-trip bit-exact
    through load(), including a delta chain (r1 weak #6 / next-round #7).

    Uses a tiny per-row layout so the test is CI-sized; the row COUNT, the
    chunked fetch path and the zip streaming are exactly the city-scale
    code path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from contour_context_tpu.config import GMMOptConfig

    cfg = PipelineConfig(
        cm=ContourManagerConfig(n_row=32, n_col=32, max_points=512,
                                max_contours=8),
        gmm=GMMOptConfig(max_gmm_ellipses=8))
    world = make_world(9, n_structs=30, extent=30.0)
    desc = build_descriptor(
        pad_points(render_scan(world, (0.0, 0.0, 0.0), seed=1,
                               max_range=30.0), cfg.cm.max_points),
        cfg.cm, cfg.gmm)
    N = 32768
    db = ContourDB(cfg, capacity=N)
    db._init_store(desc)
    db.store = jax.tree.map(
        lambda z, x: jnp.broadcast_to(x[None], (N,) + x.shape).astype(z.dtype)
        + jnp.zeros_like(z),
        db.store, desc)
    db.ts_store = jnp.arange(N, dtype=jnp.float32)
    db.state = jnp.asarray([N, N - 32], jnp.int32)
    db.n = N
    db.seq_of_gidx = list(range(N))

    path = str(tmp_path / "big.npz")
    db.save(path, chunk_bytes=1 << 20)        # forces many fetch blocks
    db2 = ContourDB.load(path, cfg, capacity=N)
    assert db2.n == N and db2.searchable_n == N - 32
    for a, b in zip(jax.tree.leaves(db.store), jax.tree.leaves(db2.store)):
        np.testing.assert_array_equal(np.asarray(a[:N]), np.asarray(b[:N]))
    np.testing.assert_array_equal(np.asarray(db2.ts_store[:N]),
                                  np.asarray(db.ts_store[:N]))

    # delta chain on top of the streamed base
    desc2 = build_descriptor(
        pad_points(render_scan(world, (5.0, 0.0, 0.0), seed=2,
                               max_range=30.0), cfg.cm.max_points),
        cfg.cm, cfg.gmm)
    db2._grow(N + 8)
    db2.add_scan(desc2, N, float(N) + 10.0)
    p2 = str(tmp_path / "big_delta.npz")
    db2.save(p2, since=N, chunk_bytes=1 << 20)
    db3 = ContourDB.load_chain([path, p2], cfg, capacity=N + 8)
    assert db3.n == N + 1
    for a, b in zip(jax.tree.leaves(db2.store), jax.tree.leaves(db3.store)):
        np.testing.assert_array_equal(np.asarray(a[: N + 1]),
                                      np.asarray(b[: N + 1]))


def test_load_migrates_legacy_dtypes(tmp_path):
    """Checkpoints written before the HBM-compact dtypes (int32 neighbor
    tables / counts) must load and keep accepting appends."""
    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)

    db = ContourDB(cfg, capacity=8)
    for i in range(6):
        pts = render_scan(world, (10.0 * i, 0.0, 0.0), seed=500 + i)
        d = build_descriptor(pad_points(pts, cfg.cm.max_points),
                             cfg.cm, cfg.gmm)
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)
    p = str(tmp_path / "map.npz")
    db.save(p)

    # rewrite the store leaves in the legacy (pre-compaction) dtypes
    z = dict(np.load(p))
    from contour_context_tpu.types import ScanDesc
    for i, name in enumerate(ScanDesc._fields):
        a = z.get(f"store_{i}")        # derived leaves (tab12) are not saved
        if a is not None and a.dtype in (np.int8, np.int16):
            z[f"store_{i}"] = a.astype(np.int32)
    legacy = str(tmp_path / "legacy.npz")
    np.savez(legacy, **z)

    db2 = ContourDB.load(legacy, cfg)
    import jax.numpy as jnp
    assert db2.store.nei_level.dtype == jnp.int8
    assert db2.store.cnt.dtype == jnp.int16
    # appending freshly-built (compact-dtype) descriptors must work
    pts = render_scan(world, (60.0, 0.0, 0.0), seed=506)
    d = build_descriptor(pad_points(pts, cfg.cm.max_points), cfg.cm, cfg.gmm)
    db2.add_scan(d, 6, 36.0)
    db2.push_and_balance(36.0)
    assert db2.n == 7

    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   cfg.cm.max_points), cfg.cm, cfg.gmm)
    r = db2.query_ranged_knn(q)
    assert r is not None and db2.seq_of_gidx[r[0]] == 1


def test_load_recomputes_tab12(tmp_path):
    """The derived tab12 leaf is NOT persisted (r4 advisor: load recomputes
    it unconditionally, so stored bytes were dead weight), and the pre-r4
    migration path (file without the trailing leaf -> zero-fill -> tab12_of
    recompute) must reproduce build_descriptor's packed table bit-exactly."""
    from contour_context_tpu.types import ScanDesc

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)

    db = ContourDB(cfg, capacity=8)
    descs = []
    for i in range(6):
        pts = render_scan(world, (10.0 * i, 0.0, 0.0), seed=500 + i)
        d = build_descriptor(pad_points(pts, cfg.cm.max_points),
                             cfg.cm, cfg.gmm)
        descs.append(d)
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)
    p = str(tmp_path / "map.npz")
    db.save(p)

    # new saves omit the derived leaf entirely
    tab12_idx = ScanDesc._fields.index("tab12")
    z = np.load(p)
    assert f"store_{tab12_idx}" not in z.files
    # ... and load rebuilds it to exactly what build_descriptor packed
    db2 = ContourDB.load(p, cfg)
    for i, d in enumerate(descs):
        np.testing.assert_array_equal(np.asarray(db2.store.tab12[i]),
                                      np.asarray(d.tab12))

    # legacy (pre-r5) file WITH a persisted tab12 leaf — even a stale one —
    # loads with the recomputed values, not the stored bytes
    zd = dict(z)
    stale = np.zeros((db.n,) + tuple(descs[0].tab12.shape), np.float32)
    zd[f"store_{tab12_idx}"] = stale
    legacy = str(tmp_path / "legacy.npz")
    np.savez(legacy, **zd)
    db3 = ContourDB.load(legacy, cfg)
    for i, d in enumerate(descs):
        np.testing.assert_array_equal(np.asarray(db3.store.tab12[i]),
                                      np.asarray(d.tab12))

    # the restored DB queries identically to the original (tab12 feeds the
    # cascade's check-3 lookup)
    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   cfg.cm.max_points), cfg.cm, cfg.gmm)
    r0, r1 = db.query_ranged_knn(q), db3.query_ranged_knn(q)
    assert r0 is not None and r1 is not None and r0[0] == r1[0]
    np.testing.assert_allclose(r0[1], r1[1], rtol=1e-6)


def test_merge_sessions_serving_map(tmp_path):
    """ContourDB.merge composes two session maps into one frozen serving
    map: results against the merged map match querying the owning session's
    map alone, and gidx maps back to (session, seq)."""
    import jax.numpy as jnp

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)

    def build_session(x0, n, seed0):
        db = ContourDB(cfg, capacity=8)
        for i in range(n):
            pts = render_scan(world, (x0 + 10.0 * i, 0.0, 0.0), seed=seed0 + i)
            d = build_descriptor(pad_points(pts, cfg.cm.max_points),
                                 cfg.cm, cfg.gmm)
            db.add_scan(d, i, 6.0 * i)
            db.push_and_balance(6.0 * i)
        return db

    db_a = build_session(0.0, 4, 500)       # covers x = 0..30
    db_b = build_session(100.0, 4, 600)     # covers x = 100..130

    merged = ContourDB.merge([db_a, db_b], cfg)
    assert merged.n == 8
    assert int(np.asarray(merged.state)[1]) == 8    # all rows searchable

    # a revisit inside session B's coverage
    q = build_descriptor(
        pad_points(render_scan(world, (110.4, 0.7, 0.15), seed=900),
                   cfg.cm.max_points), cfg.cm, cfg.gmm)
    r = merged.query_ranged_knn(q)
    assert r is not None
    sess, seq = merged.session_of_gidx[r[0]]
    assert sess == 1 and seq == 1, (sess, seq)

    # corr/T match querying session B alone with a fully-open window
    db_b.state = jnp.asarray([db_b.n, db_b.n], jnp.int32)
    r_b = db_b.query_ranged_knn(q)
    assert r_b is not None and db_b.seq_of_gidx[r_b[0]] == seq
    np.testing.assert_allclose(r[1], r_b[1], rtol=1e-4)
    np.testing.assert_allclose(r[2], r_b[2], rtol=1e-4, atol=1e-4)

    # a revisit inside session A's coverage resolves to session 0
    q2 = build_descriptor(
        pad_points(render_scan(world, (20.3, -0.5, -0.1), seed=901),
                   cfg.cm.max_points), cfg.cm, cfg.gmm)
    r2 = merged.query_ranged_knn(q2)
    assert r2 is not None and merged.session_of_gidx[r2[0]][0] == 0


def test_delta_checkpoint_chain(tmp_path):
    """save(since=k) writes only the new rows; load_chain restores the
    stream exactly (same query results and window state as a full save)."""
    import jax

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)

    db = ContourDB(cfg, capacity=16)

    def add(i):
        pts = render_scan(world, (10.0 * i, 0.0, 0.0), seed=500 + i)
        d = build_descriptor(pad_points(pts, cfg.cm.max_points),
                             cfg.cm, cfg.gmm)
        db.add_scan(d, i, 6.0 * i)
        db.push_and_balance(6.0 * i)

    for i in range(4):
        add(i)
    base = str(tmp_path / "base.npz")
    db.save(base)
    for i in range(4, 8):
        add(i)
    delta = str(tmp_path / "delta.npz")
    db.save(delta, since=4)

    # the delta holds only 4 rows
    zd = np.load(delta)
    assert int(zd["since"]) == 4 and zd["store_0"].shape[0] == 4

    full = str(tmp_path / "full.npz")
    db.save(full)

    db_chain = ContourDB.load_chain([base, delta], cfg)
    db_full = ContourDB.load(full, cfg)
    assert db_chain.n == db_full.n == 8
    np.testing.assert_array_equal(np.asarray(db_chain.state),
                                  np.asarray(db_full.state))
    np.testing.assert_array_equal(
        np.asarray(db_chain.ts_store), np.asarray(db_full.ts_store))

    q = build_descriptor(
        pad_points(render_scan(world, (10.5, 0.8, 0.2), seed=900),
                   cfg.cm.max_points), cfg.cm, cfg.gmm)
    r_c = db_chain.query_ranged_knn(q)
    r_f = db_full.query_ranged_knn(q)
    assert r_c is not None and r_f is not None
    assert r_c[0] == r_f[0] and db_chain.seq_of_gidx[r_c[0]] == 1
    np.testing.assert_allclose(r_c[1], r_f[1], rtol=1e-6)

    # gap detection
    import pytest
    with pytest.raises(AssertionError, match="chain gap"):
        ContourDB.load_chain([base, base], cfg)
