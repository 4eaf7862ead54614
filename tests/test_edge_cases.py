"""Degenerate inputs: empty scans, all-ground scans, queries against them."""

import numpy as np

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.db import ContourDB
from contour_context_tpu.ops.descriptor import build_descriptor
from contour_context_tpu.utils.io import pad_points

CFG = PipelineConfig(cm=ContourManagerConfig(max_points=16384))


def test_empty_and_flat_scans():
    import jax

    # completely empty scan: zero valid points
    empty = np.zeros((0, 3), np.float32)
    d = jax.device_get(build_descriptor(pad_points(empty, CFG.cm.max_points),
                                        CFG.cm, CFG.gmm))
    assert not np.asarray(d.valid).any()
    assert np.asarray(d.keys).sum() == 0
    assert np.isfinite(np.asarray(d.mean)).all()
    assert np.isfinite(float(d.auto_corr))

    # flat ground-only scan: nothing above the first height gate
    ang = np.linspace(0, 2 * np.pi, 3000).astype(np.float32)
    flat = np.stack([30 * np.cos(ang), 30 * np.sin(ang),
                     np.full_like(ang, -2.0)], axis=1)
    df = jax.device_get(build_descriptor(pad_points(flat, CFG.cm.max_points),
                                         CFG.cm, CFG.gmm))
    assert not np.asarray(df.valid).any()

    # a DB containing only degenerate scans answers queries with None
    db = ContourDB(CFG, capacity=8)
    d_dev = build_descriptor(pad_points(empty, CFG.cm.max_points),
                             CFG.cm, CFG.gmm)
    for i in range(3):
        db.add_scan(d_dev, i, 20.0 * i)
        db.push_and_balance(20.0 * i)
    world = make_world(3)
    q = build_descriptor(
        pad_points(render_scan(world, (0, 0, 0), seed=5), CFG.cm.max_points),
        CFG.cm, CFG.gmm)
    assert db.query_ranged_knn(q) is None
    # and a degenerate query against a real DB is also a clean no-match
    db2 = ContourDB(CFG, capacity=8)
    db2.add_scan(q, 0, 0.0)
    db2.push_and_balance(0.0)
    db2.add_scan(q, 1, 40.0)
    db2.push_and_balance(40.0)
    assert db2.query_ranged_knn(d_dev) is None
