"""Batched throughput mode vs the sequential per-scan path: exact parity.

The temporal exclusion window (>=15 s) makes intra-block queries independent
of each other; _process_block replays the per-scan window updates, so results
must match the sequential query/add/push loop record-for-record.
"""

import numpy as np
import pytest

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig, PipelineConfig
from contour_context_tpu.db import ContourDB
from contour_context_tpu.ops.descriptor import build_descriptor
from contour_context_tpu.utils.io import pad_points


@pytest.mark.slow
def test_block_matches_sequential():
    import jax
    import jax.numpy as jnp

    cfg = PipelineConfig(cm=ContourManagerConfig(max_points=16384))
    world = make_world(11, n_structs=220, extent=160.0)
    # out-and-back so later blocks contain genuine loop closures
    poses = [(10.0 * i, 0.0, 0.0) for i in range(8)]
    poses += [(10.0 * (7 - i) + 0.5, 0.8, 0.15) for i in range(8)]
    ts = [6.0 * i for i in range(len(poses))]

    descs = []
    for i, pose in enumerate(poses):
        pts = render_scan(world, pose, seed=500 + i)
        descs.append(build_descriptor(pad_points(pts, cfg.cm.max_points),
                                      cfg.cm, cfg.gmm))

    # sequential reference run
    db_seq = ContourDB(cfg, capacity=32)
    seq_results = []
    for i, d in enumerate(descs):
        h = db_seq.query_async(d)
        seq_results.append(h.get() if h is not None else None)
        db_seq.add_scan(d, i, ts[i])
        db_seq.push_and_balance(ts[i])

    # block mode, B=4
    db_blk = ContourDB(cfg, capacity=32)
    blk_results = []
    B = 4
    for b0 in range(0, len(descs), B):
        block = jax.tree.map(lambda *xs: jnp.stack(xs), *descs[b0:b0 + B])
        h = db_blk.process_block_async(
            block, list(range(b0, b0 + B)),
            np.asarray(ts[b0:b0 + B], np.float32))
        blk_results.extend(h.get())

    assert len(seq_results) == len(blk_results)
    n_found = 0
    for i, (rs, rb) in enumerate(zip(seq_results, blk_results)):
        if rs is None:
            assert rb is None, (i, rb)
            continue
        assert rb is not None, (i, rs)
        n_found += 1
        assert rs[0] == rb[0], (i, rs, rb)
        np.testing.assert_allclose(rb[1], rs[1], rtol=1e-4)
        np.testing.assert_allclose(rb[2], rs[2], rtol=1e-4, atol=1e-5)
    assert n_found >= 2, seq_results
    assert db_blk.n == db_seq.n
    assert db_blk.searchable_n == db_seq.searchable_n
