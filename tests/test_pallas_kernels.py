"""Pallas ring-key kernel vs the XLA computation (interpret mode on CPU).

This file runs on a CPU backend even under CONT2_TEST_PLATFORM=axon:
every test here runs the kernels in pallas interpret mode, whose semantics
are platform-independent by construction — on the tunneled TPU the
interpreter's many tiny dispatches each pay the ~40 ms degraded-mode cost
(measured 2026-08-19: 2 tests in 45 min vs 29 in 2 min on CPU) for zero
added signal. Real-chip validation of the Mosaic-compiled kernel is the
separate isolated compile attempt recorded in PARITY.md.

The CPU pin is PROCESS-GLOBAL (jax.config.update at import, before backend
init), so it is only applied when it cannot leak onto other test files: in
plain CPU mode it is a no-op re-pin, and under scripts/run_suite.sh each
file owns its process (CONT2_FILE_ISOLATED=1). In a MONOLITHIC
CONT2_TEST_PLATFORM=axon run this module instead skips itself — previously
its import-time pin silently moved the entire on-chip suite to CPU
(advisor r3, severity medium).
"""

import os

import jax
import pytest

if (os.environ.get("CONT2_TEST_PLATFORM", "cpu") == "cpu"
        or os.environ.get("CONT2_FILE_ISOLATED", "0") == "1"):
    jax.config.update("jax_platforms", "cpu")
else:
    pytest.skip(
        "pallas interpret tests pin the whole process to CPU; under "
        "CONT2_TEST_PLATFORM=axon run them via scripts/run_suite.sh "
        "(per-file process isolation) so the pin cannot move the rest of a "
        "monolithic on-chip run off-chip", allow_module_level=True)

import dataclasses

import numpy as np

from synth import make_world, render_scan

from contour_context_tpu.config import ContourManagerConfig
from contour_context_tpu.utils.io import pad_points


def test_ring_kernel_unit():
    import jax.numpy as jnp

    from contour_context_tpu.ops.pallas_kernels import (
        ring_key_divs_pallas,
        ring_key_divs_reference,
    )

    rng = np.random.default_rng(0)
    A8, P, D = 8, 256, 35
    anchors = np.zeros((A8, 8), np.float32)
    anchors[:, 0] = rng.uniform(20, 120, A8)   # v0
    anchors[:, 1] = rng.uniform(20, 120, A8)   # v1
    anchors[:, 2] = anchors[:, 0] - 11         # r_min
    anchors[:, 3] = anchors[:, 0] + 11
    anchors[:, 4] = anchors[:, 1] - 11
    anchors[:, 5] = anchors[:, 1] + 11
    anchors[:, 6] = 1.0
    pool = np.zeros((P, 8), np.float32)
    pool[:, 2] = rng.uniform(0, 150, P)        # rowf
    pool[:, 3] = rng.uniform(0, 150, P)        # colf
    pool[:, 0] = np.floor(pool[:, 2])          # p_r (int cell)
    pool[:, 1] = np.floor(pool[:, 3])
    pool[:, 4] = rng.integers(0, 5, P)         # higher
    pool[:, 5] = (rng.random(P) < 0.8)         # ok
    centers = (np.arange(D, dtype=np.float32) + 0.5) * (10.0 / D)

    d_p, c_p = ring_key_divs_pallas(jnp.asarray(anchors), jnp.asarray(pool),
                                    jnp.asarray(centers), 10.0, D,
                                    interpret=True)
    d_r, c_r = ring_key_divs_reference(jnp.asarray(anchors), jnp.asarray(pool),
                                       jnp.asarray(centers), 10.0)
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_r))


def test_search_tilemin_pallas_matches_search_impl():
    """The Pallas fused distance+tile-min search (interpret mode) must equal
    db._search_impl element-for-element: gidx, seq, dist, valid — including
    invalid-key rows, the searchable cutoff, and duplicate distances."""
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.db import _keys_to_q_layout, _search_impl
    from contour_context_tpu.ops.pallas_kernels import search_tilemin_pallas

    rng = np.random.default_rng(4)
    N, L, A, D = 2048, 6, 6, 10
    QL = (1, 2, 3)
    NNK = 50
    kb = rng.uniform(0.1, 5.0, (N, L, A, D)).astype(np.float32)
    kb[::7] = 0.0                       # invalid rows
    kb[100:200] = kb[300:400]           # duplicated keys -> distance ties
    qk = rng.uniform(0.1, 5.0, (L, A, D)).astype(np.float32)
    qk[2, 3] = 0.0                      # an invalid query anchor
    sn = jnp.int32(1800)

    g0, s0, d0, v0 = [np.asarray(x) for x in _search_impl(
        _keys_to_q_layout(jnp.asarray(kb)), jnp.asarray(qk), sn, QL, NNK)]
    g1, s1, d1, v1 = [np.asarray(x) for x in search_tilemin_pallas(
        jnp.asarray(kb), jnp.asarray(qk), sn, QL, NNK, interpret=True,
        T=64, TC=1024)]
    # contract: identical valid masks and hit SETS; distances agree within
    # f32 contraction-order rounding (different dot layouts), so near-ties
    # may swap positions inside the ascending list
    np.testing.assert_array_equal(v0, v1)
    hits0 = {(q, a, int(g0[q, a, k]), int(s0[q, a, k]))
             for q, a, k in zip(*np.nonzero(v0))}
    hits1 = {(q, a, int(g1[q, a, k]), int(s1[q, a, k]))
             for q, a, k in zip(*np.nonzero(v1))}
    assert hits0 == hits1 and len(hits0) > 30
    np.testing.assert_allclose(d1[v0], d0[v0], rtol=1e-4, atol=1e-4)
    for q, a in zip(*np.nonzero(v0.any(-1))):
        dd = d1[q, a][v1[q, a]]
        assert list(dd) == sorted(dd)


def test_descriptor_keys_with_pallas_ring():
    """use_pallas_ring=True reproduces the default descriptor keys."""
    import jax

    from contour_context_tpu.ops.descriptor import build_descriptor

    cfg = ContourManagerConfig(max_points=16384)
    cfg_p = dataclasses.replace(cfg, use_pallas_ring=True)
    world = make_world(0)
    pts = pad_points(render_scan(world, (0.0, 0.0, 0.0), seed=1),
                     cfg.max_points)
    d0 = jax.device_get(build_descriptor(pts, cfg))
    d1 = jax.device_get(build_descriptor(pts, cfg_p))
    np.testing.assert_allclose(np.asarray(d1.keys), np.asarray(d0.keys),
                               rtol=1e-4, atol=1e-4)
