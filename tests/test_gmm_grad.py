"""Analytic GMM derivative parity: gmm_value_grad_hess vs AD of gmm_cost.

The LM refinement (ops/gmm.optimize_correlation) uses hand-derived value/
gradient/Hessian (one fused elementwise pass) instead of forward-over-reverse
AD; this pins the closed form against jax.grad / jax.hessian of the oracle-
tested cost functor on randomized realistic ellipse mixtures.
"""

import numpy as np

from contour_context_tpu.config import GMMOptConfig


def _rand_scan(rng, G=4, K=12):
    import jax.numpy as jnp

    from contour_context_tpu.ops.gmm import GmmScan

    mus = rng.uniform(10.0, 140.0, (G, K, 2)).astype(np.float32)
    # random PD 2x2 covs with the point-sigma floor (eigvals >= 1)
    th = rng.uniform(0, np.pi, (G, K))
    l0 = rng.uniform(1.0, 4.0, (G, K))
    l1 = l0 + rng.uniform(0.0, 20.0, (G, K))
    c, s = np.cos(th), np.sin(th)
    covs = np.empty((G, K, 2, 2), np.float32)
    covs[..., 0, 0] = c * c * l1 + s * s * l0
    covs[..., 0, 1] = covs[..., 1, 0] = c * s * (l1 - l0)
    covs[..., 1, 1] = s * s * l1 + c * c * l0
    ws = np.where(rng.random((G, K)) < 0.8,
                  rng.uniform(5.0, 400.0, (G, K)), 0.0).astype(np.float32)
    return GmmScan(mus=jnp.asarray(mus), covs=jnp.asarray(covs),
                   ws=jnp.asarray(ws),
                   majax=jnp.asarray(np.sqrt(l1).astype(np.float32)),
                   auto_corr=jnp.float32(1.0))


def test_gmm_value_grad_hess_matches_ad():
    import jax
    import jax.numpy as jnp

    from contour_context_tpu.ops.gmm import (gmm_cost, gmm_value_grad_hess,
                                             select_pairs)

    rng = np.random.default_rng(11)
    scale = GMMOptConfig().cov_dilate_scale
    for trial in range(4):
        src = _rand_scan(rng)
        tgt = _rand_scan(rng)
        p = jnp.asarray([rng.uniform(-8, 8), rng.uniform(-8, 8),
                         rng.uniform(-0.7, 0.7)], jnp.float32)
        sel = select_pairs(src, tgt, p)
        if int(jnp.sum(sel)) == 0:
            sel = (src.ws[:, :, None] > 0) & (tgt.ws[:, None, :] > 0)

        f, g, H = jax.jit(gmm_value_grad_hess, static_argnames=("scale",))(
            p, src, tgt, sel, scale)
        f_ref = gmm_cost(p, src, tgt, sel, scale)
        g_ref = jax.grad(gmm_cost)(p, src, tgt, sel, scale)
        H_ref = jax.hessian(gmm_cost)(p, src, tgt, sel, scale)

        np.testing.assert_allclose(float(f), float(f_ref), rtol=2e-5,
                                    err_msg=f"trial {trial}")
        sc = max(1e-3, float(jnp.max(jnp.abs(g_ref))))
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=2e-3, atol=2e-4 * sc,
                                   err_msg=f"trial {trial}")
        sh = max(1e-3, float(jnp.max(jnp.abs(H_ref))))
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                                   rtol=5e-3, atol=5e-4 * sh,
                                   err_msg=f"trial {trial}")
