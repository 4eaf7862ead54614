"""Batched GMM L2 correlation + fixed-iteration Levenberg-Marquardt refinement.

Replaces the reference's per-candidate Ceres solve (correlation.h:157-238,
AutoDiffFirstOrderFunction + LBFGS, <=10 iters) with a batched 3-parameter
(x, y, theta) LM optimizer using jax.grad/jax.hessian — thousands of
query-candidate pairs per dispatch.

GMM data layout per scan (from ScanDesc, levels = GMMOptConfig.levels):
  mus  (G, K, 2), covs (G, K, 2, 2), ws (G, K) (0 where outside the 95%-area
  prefix), majax (G, K) = sqrt(lambda_max). Selected pairs are a (G, K, K)
  mask fixed at init (correlation.h:85-96).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from contour_context_tpu.config import GMMOptConfig


class GmmScan(NamedTuple):
    mus: jnp.ndarray    # (G, K, 2)
    covs: jnp.ndarray   # (G, K, 2, 2)
    ws: jnp.ndarray     # (G, K)
    majax: jnp.ndarray  # (G, K)
    auto_corr: jnp.ndarray  # ()


def l2_pairwise(mus1, covs1, ws1, mus2, covs2, ws2, scale: float):
    """Pairwise GMM L2 kernel values (correlation.h:125-152 inner term):
    w1_j w2_k / sqrt(det S) exp(-1/2 mu^T S^-1 mu), S = scale*(C1_j + C2_k).

    Shapes (..., K, 2) / (..., K, 2, 2) / (..., K) -> (..., K, K). The ONE
    implementation shared by the cost functor and the descriptor's
    auto-correlation (their numeric identity normalizes corr scores)."""
    S = scale * (covs1[..., :, None, :, :] + covs2[..., None, :, :, :])
    det = S[..., 0, 0] * S[..., 1, 1] - S[..., 0, 1] * S[..., 1, 0]
    dmu = mus1[..., :, None, :] - mus2[..., None, :, :]
    q = (S[..., 1, 1] * dmu[..., 0] ** 2
         - 2 * S[..., 0, 1] * dmu[..., 0] * dmu[..., 1]
         + S[..., 0, 0] * dmu[..., 1] ** 2) / jnp.maximum(det, 1e-12)
    return (ws1[..., :, None] * ws2[..., None, :]
            * jax.lax.rsqrt(jnp.maximum(det, 1e-12)) * jnp.exp(-0.5 * q))


def gmm_from_desc(desc, gmm_cfg: GMMOptConfig) -> GmmScan:
    lev = jnp.array(gmm_cfg.levels, jnp.int32)
    K = gmm_cfg.max_gmm_ellipses   # contours are area-sorted; the gmm_mask's
    # 95%-area prefix virtually never exceeds this (correlation.h:63-71)
    ws = jnp.where(desc.gmm_mask[lev][:, :K],
                   desc.cnt[lev][:, :K].astype(jnp.float32), 0.0)
    return GmmScan(
        mus=desc.mean[lev][:, :K],
        covs=desc.manual_cov[lev][:, :K],
        ws=ws,
        majax=jnp.sqrt(desc.eig_vals[lev][:, :K][..., 1]),
        auto_corr=desc.auto_corr,
    )


def select_pairs(src: GmmScan, tgt: GmmScan, T_init: jnp.ndarray) -> jnp.ndarray:
    """(G, K, K) bool mask of close pairs under T_init (correlation.h:85-96)."""
    x, y, th = T_init[0], T_init[1], T_init[2]
    c, s = jnp.cos(th), jnp.sin(th)
    mu_s = src.mus
    tx = c * mu_s[..., 0] - s * mu_s[..., 1] + x
    ty = s * mu_s[..., 0] + c * mu_s[..., 1] + y
    dx = tx[:, :, None] - tgt.mus[..., 0][:, None, :]
    dy = ty[:, :, None] - tgt.mus[..., 1][:, None, :]
    d = jnp.sqrt(dx * dx + dy * dy)
    thr = 3.0 * (src.majax[:, :, None] + tgt.majax[:, None, :])
    return (d < thr) & (src.ws[:, :, None] > 0) & (tgt.ws[:, None, :] > 0)


def gmm_cost(params: jnp.ndarray, src: GmmScan, tgt: GmmScan,
             sel: jnp.ndarray, scale: float) -> jnp.ndarray:
    """The Ceres cost functor (correlation.h:125-152): negative L2 product."""
    x, y, th = params[0], params[1], params[2]
    c, s = jnp.cos(th), jnp.sin(th)
    R = jnp.array([[c, -s], [s, c]])
    # rotated src covs: R C R^T, (G, K, 2, 2)
    RC = jnp.einsum("ab,gkbc->gkac", R, src.covs, precision=jax.lax.Precision.HIGHEST)
    RCRt = jnp.einsum("gkac,bc->gkab", RC, R, precision=jax.lax.Precision.HIGHEST)
    mu_s = src.mus
    tmus = jnp.stack([c * mu_s[..., 0] - s * mu_s[..., 1] + x,
                      s * mu_s[..., 0] + c * mu_s[..., 1] + y], axis=-1)
    val = l2_pairwise(tmus, RCRt, src.ws, tgt.mus, tgt.covs, tgt.ws, scale)
    return -jnp.sum(jnp.where(sel, val, 0.0))


def _corr_norm(src: GmmScan, tgt: GmmScan):
    return jnp.sqrt(jnp.maximum(src.auto_corr * tgt.auto_corr, 1e-12))


@functools.partial(jax.jit, static_argnames=("scale",))
def init_correlation(src_batch: GmmScan, tgt: GmmScan, T_init: jnp.ndarray,
                     scale: float = 2.0):
    """Batched initProblem evaluation (correlation.h:175-202).

    src_batch: GmmScan with leading batch dim C; tgt: single scan;
    T_init: (C, 3). Returns (corr (C,), sel (C, G, K, K)).
    """
    def one(src, T):
        sel = select_pairs(src, tgt, T)
        cost = gmm_cost(T, src, tgt, sel, scale)
        return -cost / _corr_norm(src, tgt), sel

    return jax.vmap(one)(src_batch, T_init)


@functools.partial(jax.jit, static_argnames=("scale", "iters"))
def optimize_correlation(src_batch: GmmScan, tgt: GmmScan, T_init: jnp.ndarray,
                         sel: jnp.ndarray, scale: float = 2.0, iters: int = 10):
    """Batched LM refinement of (x, y, theta), `iters` fixed iterations.

    Mirrors calcCorrelation (correlation.h:206-238) with LM in place of the
    Ceres LBFGS line-search (same smooth objective, same iteration budget).
    Returns (corr (C,), T_opt (C, 3)).
    """
    grad_fn = jax.grad(gmm_cost)

    def _solve3(A, b):
        """Closed-form 3x3 solve (adjugate/Cramer). jnp.linalg.solve lowers
        tiny LU factorizations to serialized while-loops on TPU; the LM
        system is 3x3 and damped PD, so the explicit cofactor form is one
        fused elementwise kernel instead."""
        c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
        c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
        c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
        c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
        c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
        c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
        c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
        c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
        c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
        adj = jnp.array([[c00, c10, c20], [c01, c11, c21], [c02, c12, c22]])
        return adj @ b / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)

    def one(src, T0, sel_i):
        def cost_f(p):
            return gmm_cost(p, src, tgt, sel_i, scale)

        def gg(p):
            return grad_fn(p, src, tgt, sel_i, scale)

        def step(carry, _):
            p, f, lam = carry
            # grad + Hessian in ONE vmapped forward-over-reverse pass (the
            # primal of each jvp IS the gradient; tangents are H's rows) —
            # jax.hessian plus a separate grad call re-ran the reverse pass
            gs, Hm = jax.vmap(lambda v: jax.jvp(gg, (p,), (v,)))(jnp.eye(3))
            g = gs[0]
            A = Hm + lam * jnp.eye(3)
            dp = _solve3(A + 1e-9 * jnp.eye(3), -g)
            p_new = p + dp
            f_new = cost_f(p_new)
            ok = (f_new < f) & jnp.all(jnp.isfinite(p_new))
            p = jnp.where(ok, p_new, p)
            f = jnp.where(ok, f_new, f)
            lam = jnp.where(ok, lam * 0.33, lam * 10.0)
            return (p, f, lam), None

        f0 = cost_f(T0)
        (p, f, _), _ = jax.lax.scan(step, (T0, f0, jnp.float32(1e-3)),
                                    None, length=iters)
        return -f / _corr_norm(src, tgt), p

    return jax.vmap(one)(src_batch, T_init, sel)
