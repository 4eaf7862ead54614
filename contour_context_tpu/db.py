"""ContourDB, TPU-native: device-resident descriptor store + batched query.

Replaces the reference's bucketed nanoflann kd-trees + sequential check cascade
(contour_db.h:54-845) with:

- a growing device-array store of ScanDesc rows (append = dynamic_update_slice
  with buffer donation, no host copies of history),
- brute-force masked top-k key search as one dispatch (the kd-tree + bucket
  fan-out of contour_db.cpp:319-379 returns the global top-k under a distance
  bound; dense top-k computes exactly that, a strict superset in recall),
- the temporal insertion delay (TreeBucket buffering, contour_db.h:102-143)
  modeled as a searchable prefix: keys of scan i become searchable once a pop
  is triggered (oldest unpopped ts <= t-max_elapse) and ts_i < t-min_elapse.
  The reference staggers pops per bucket by a few scans; the >=15 s exclusion
  window — the semantic contract used by gt labeling — is preserved exactly.
- one batched cascade dispatch over all hints (ops/cascade.py), then an exact
  host-side replica of CandidateManager's sequential proposal merging
  (contour_db.h:264-656), then batched GMM scoring (ops/gmm.py).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from contour_context_tpu.config import (
    DIST_BIN_LAYERS,
    LAYER_AREA_WEIGHTS,
    CandidateScoreEnsemble,
    PipelineConfig,
)
from contour_context_tpu.ops.cascade import run_cascade
from contour_context_tpu.ops.gmm import (
    GmmScan,
    init_correlation,
    optimize_correlation,
)
from contour_context_tpu.types import ScanDesc

MAX_DIST_SQ = 1e6  # contour_db.h:30


# ---------------------------------------------------------------------------
# device helpers (jitted once per shape)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, donate_argnums=0)
def _append(store: ScanDesc, desc: ScanDesc, idx) -> ScanDesc:
    return jax.tree.map(
        lambda buf, x: jax.lax.dynamic_update_index_in_dim(buf, x, idx, 0),
        store, desc)


@functools.partial(jax.jit, static_argnames=("q_levels", "nnk"))
def _search(db_keys, q_keys, searchable_n, q_levels: Tuple[int, ...], nnk: int):
    """db_keys (N, L, A, 10); q_keys (L, A, 10) -> hits per (q_level, seq).

    Returns (gidx, seq_src, dist, valid) each (Q, A, nnk), hits sorted by
    ascending distance, bounded by the per-key adaptive distance upper bound
    (contour_db.h:733-749) and by searchability.
    """
    N, L, A, D = db_keys.shape
    lv = jnp.array(q_levels, jnp.int32)
    rows = db_keys[:, lv].transpose(1, 0, 2, 3).reshape(len(q_levels), N * A, D)
    q = q_keys[lv]                                          # (Q, A, D)
    row_valid = jnp.abs(rows).sum(-1) > 0                   # (Q, N*A)
    scan_of_row = jnp.repeat(jnp.arange(N, dtype=jnp.int32), A)[None]
    searchable = scan_of_row < searchable_n
    q_valid = jnp.abs(q).sum(-1) > 0                        # (Q, A)

    d2 = jnp.sum((q[:, :, None, :] - rows[:, None, :, :]) ** 2, axis=-1)
    k0, k1, k2 = q[..., 0], q[..., 1], q[..., 2]
    ub = (jnp.maximum((k0 - k0 * 0.8) ** 2, (k0 - k0 / 0.8) ** 2)
          + jnp.maximum((k1 - k1 * 0.8) ** 2, (k1 - k1 / 0.8) ** 2)
          + jnp.maximum((k2 - k2 * 0.8 * 0.75) ** 2, (k2 - k2 / (0.8 * 0.75)) ** 2))
    ok = row_valid[:, None, :] & searchable[:, None, :] & q_valid[..., None]
    d2m = jnp.where(ok, d2, MAX_DIST_SQ)
    neg, idx = jax.lax.top_k(-d2m, nnk)                     # ascending distance
    dist = -neg
    valid = dist < jnp.minimum(ub[..., None], MAX_DIST_SQ)
    gidx = idx // A
    seq_src = idx % A
    return gidx.astype(jnp.int32), seq_src.astype(jnp.int32), dist, valid


def _tab_from(desc_like, gidx=None):
    """Build the (…, 4, J, ·) check-3 stats table from ScanDesc(-like) arrays.

    If gidx is given the leading index is per-hint; otherwise the query's own
    table (broadcast later). Levels rows = DIST_BIN_LAYERS; J = 10 seqs.
    """
    lv = jnp.array(DIST_BIN_LAYERS, jnp.int32)
    J = 10

    if gidx is None:
        sl = lambda a: a[lv, :J]
    else:
        sl = lambda a: a[gidx][:, lv, :J]
    return dict(
        cnt=sl(desc_like.cnt).astype(jnp.float32),
        eig=sl(desc_like.eig_vals),
        h=sl(desc_like.vol3_mean),
        comr=sl(desc_like.com_r),
        mean=sl(desc_like.mean),
        vec1=sl(desc_like.eig_vecs)[..., :, 1],
        ecc=sl(desc_like.ecc_feat),
        perc=sl(desc_like.cont_perc),
        ok=sl(desc_like.valid),
    )


@functools.partial(jax.jit, static_argnames=("thres_lb", "cont_sim"))
def _gather_and_cascade(store: ScanDesc, query: ScanDesc,
                        gidx, level, seq_src, seq_tgt, hint_valid,
                        thres_lb: CandidateScoreEnsemble, cont_sim):
    H = gidx.shape[0]
    hv = hint_valid
    gi = jnp.where(hv, gidx, 0)
    lvl = jnp.clip(level, 0, store.cnt.shape[1] - 1)
    ss = jnp.clip(seq_src, 0, store.cnt.shape[2] - 1)
    st = jnp.clip(seq_tgt, 0, query.cnt.shape[1] - 1)

    def at_src(a):
        return a[gi, lvl, ss]

    def at_tgt(a):
        return a[lvl, st]

    src_anchor = dict(cnt=at_src(store.cnt).astype(jnp.float32),
                      eig=at_src(store.eig_vals), h=at_src(store.vol3_mean),
                      comr=at_src(store.com_r))
    tgt_anchor = dict(cnt=at_tgt(query.cnt).astype(jnp.float32),
                      eig=at_tgt(query.eig_vals), h=at_tgt(query.vol3_mean),
                      comr=at_tgt(query.com_r))
    src_nei = dict(valid=at_src(store.nei_valid), level=at_src(store.nei_level),
                   seq=at_src(store.nei_seq), bit=at_src(store.nei_bit),
                   theta=at_src(store.nei_theta))
    tgt_nei = dict(valid=at_tgt(query.nei_valid), level=at_tgt(query.nei_level),
                   seq=at_tgt(query.nei_seq), bit=at_tgt(query.nei_bit),
                   theta=at_tgt(query.nei_theta))
    src_tab = _tab_from(store, gi)
    qt = _tab_from(query, None)
    tgt_tab = jax.tree.map(lambda a: jnp.broadcast_to(a[None], (H,) + a.shape), qt)

    return run_cascade(src_anchor, src_nei, src_tab, tgt_anchor, tgt_nei,
                       tgt_tab, hv, level, seq_src, seq_tgt,
                       thres_lb, cont_sim)


@functools.partial(jax.jit, static_argnames=("levels",))
def _gather_gmm(store: ScanDesc, gidx, levels: Tuple[int, ...]) -> GmmScan:
    lv = jnp.array(levels, jnp.int32)
    gm = store.gmm_mask[gidx][:, lv]
    return GmmScan(
        mus=store.mean[gidx][:, lv],
        covs=store.manual_cov[gidx][:, lv],
        ws=jnp.where(gm, store.cnt[gidx][:, lv].astype(jnp.float32), 0.0),
        majax=jnp.sqrt(store.eig_vals[gidx][:, lv][..., 1]),
        auto_corr=store.auto_corr[gidx],
    )


# ---------------------------------------------------------------------------
# host-side CandidateManager (exact replica of contour_db.h:264-656)
# ---------------------------------------------------------------------------

@dataclass
class AnchorProp:
    T: np.ndarray                      # (3,) x, y, theta
    constell: dict                     # {(lev, ss, st): perc} first-insert wins
    vote_cnt: int
    area_perc: float = 0.0
    correlation: float = 0.0


@dataclass
class CandidatePose:
    gidx: int
    props: List[AnchorProp] = field(default_factory=list)
    corr_init: float = 0.0
    sel: Optional[object] = None

    def add_proposal(self, T: np.ndarray, pairs, percs):
        """addProposal (contour_db.h:286-338): greedy merge within (2 m, 0.3 rad)."""
        for p in self.props:
            # delta = T_prop^-1 * T_i
            c, s = math.cos(T[2]), math.sin(T[2])
            dx, dy = p.T[0] - T[0], p.T[1] - T[1]
            tx = c * dx + s * dy
            ty = -s * dx + c * dy
            dth = p.T[2] - T[2]
            dth = (dth + math.pi) % (2 * math.pi) - math.pi
            if math.hypot(tx, ty) < 2.0 and abs(dth) < 0.3:
                for pr, pc in zip(pairs, percs):
                    p.constell.setdefault(pr, pc)
                w1, w2 = p.vote_cnt, len(pairs)
                p.vote_cnt = w1 + w2
                trans = (np.array(p.T[:2]) * w1 + np.array(T[:2]) * w2) / (w1 + w2)
                diff = T[2] - p.T[2]
                if diff < 0:
                    diff += 2 * math.pi
                if diff > math.pi:
                    diff -= 2 * math.pi
                ang = diff * w2 / (w1 + w2) + p.T[2]
                p.T = np.array([trans[0], trans[1], ang])
                return
        if len(self.props) > 3:
            return
        self.props.append(AnchorProp(np.asarray(T, np.float64).copy(),
                                     {pr: pc for pr, pc in zip(pairs, percs)},
                                     len(pairs)))


class HostCandidateManager:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.order: List[int] = []         # gidx in first-seen order
        self.by_gidx = {}

    def add_passing_hint(self, gidx: int, T: np.ndarray, pairs, percs):
        cand = self.by_gidx.get(gidx)
        if cand is None:
            cand = CandidatePose(gidx)
            self.by_gidx[gidx] = cand
            self.order.append(gidx)
        cand.add_proposal(T, pairs, percs)

    def tidy_candidates(self):
        """tidyUpCandidates screens 1-2 (contour_db.h:494-545): area % and
        distance censor. Returns candidates still alive (correlation screen is
        applied by the caller after the batched GMM evaluation)."""
        cfg = self.cfg
        alive = []
        for gidx in self.order:
            cand = self.by_gidx[gidx]
            idx_sel = 0
            for i, p in enumerate(cand.props):
                lev_perc = {}
                for (lev, ss, st), perc in p.constell.items():
                    lev_perc[lev] = lev_perc.get(lev, 0.0) + perc
                p.area_perc = sum(
                    LAYER_AREA_WEIGHTS[j] * lev_perc.get(DIST_BIN_LAYERS[j], 0.0)
                    for j in range(len(DIST_BIN_LAYERS)))
                if p.vote_cnt > cand.props[idx_sel].vote_cnt:
                    idx_sel = i
            cand.props[0], cand.props[idx_sel] = cand.props[idx_sel], cand.props[0]

            if cand.props[0].area_perc < cfg.thres_lb.sim_post.area_perc:
                continue
            # distance censor in the sensor frame (getEstSensTF, correlation.h:287-296)
            T = cand.props[0].T
            nr, nc = cfg.cm.n_row, cfg.cm.n_col
            ox = nr / 2 - 0.5
            oy = nc / 2 - 0.5
            c, s = math.cos(T[2]), math.sin(T[2])
            tx = c * ox - s * oy + T[0] - ox
            ty = s * ox + c * oy + T[1] - oy
            neg_d = -math.hypot(tx * cfg.cm.reso_row, ty * cfg.cm.reso_col)
            if neg_d < cfg.thres_lb.sim_post.neg_est_dist:
                continue
            alive.append(cand)
        return alive


# ---------------------------------------------------------------------------
# the DB itself
# ---------------------------------------------------------------------------

class ContourDB:
    """Top-level database (reference ContourDB, contour_db.h:658-845)."""

    def __init__(self, cfg: PipelineConfig, capacity: int = 8192):
        self.cfg = cfg
        self.capacity = capacity
        self.n = 0
        self.store: Optional[ScanDesc] = None
        self.ts: List[float] = []
        self.seq_of_gidx: List[int] = []
        # temporal insertion window (TreeBucket semantics, contour_db.h:102-143)
        self.pop_ptr = 0          # first scan index not yet popped to the trees
        self.searchable_n = 0
        self.max_fine = cfg.db.max_fine_opt
        self.gmm_pad = 32

    # -- maintenance ------------------------------------------------------

    def add_scan(self, desc: ScanDesc, seq: int, ts: float):
        if self.store is None:
            self.store = jax.tree.map(
                lambda x: jnp.zeros((self.capacity,) + x.shape, x.dtype), desc)
        assert self.n < self.capacity, "DB capacity exceeded"
        self.store = _append(self.store, desc, self.n)
        self.ts.append(ts)
        self.seq_of_gidx.append(seq)
        self.n += 1

    def push_and_balance(self, curr_ts: float):
        """Pop the buffer once the oldest unpopped scan exceeds max_elapse;
        everything older than min_elapse becomes searchable."""
        tb = self.cfg.db.tb
        if self.pop_ptr < self.n and self.ts[self.pop_ptr] <= curr_ts - tb.max_elapse:
            cut = curr_ts - tb.min_elapse
            k = self.pop_ptr
            while k < self.n and self.ts[k] < cut:
                k += 1
            self.pop_ptr = k
            self.searchable_n = k

    # -- query ------------------------------------------------------------

    def query_ranged_knn(self, query: ScanDesc, profiler=None):
        """queryRangedKNN (contour_db.h:698-811): returns at most one
        (cand_gidx, correlation, T_delta(3,)) or None."""
        cfg = self.cfg
        if self.searchable_n == 0 or self.store is None:
            return None

        q_levels = tuple(cfg.db.q_levels)
        nnk = cfg.db.nnk
        gidx, seq_src, dist, valid = _search(
            self.store.keys, query.keys, self.searchable_n, q_levels, nnk)
        if profiler:
            profiler.record("KNN search")

        Q, A, K = gidx.shape
        lv = np.array(q_levels, np.int32)
        level_h = np.broadcast_to(lv[:, None, None], (Q, A, K)).reshape(-1)
        seq_tgt_h = np.broadcast_to(np.arange(A, dtype=np.int32)[None, :, None],
                                    (Q, A, K)).reshape(-1)
        gidx_h = np.asarray(gidx).reshape(-1)
        seqs_h = np.asarray(seq_src).reshape(-1)
        valid_h = np.asarray(valid).reshape(-1)

        res = _gather_and_cascade(
            self.store, query,
            jnp.asarray(gidx_h), jnp.asarray(level_h), jnp.asarray(seqs_h),
            jnp.asarray(seq_tgt_h), jnp.asarray(valid_h),
            cfg.thres_lb, cfg.db.cont_sim)
        if profiler:
            profiler.record("Constell")

        pass3 = np.asarray(res.pass3)
        mgr = HostCandidateManager(cfg)
        if pass3.any():
            pv = np.asarray(res.pair_valid)
            plev = np.asarray(res.pair_level)
            pss = np.asarray(res.pair_seq_src)
            pst = np.asarray(res.pair_seq_tgt)
            pperc = np.asarray(res.pair_area_perc)
            T_all = np.asarray(res.T_delta)
            for h in np.flatnonzero(pass3):
                sel = np.flatnonzero(pv[h])
                pairs = [(int(plev[h, i]), int(pss[h, i]), int(pst[h, i]))
                         for i in sel]
                percs = [float(pperc[h, i]) for i in sel]
                mgr.add_passing_hint(int(gidx_h[h]), T_all[h].astype(np.float64),
                                     pairs, percs)

        alive = mgr.tidy_candidates()
        if not alive:
            if profiler:
                profiler.record("L2 opt")
            return None

        # batched GMM init correlation (screen 3/3 of tidyUpCandidates)
        C = len(alive)
        pad = max(self.gmm_pad, C)
        cg = np.zeros(pad, np.int32)
        Ti = np.zeros((pad, 3), np.float32)
        for i, cand in enumerate(alive):
            cg[i] = cand.gidx
            Ti[i] = cand.props[0].T
        src_gmm = _gather_gmm(self.store, jnp.asarray(cg), tuple(cfg.gmm.levels))
        from contour_context_tpu.ops.gmm import gmm_from_desc
        tgt_gmm = gmm_from_desc(query, cfg.gmm)
        corr0, sel = init_correlation(src_gmm, tgt_gmm, jnp.asarray(Ti),
                                      scale=cfg.gmm.cov_dilate_scale)
        corr0 = np.asarray(corr0)

        keep = [i for i in range(C) if corr0[i] >= cfg.thres_lb.sim_post.correlation]
        if not keep:
            if profiler:
                profiler.record("L2 opt")
            return None
        # fineOptimize (contour_db.h:604-648): refine up to max_fine_opt
        keep = keep[: self.max_fine]
        kidx = jnp.asarray(np.asarray(keep, np.int32))
        corr_f, T_f = optimize_correlation(
            jax.tree.map(lambda a: a[kidx], src_gmm), tgt_gmm,
            jnp.asarray(Ti)[kidx], sel[kidx],
            scale=cfg.gmm.cov_dilate_scale, iters=cfg.gmm.gn_iters)
        corr_f = np.asarray(corr_f)
        T_f = np.asarray(T_f)
        best = int(np.argmax(corr_f))
        if profiler:
            profiler.record("L2 opt")
        return (int(cg[keep[best]]), float(corr_f[best]), T_f[best].astype(np.float64))
