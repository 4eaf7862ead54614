"""On-device CandidateManager: proposal merging + tidy screens, zero host syncs.

Replaces the reference's sequential host-side CandidateManager
(contour_db.h:264-656) with a fixed-shape device replica so the whole query
step (search -> cascade -> merge -> GMM) is ONE XLA dispatch.  Semantics are an
exact replica of `addProposal` (contour_db.h:286-338) and the first two screens
of `tidyUpCandidates` (contour_db.h:494-545); parity is tested against the
host-side implementation in db.py (itself tested against a sequential oracle).

Layout: candidate poses are rows of fixed-size tables, keyed by the scan index
`gidx` in first-seen order (like the reference's `candidates_` vector); each
holds up to 4 proposals (the reference drops the 5th, contour_db.h:326).  The
constellation-pair union per proposal is a dense (NUM_SLOTS,) map indexed by
(level, seq_src, seq_tgt) with first-insert-wins percs (`setdefault`,
contour_db.h:305).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from contour_context_tpu.config import DIST_BIN_LAYERS, LAYER_AREA_WEIGHTS
from contour_context_tpu.ops.cascade import _clamp_ang

P_PROP = 4          # max proposals per candidate pose (contour_db.h:326)
N_LEV = 6           # level values 0..5 cover q_levels and DIST_BIN_LAYERS
N_SEQ = 10          # seq values 0..9 (dist_firsts)
NUM_SLOTS = N_LEV * N_SEQ * N_SEQ   # dense (level, seq_src, seq_tgt) key space
TF_TRANS_MERGE = 2.0    # proposal merge radius, m (contour_db.h:296)
TF_ANG_MERGE = 0.3      # proposal merge angle, rad (contour_db.h:296)


class CandidateState(NamedTuple):
    cand_gidx: jnp.ndarray    # (C,) int32, -1 when empty; first-seen order
    n_cand: jnp.ndarray       # () int32
    prop_n: jnp.ndarray       # (C,) int32 proposals in use
    prop_T: jnp.ndarray       # (C, 4, 3) f32 (x, y, theta) BEV delta
    prop_votes: jnp.ndarray   # (C, 4) int32 accumulated pair votes
    prop_taken: jnp.ndarray   # (C, 4, NUM_SLOTS) bool constellation union
    prop_perc: jnp.ndarray    # (C, 4, NUM_SLOTS) f32 first-insert percs
    overflow_cand: jnp.ndarray  # () int32 hints dropped: candidate table full
    overflow_pass: jnp.ndarray  # () int32 passing hints beyond the merge budget


def select_topk_stable(priority, mask, cap: int):
    """Budget-capped stable selection (shared by the hint cap and the merge
    budget). When the masked items fit `cap` this selects ALL of them in
    input order — the reference's sequential processing order, which the
    host-replica parity tests pin. When they overflow, it keeps the `cap`
    best by ascending `priority` (stable tie-break by position), still in
    input order among the kept. Returns (perm, sel_at_perm, n_masked,
    overflow): index `x[perm]` and mask with `sel_at_perm`."""
    n = mask.shape[0]
    order = jnp.argsort(jnp.where(mask, priority, jnp.inf), stable=True)
    rank = jnp.zeros(n, jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    sel = mask & (rank < cap)
    perm = jnp.argsort(~sel, stable=True)[:cap]
    n_masked = jnp.sum(mask).astype(jnp.int32)
    overflow = jnp.maximum(0, n_masked - cap).astype(jnp.int32)
    return perm, sel[perm], n_masked, overflow


def dense_pair_maps(pair_valid, pair_level, pair_seq_src, pair_seq_tgt,
                    pair_perc):
    """(H, P) ragged pair lists -> dense (H, NUM_SLOTS) perc/taken maps.

    Duplicate ids within one hint's pair list (possible when a src neighbor
    is bit-adjacent to two tgt neighbors sharing a seq) keep the FIRST
    pair's perc — the reference's std::map setdefault semantics
    (contour_db.h:305), which the host replica in db.py also pins."""
    H, P = pair_valid.shape
    ids = jnp.where(
        pair_valid,
        pair_level * (N_SEQ * N_SEQ) + pair_seq_src * N_SEQ + pair_seq_tgt,
        NUM_SLOTS)
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    pos = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :], (H, P))
    first_pos = jnp.full((H, NUM_SLOTS + 1), P, jnp.int32).at[rows, ids].min(
        jnp.where(pair_valid, pos, P))
    is_first = pair_valid & (pos == first_pos[rows, ids])
    perc = jnp.zeros((H, NUM_SLOTS + 1), jnp.float32).at[rows, ids].add(
        jnp.where(is_first, pair_perc, 0.0))
    taken = jnp.zeros((H, NUM_SLOTS + 1), jnp.float32).at[rows, ids].add(
        pair_valid.astype(jnp.float32))
    return perc[:, :NUM_SLOTS], taken[:, :NUM_SLOTS] > 0


@functools.partial(jax.jit, static_argnames=("n_cand_max", "n_pass_max"))
def merge_proposals(pass3, gidx, T_delta, pair_valid, pair_level,
                    pair_seq_src, pair_seq_tgt, pair_perc,
                    n_cand_max: int = 32, n_pass_max: int = 64
                    ) -> CandidateState:
    """Sequentially merge the passing hints' proposals (addProposal replica).

    Hints are processed in input order (the reference's (q_level, anchor,
    ranked-hit) order); non-passing hints are skipped via a stable compaction.
    """
    H = pass3.shape[0]
    C = n_cand_max
    MP = min(n_pass_max, H)

    dense_perc, dense_taken = dense_pair_maps(
        pair_valid, pair_level, pair_seq_src, pair_seq_tgt, pair_perc)
    votes_h = jnp.sum(pair_valid, axis=1).astype(jnp.int32)

    # Under merge-budget overflow (dense self-similar maps) keep the MP
    # strongest hints by constellation vote count — a hint's pair count is
    # the proposal weight, so dropping the weakest tail loses the least
    # evidence; see select_topk_stable for the under-cap parity guarantee.
    perm, _, n_pass, overflow_pass = select_topk_stable(
        -votes_h.astype(jnp.float32), pass3, MP)

    g = gidx[perm].astype(jnp.int32)
    T = T_delta[perm]
    dperc = dense_perc[perm]
    dtaken = dense_taken[perm]
    votes = votes_h[perm]

    init = CandidateState(
        cand_gidx=jnp.full((C,), -1, jnp.int32),
        n_cand=jnp.int32(0),
        prop_n=jnp.zeros((C,), jnp.int32),
        prop_T=jnp.zeros((C, P_PROP, 3), jnp.float32),
        prop_votes=jnp.zeros((C, P_PROP), jnp.int32),
        prop_taken=jnp.zeros((C, P_PROP, NUM_SLOTS), bool),
        prop_perc=jnp.zeros((C, P_PROP, NUM_SLOTS), jnp.float32),
        overflow_cand=jnp.int32(0),
        overflow_pass=overflow_pass,
    )

    def body(m, st: CandidateState):
        live = m < jnp.minimum(n_pass, MP)
        g_m = g[m]
        T_m = T[m]
        w2 = votes[m]

        # --- find or create the candidate row ----------------------------
        eq = st.cand_gidx == g_m
        found = jnp.any(eq) & live
        create = live & ~found & (st.n_cand < C)
        cidx = jnp.where(found, jnp.argmax(eq), st.n_cand)
        cidx = jnp.clip(cidx, 0, C - 1).astype(jnp.int32)
        drop_cand = live & ~found & (st.n_cand >= C)

        # --- match an existing proposal (delta within 2 m / 0.3 rad) -----
        pT = st.prop_T[cidx]                               # (4, 3)
        c_m, s_m = jnp.cos(T_m[2]), jnp.sin(T_m[2])
        dx = pT[:, 0] - T_m[0]
        dy = pT[:, 1] - T_m[1]
        tx = c_m * dx + s_m * dy
        ty = -s_m * dx + c_m * dy
        dth = _clamp_ang(pT[:, 2] - T_m[2])
        in_use = jnp.arange(P_PROP) < st.prop_n[cidx]
        match = in_use & (jnp.hypot(tx, ty) < TF_TRANS_MERGE) & \
            (jnp.abs(dth) < TF_ANG_MERGE)
        has_match = jnp.any(match)
        first = jnp.argmax(match).astype(jnp.int32)

        can_append = st.prop_n[cidx] < P_PROP   # ref: skip if len(props) > 3
        slot = jnp.where(has_match, first, jnp.minimum(st.prop_n[cidx], P_PROP - 1))
        write = live & ~drop_cand & (has_match | can_append)

        # --- merged / appended proposal values ----------------------------
        old_T = pT[slot]
        old_votes = st.prop_votes[cidx, slot]
        old_taken = st.prop_taken[cidx, slot]
        old_perc = st.prop_perc[cidx, slot]

        w1 = old_votes
        wsum = jnp.maximum(w1 + w2, 1).astype(jnp.float32)
        trans = (old_T[:2] * w1 + T_m[:2] * w2) / wsum
        # angle blend replica (contour_db.h:313-319)
        diff = T_m[2] - old_T[2]
        diff = jnp.where(diff < 0, diff + 2 * math.pi, diff)
        diff = jnp.where(diff > math.pi, diff - 2 * math.pi, diff)
        ang = diff * w2.astype(jnp.float32) / wsum + old_T[2]
        T_merged = jnp.concatenate([trans, ang[None]])

        new_T = jnp.where(has_match, T_merged, T_m)
        new_votes = jnp.where(has_match, w1 + w2, w2)
        new_taken = jnp.where(has_match, old_taken | dtaken[m], dtaken[m])
        new_perc = jnp.where(has_match,
                             jnp.where(old_taken, old_perc, dperc[m]),
                             dperc[m])

        sel = lambda cond, new, old: jnp.where(write & cond, new, old)
        return CandidateState(
            cand_gidx=st.cand_gidx.at[cidx].set(
                jnp.where(create, g_m, st.cand_gidx[cidx])),
            n_cand=st.n_cand + create.astype(jnp.int32),
            prop_n=st.prop_n.at[cidx].set(
                st.prop_n[cidx] + (write & ~has_match).astype(jnp.int32)),
            prop_T=st.prop_T.at[cidx, slot].set(sel(True, new_T, old_T)),
            prop_votes=st.prop_votes.at[cidx, slot].set(
                sel(True, new_votes, old_votes)),
            prop_taken=st.prop_taken.at[cidx, slot].set(
                sel(True, new_taken, old_taken)),
            prop_perc=st.prop_perc.at[cidx, slot].set(
                sel(True, new_perc, old_perc)),
            overflow_cand=st.overflow_cand + drop_cand.astype(jnp.int32),
            overflow_pass=st.overflow_pass,
        )

    # dynamic trip count: iterate only over hints that actually passed
    # (sequential merge order is load-bearing, but the tail of the MP cap is
    # all dead iterations — a fixed fori_loop burned ~20 us/iteration x 128
    # on the TPU regardless of how few hints passed; profiled 2026-08-18)
    trip = jnp.minimum(n_pass, MP)

    def wcond(carry):
        return carry[0] < trip

    def wbody(carry):
        m, st = carry
        return m + 1, body(m, st)

    _, st = lax.while_loop(wcond, wbody, (jnp.int32(0), init))
    return st


def dynamic_pass_scan(pass1, ovlp_sum, ovlp_max1, in_ang, indiv, orie,
                      lb, ub):
    """DYNAMIC_THRES re-gating of the check cascade (contour_db.h:439-458).

    Hints are re-gated sequentially: each full pass raises the working lower
    bounds (all five count thresholds) to that hint's final pair count,
    clamped by the upper-bound ensemble (alignLB/alignUB, algos.h:119-150).
    Scores are threshold-independent, so this replays the reference's
    sequential semantics on the batched cascade outputs.
    Returns (pass2, pass3) under the dynamic bars.
    """
    init = jnp.array([lb.sim_constell.i_ovlp_sum, lb.sim_constell.i_ovlp_max_one,
                      lb.sim_constell.i_in_ang_rng, lb.sim_pair.i_indiv_sim,
                      lb.sim_pair.i_orie_sim], jnp.int32)
    ubv = jnp.array([ub.sim_constell.i_ovlp_sum, ub.sim_constell.i_ovlp_max_one,
                     ub.sim_constell.i_in_ang_rng, ub.sim_pair.i_indiv_sim,
                     ub.sim_pair.i_orie_sim], jnp.int32)

    def step(carry, x):
        p1, ov, m1, ia, ind, oc = x
        pass2 = p1 & (ov >= carry[0]) & (m1 >= carry[1]) & (ia >= carry[2])
        pass3 = pass2 & (ind >= carry[3]) & (oc >= carry[4])
        new = jnp.minimum(jnp.maximum(carry, oc), ubv)
        return jnp.where(pass3, new, carry), (pass2, pass3)

    _, (pass2, pass3) = lax.scan(
        step, init, (pass1, ovlp_sum.astype(jnp.int32),
                     ovlp_max1.astype(jnp.int32), in_ang.astype(jnp.int32),
                     indiv.astype(jnp.int32), orie.astype(jnp.int32)))
    return pass2, pass3


def dynamic_post_scan(in_use, area, neg_d, corr0, lb_post, ub_post):
    """DYNAMIC_THRES post-processing screens (contour_db.h:532-574).

    Candidates are screened sequentially in first-seen order; each candidate
    passing all three screens (area %, distance censor, init correlation)
    raises the working lower bounds to its own scores, clamped by the upper
    bounds. Returns the keep mask.
    """
    init = jnp.array([lb_post.area_perc, lb_post.neg_est_dist,
                      lb_post.correlation], jnp.float32)
    ubv = jnp.array([ub_post.area_perc, ub_post.neg_est_dist,
                     ub_post.correlation], jnp.float32)

    def step(carry, x):
        use, a, d, c = x
        keep = use & (a >= carry[0]) & (d >= carry[1]) & (c >= carry[2])
        new = jnp.minimum(jnp.maximum(carry, jnp.stack([a, d, c])), ubv)
        return jnp.where(keep, new, carry), keep

    _, keep = lax.scan(step, init, (in_use, area.astype(jnp.float32),
                                    neg_d.astype(jnp.float32),
                                    corr0.astype(jnp.float32)))
    return keep


def _area_weights() -> jnp.ndarray:
    """(NUM_SLOTS,) weight of each dense slot = LAYER_AREA_WEIGHTS of its level."""
    w = [0.0] * N_LEV
    for j, lev in enumerate(DIST_BIN_LAYERS):
        w[lev] = LAYER_AREA_WEIGHTS[j]
    lev_of_slot = jnp.arange(NUM_SLOTS) // (N_SEQ * N_SEQ)
    return jnp.asarray(w, jnp.float32)[lev_of_slot]


class TidyResult(NamedTuple):
    alive: jnp.ndarray    # (C,) bool — static area + distance screens passed
    in_use: jnp.ndarray   # (C,) bool — candidate row populated
    T_sel: jnp.ndarray    # (C, 3) selected proposal transform
    area: jnp.ndarray     # (C,) weighted constellation area percentage
    neg_d: jnp.ndarray    # (C,) negated sensor-frame distance
    votes: jnp.ndarray    # (C,) selected proposal votes
    sel: jnp.ndarray      # (C,) selected proposal index


def tidy_candidates(st: CandidateState, area_perc_lb: float,
                    neg_est_dist_lb: float, n_row: int, n_col: int,
                    reso_row: float, reso_col: float) -> TidyResult:
    """Screens 1-2 of tidyUpCandidates (contour_db.h:494-545), vectorized.

    Per candidate: select the proposal with most votes (first wins ties, the
    reference's strictly-greater scan), screen by weighted constellation area
    percentage and by the negated estimated sensor-frame distance.
    """
    C = st.cand_gidx.shape[0]
    prop_use = jnp.arange(P_PROP)[None, :] < st.prop_n[:, None]  # (C, 4)
    votes_m = jnp.where(prop_use, st.prop_votes, -1)
    sel = jnp.argmax(votes_m, axis=1)                            # first max
    rows = jnp.arange(C)

    w = _area_weights()
    area_all = jnp.einsum("cps,s->cp",
                          jnp.where(st.prop_taken, st.prop_perc, 0.0), w)
    area = area_all[rows, sel]
    T_sel = st.prop_T[rows, sel]
    votes = st.prop_votes[rows, sel]

    # distance censor in the sensor frame (getEstSensTF, correlation.h:287-296)
    ox = n_row / 2 - 0.5
    oy = n_col / 2 - 0.5
    c, s = jnp.cos(T_sel[:, 2]), jnp.sin(T_sel[:, 2])
    tx = c * ox - s * oy + T_sel[:, 0] - ox
    ty = s * ox + c * oy + T_sel[:, 1] - oy
    neg_d = -jnp.hypot(tx * reso_row, ty * reso_col)

    in_use = (rows < st.n_cand) & (st.prop_n > 0)
    alive = in_use & (area >= area_perc_lb) & (neg_d >= neg_est_dist_lb)
    return TidyResult(alive=alive, in_use=in_use, T_sel=T_sel, area=area,
                      neg_d=neg_d, votes=votes, sel=sel)
