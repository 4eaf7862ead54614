"""Per-scan descriptor pipeline on device: points -> ScanDesc, one jitted fn.

TPU-first design replacing the reference's per-scan hot path
(makeBEV + makeContoursRecurs, contour_mng.h:505-960, ~9 ms single-thread C++):

- BEV rasterization = scatter-max with an argmax payload (first-wins ties).
- Hierarchical contour extraction = per-level connected components via
  min-label propagation (3x3 reduce_window) + pointer jumping, with parent
  validity chaining replacing the recursion's masking; moments via two-pass
  scatter-add (numerically stable centered covariance).
- Retrieval keys = dense masked ring-histogram (a (P_pix, 35) Gaussian kernel
  evaluation batched over all 36 anchors at once).
- BCIs = fixed-size neighbor tables + masked sorts.

Everything is fixed-shape; the whole function compiles once under jit.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from contour_context_tpu.config import (
    BITS_PER_LAYER,
    DIST_BIN_LAYERS,
    NUM_BIN_KEY_LAYER,
    RET_KEY_DIM,
    ContourManagerConfig,
    GMMOptConfig,
)
from contour_context_tpu.types import ScanDesc

VAL_ABS_INF = 1e3


# ---------------------------------------------------------------------------
# 1. BEV rasterization (contour_mng.h:505-556)
# ---------------------------------------------------------------------------

def rasterize_bev(points: jnp.ndarray, cfg: ContourManagerConfig):
    """points (P, 4) [x y z valid] -> (bev, rowf, colf) each (n_row*n_col,) f32.

    Per-pixel max of (z + lidar_height); payload = continuous (row, col) of the
    first point (in array order) achieving the max, matching the reference's
    strict `<` update rule.
    """
    nr, nc = cfg.n_row, cfg.n_col
    S = nr * nc
    x, y, z, flag = points[:, 0], points[:, 1], points[:, 2], points[:, 3]
    pad = 1e-2
    x_min, x_max = -(nr // 2) * cfg.reso_row, (nr // 2) * cfg.reso_row
    y_min, y_max = -(nc // 2) * cfg.reso_col, (nc // 2) * cfg.reso_col
    ok = (
        (flag > 0)
        & (x >= x_min + pad) & (x <= x_max - pad)
        & (y >= y_min + pad) & (y <= y_max - pad)
        & (x * x + y * y >= cfg.blind_sq)
    )
    row = jnp.floor(x / cfg.reso_row).astype(jnp.int32) + nr // 2
    col = jnp.floor(y / cfg.reso_col).astype(jnp.int32) + nc // 2
    ok &= row > 0  # reference quirk: row 0 dropped (contour_mng.h:515)
    h = z + cfg.lidar_height
    # a real point with non-finite height (h=+inf -> -h=-inf) would alias
    # the sentinel rows pass 2 recognizes by isneginf, shifting the dense BEV
    ok &= jnp.isfinite(h)
    pid = jnp.where(ok, row * nc + col, S).astype(jnp.int32)
    P = points.shape[0]

    # Sort-based reduction instead of scatter-max + gather + scatter-min:
    # on this TPU a 3-key lax.sort of 131k elements costs 0.14 ms while ONE
    # 131k scatter or gather costs ~1.1 ms (scripts/desc_latency_bench.py,
    # 2026-08-18) — the scatter formulation paid that tax three times.
    # Sort cost scales with total operand count, so both passes carry the
    # MINIMUM payload: the point-index tie-break key is replaced by
    # lax.sort's stability (is_stable defaults to True — equal (pid, -h)
    # rows keep array order, which IS the reference's first-point-wins
    # rule), sentinels are recognized by their -inf key instead of an index
    # payload, and the empty-pixel flag rides inside val_h as -inf.
    #
    # Pass 1: sort points together with one SENTINEL row per pixel by
    # (pid, -h), stable. The sentinel's -h = -inf puts it FIRST in its
    # pixel's run; the element immediately after it (if any, same pid) is
    # the pixel's winner — max h, ties broken by min point index, exactly
    # the reference's strict `<` update rule (contour_mng.h:505-556). x/y
    # ride as payload so no gather is needed for the argmax position.
    sent_pid = jnp.arange(S, dtype=jnp.int32)
    a_pid = jnp.concatenate([pid, sent_pid])
    a_negh = jnp.concatenate([
        jnp.where(ok, -h, jnp.inf).astype(jnp.float32),
        jnp.full((S,), -jnp.inf, jnp.float32)])
    a_x = jnp.concatenate([x, jnp.zeros((S,), x.dtype)]).astype(jnp.float32)
    a_y = jnp.concatenate([y, jnp.zeros((S,), y.dtype)]).astype(jnp.float32)
    sp, sn, sx, sy = jax.lax.sort((a_pid, a_negh, a_x, a_y), num_keys=2)
    # winner = the element right after each sentinel (sentinels are unique
    # per pid, so a same-pid successor is always a real point; invalid
    # points carry -h = +inf and pid = S, outside every sentinel run)
    nxt_same = jnp.concatenate([sp[1:] == sp[:-1],
                                jnp.zeros((1,), bool)])
    hn = jnp.concatenate([-sn[1:], jnp.full((1,), -jnp.inf, jnp.float32)])
    xn = jnp.concatenate([sx[1:], jnp.zeros((1,), jnp.float32)])
    yn = jnp.concatenate([sy[1:], jnp.zeros((1,), jnp.float32)])
    hasw = nxt_same & jnp.isfinite(hn)
    val_h = jnp.where(hasw, hn, -jnp.inf)   # -inf = empty pixel marker
    # Pass 2: float the sentinels (now carrying their pixel's winner) to the
    # front in pid order — the first S rows ARE the dense BEV image, no
    # scatter needed. One packed int32 key: sentinel rows get their pid
    # (0..S-1, all distinct), everything else S + pid >= S (relative order
    # irrelevant — only the first S rows are read).
    is_sent = jnp.isneginf(sn)
    key2 = jnp.where(is_sent, sp, sp + S)
    _, d_h, d_x, d_y = jax.lax.sort((key2, val_h, xn, yn), num_keys=1)
    has = jnp.isfinite(d_h[:S])
    bev = jnp.where(has, d_h[:S], -VAL_ABS_INF)
    rowf = jnp.where(has, d_x[:S] / cfg.reso_row + nr / 2 - 0.5, -1.0)
    colf = jnp.where(has, d_y[:S] / cfg.reso_col + nc / 2 - 0.5, -1.0)
    return bev, rowf.astype(jnp.float32), colf.astype(jnp.float32)


# ---------------------------------------------------------------------------
# 2. Connected components per level (contour_mng.cpp:274-353 equivalent)
# ---------------------------------------------------------------------------

def cc_labels(masks: jnp.ndarray, flush: str = "scan") -> jnp.ndarray:
    """masks (L, nr, nc) bool -> labels (L, nr*nc) int32.

    8-connected components labeled by the component's minimum linear pixel
    index; background = S (= nr*nc). Each fixpoint iteration propagates the
    running min label by a 3x3 window min (the 8-connectivity hop) and then
    flushes it along ENTIRE foreground runs of every row and column with
    segmented min-scans (lax.associative_scan, log2(n) shift-mins) —
    straight corridors collapse in one pass instead of one pixel per pass.
    The earlier pointer-jumping step (label <- label[label]) did the
    long-range collapse with take_along_axis gathers, which lower to ~1 ms
    serialized TPU gathers EACH (profiled 2026-08-18, 2 jumps/iteration =
    the bulk of ~7.4 ms/scan); the scans are pure VPU shifts. Fixpoint
    (lax.while_loop) makes the label invariant independent of iteration
    count, so the replacement cannot change results, only speed.
    """
    L, nr, nc = masks.shape
    S = nr * nc
    lin = jnp.arange(S, dtype=jnp.int32).reshape(nr, nc)
    labels0 = jnp.where(masks, lin[None], S)
    brk = ~masks                     # background breaks every run

    # Packed single-int32 segmented min-scans: a (value, break-flag) tuple
    # scan costs ~5 VPU ops per combine; packing the segment id into the
    # high bits and the NEGATED label into the low bits turns the segmented
    # min into a plain running MAX (1 op per combine). Along the scan
    # direction the segment id is nondecreasing, so the running max's
    # segment component always equals the current position's segment —
    # cross-segment candidates (smaller seg id) can never win, and within
    # the segment max(MAXV - lab) = min(lab). Segment ids are loop-invariant
    # (cumulative break counts per row/column, one per scan direction),
    # hoisted out of the fixpoint loop. Bits: lab <= S < 2^15 for the
    # 150x150 grid; seg <= max(nr, nc) + 1; packed < (nc+2)<<15 < 2^31 for
    # grids up to ~4096 wide. Larger grids fall back to the tuple scan.
    packable = S < (1 << 15)
    MAXV = (1 << 15) - 1
    segs = {}
    for axis in (1, 2):
        b32 = brk.astype(jnp.int32)
        # fwd and rev scans stay SEPARATE (reverse=True): stacking them on a
        # leading axis-of-2 with pre-flipped data halves the scan launches
        # but the flip/stack data movement costs more than it saves —
        # measured +1.4 ms/scan on the v5e (scripts/cc_variants_bench.py,
        # 2026-08-19: r2loop 2.83 vs pack2 4.27 ms incl. raster prefix)
        segs[axis] = (
            jnp.cumsum(b32, axis=axis) << 15,
            jnp.flip(jnp.cumsum(jnp.flip(b32, axis=axis), axis=axis),
                     axis=axis) << 15,
        )

    def comb(a, b):
        # segmented min: a right-segment start blocks propagation from left
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    def shift_fwd(x, d, axis):
        # prepend d zeros, drop the tail: a shifted-in zero never wins a
        # packed running max (every packed value has neg = MAXV - lab >=
        # MAXV - S > 0 in its low bits)
        pad = [(0, 0)] * x.ndim
        pad[axis] = (d, 0)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, x.shape[axis])
        return jnp.pad(x, pad)[tuple(sl)]

    def shift_rev(x, d, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, d)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(d, d + x.shape[axis])
        return jnp.pad(x, pad)[tuple(sl)]

    def run_min(lab, axis):
        if not packable:
            fv, _ = lax.associative_scan(comb, (lab, brk), axis=axis)
            rv, _ = lax.associative_scan(comb, (lab, brk), axis=axis,
                                         reverse=True)
            return jnp.minimum(fv, rv)
        seg_f, seg_r = segs[axis]
        neg = MAXV - lab
        if flush == "hillis":
            # Hillis-Steele doubling: running max = log2(n) shift+max steps
            # per direction (each step 2 XLA ops) — same fixpoint labels as
            # the associative_scan lowering (it computes the identical
            # running max), ~4x fewer ops per flush. Aimed at the vmapped
            # chain build where the scan lowering's op count dominated
            # (cc 2.79 ms/scan of the 4.68 ms/scan vmapped-16 build,
            # desc_latency_bench --vmap 16, 2026-08-20).
            x = seg_f | neg
            y = seg_r | neg
            d = 1
            while d < lab.shape[axis]:
                x = jnp.maximum(x, shift_fwd(x, d, axis))
                y = jnp.maximum(y, shift_rev(y, d, axis))
                d *= 2
            return MAXV - jnp.maximum(x & MAXV, y & MAXV)
        rm_f = lax.associative_scan(jnp.maximum, seg_f | neg, axis=axis)
        rm_r = lax.associative_scan(jnp.maximum, seg_r | neg, axis=axis,
                                    reverse=True)
        return MAXV - (jnp.maximum(rm_f & MAXV, rm_r & MAXV))

    def shiftv(x, d, axis):
        # value shift for the window min: out-of-bounds = S (the min-neutral
        # background). Shift the (x - S) <= 0 image so the zero padding maps
        # back to exactly S.
        if d > 0:
            return shift_fwd(x - S, d, axis) + S
        return shift_rev(x - S, -d, axis) + S

    def propagate(lab):
        if flush == "hillis":
            # separable 3x3 min as 4 shift+min ops — the measured winner
            # over lax.reduce_window in the vmapped chain form (hillsep4
            # 0.854 vs hilli4 0.967 vs scan-lowering 3.243 ms/scan,
            # scripts/cc_variants_bench.py --vmap 16 on-chip 2026-08-20)
            m = jnp.minimum(lab, jnp.minimum(shiftv(lab, 1, 1),
                                             shiftv(lab, -1, 1)))
            neigh = jnp.minimum(m, jnp.minimum(shiftv(m, 1, 2),
                                               shiftv(m, -1, 2)))
        else:
            neigh = lax.reduce_window(
                lab, jnp.int32(S), lax.min,
                window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
                padding="SAME")
        new = jnp.where(masks, jnp.minimum(lab, neigh), S)
        new = jnp.where(masks, run_min(new, 2), S)
        return jnp.where(masks, run_min(new, 1), S)

    # Static unroll + fixpoint tail: on KITTI-scale BEVs the fixpoint lands
    # within 2-3 propagates and is verified by the 3rd-4th (measured over
    # synth renders, 2026-08-19: seq row-then-col flush converges incl.
    # verify in mean 3.3 / max 4 propagates). Unrolling 4 propagates and
    # seeding the while_loop with the (p3 != p4) convergence bit removes the
    # per-iteration device-side convergence reduction for ~all scans — the
    # loop body never runs unless the scan genuinely needs a 5th round.
    # Labels only decrease toward the component min, so extra propagates
    # never change the fixpoint (exactness is iteration-count independent).
    # A/B on the chip (scripts/cc_variants_bench.py, 2026-08-19, constant
    # raster prefix included): 4-unroll 1.91 ms < 3-unroll 2.10 < r2's
    # 2-props-per-iteration while_loop 2.78.
    p = [labels0]
    for _ in range(4):
        p.append(propagate(p[-1]))

    def body(state):
        lab, _ = state
        new = propagate(lab)
        return new, jnp.any(new != lab)

    def cond(state):
        return state[1]

    labels, _ = lax.while_loop(cond, body, (p[-1], jnp.any(p[-1] != p[-2])))
    return labels.reshape(L, S)


def component_tables(labels: jnp.ndarray, masks_flat: jnp.ndarray,
                     bev: jnp.ndarray, rowf: jnp.ndarray, colf: jnp.ndarray,
                     cfg: ContourManagerConfig):
    """Per-level top-K contour stats tables from CC labels.

    Returns dict of (L, K) arrays (see ScanDesc) plus layer_cell_cnt / n_cont.
    Validity chain: a component is valid iff cell count >= min_cont_cell_cnt
    and its parent component at the previous level is valid (the recursion
    cut-off at contour_mng.cpp:304).
    """
    L = labels.shape[0]
    S = bev.shape[0]
    K = cfg.max_contours
    sc = cfg.view_stat

    # Per-PIXEL component sizes via sort + run-length + unsort instead of a
    # full-width segment-sum scatter (1.27 ms/scan on the v5e) followed by a
    # per-level chain of label-indexed gathers (~0.2 ms each): sorts of this
    # size cost ~0.05 ms (scripts/desc_latency_bench.py, 2026-08-18). A
    # component's label is its min pixel index, so sorting each level's
    # labels groups components into runs; the run length IS the cell count.
    iota_s = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (L, S))
    sl, pos = jax.lax.sort((labels, iota_s), dimension=1, num_keys=1)
    rs = jnp.concatenate([jnp.ones((L, 1), bool), sl[:, 1:] != sl[:, :-1]],
                         axis=1)                       # run starts
    if cfg.cc_flush == "hillis":
        # running max / reverse running min via Hillis-Steele doubling —
        # same values as associative_scan (identical running reduction),
        # ~3x fewer XLA ops (the tables stage is op-count bound in the
        # vmapped chain build like cc_labels; see config.cc_flush)
        def dbl(x, fill, op, rev):
            d = 1
            while d < x.shape[1]:
                pad = [(0, 0), (d, 0)] if not rev else [(0, 0), (0, d)]
                sh = jnp.pad(x, pad, constant_values=fill)
                sh = sh[:, :x.shape[1]] if not rev else sh[:, d:]
                x = op(x, sh)
                d *= 2
            return x

        spos = dbl(jnp.where(rs, iota_s, -1), -1, jnp.maximum, rev=False)
        ns = dbl(jnp.where(rs, iota_s, S), S, jnp.minimum, rev=True)
    else:
        spos = lax.associative_scan(
            jnp.maximum, jnp.where(rs, iota_s, -1), axis=1)  # my run's start
        ns = lax.associative_scan(
            jnp.minimum, jnp.where(rs, iota_s, S), axis=1, reverse=True)
    next_start = jnp.concatenate([ns[:, 1:],
                                  jnp.full((L, 1), S, jnp.int32)], axis=1)
    cnt_sorted = next_start - spos
    _, cnt_pix = jax.lax.sort((pos, cnt_sorted), dimension=1, num_keys=1)
    cnt_pix = jnp.where(masks_flat, cnt_pix, 0)        # (L, S)

    # Validity chain across levels, per pixel: lv_grads ascend so the masks
    # nest, and a level-l component lies inside exactly one level-(l-1)
    # component — the one containing any of its pixels. valid iff every
    # ancestor (including itself) meets the min cell count
    # (contour_mng.cpp:304's recursion cut-off).
    min_ok_pix = cnt_pix >= cfg.min_cont_cell_cnt      # (L, S)
    valid_pix = lax.associative_scan(jnp.logical_and, min_ok_pix, axis=0)

    rep_pix = labels == iota_s                          # component min pixel
    valid_rep = rep_pix & valid_pix
    layer_cell_cnt = jnp.sum(valid_pix, axis=1).astype(jnp.int32)
    n_cont = jnp.sum(valid_rep, axis=1).astype(jnp.int32)
    cnt = cnt_pix                                       # (L, S) by pixel/bin

    # top-K by (cell count desc, min pixel asc): a stable argsort on -cnt
    # keeps ascending pixel order within equal counts (the array index IS the
    # pixel), exact for any grid size (a packed int32 composite overflows past
    # ~181x181 grids); invalid slots sort last via key 1 > -cnt (cnt >= 1)
    sort_key = jnp.where(valid_rep, -cnt, 1)
    order_k = jnp.argsort(sort_key, axis=1, stable=True)[:, :K]  # (L, K)
    sel_valid = jnp.take_along_axis(valid_rep, order_k, axis=1)
    top_idx = order_k.astype(jnp.int32)
    rep = jnp.where(sel_valid, top_idx, S)             # label value of the slot

    # Moments for the SELECTED top-K components only, as dense masked
    # reductions over the (L, K, S) membership mask. The previous form —
    # nine full-table segment-sum scatters (jnp .at[].add over 6x22501
    # bins) — cost ~1.2 ms EACH on the TPU (scatters serialize; profiled
    # 2026-08-18, ~10.6 ms/scan total); only the count table needs full
    # width (validity chain + top-K selection), so it keeps the one scatter
    # and everything else becomes matmul/VPU-shaped dense math over the at
    # most K components that survive selection.
    sel = labels[:, None, :] == jnp.minimum(rep, S - 1)[:, :, None]
    sel &= (rep[:, :, None] < S)                       # (L, K, S) membership
    selF = sel.astype(jnp.float32)
    ch1 = jnp.stack([rowf, colf, bev, bev * rowf, bev * colf])   # (5, S)
    sums = jnp.einsum("lks,cs->lkc", selF, ch1,
                      precision=jax.lax.Precision.HIGHEST)       # (L, K, 5)
    s_r, s_c, s_h, s_hr, s_hc = [sums[..., i] for i in range(5)]

    g_cnt = jnp.where(sel_valid,
                      jnp.take_along_axis(cnt, order_k, axis=1), 0)
    g_n = jnp.maximum(g_cnt, 1).astype(jnp.float32)
    mean_r = s_r / g_n
    mean_c = s_c / g_n
    g_mean = jnp.stack([mean_r, mean_c], axis=-1)
    g_vol3 = s_h
    g_com = jnp.stack([s_hr, s_hc], axis=-1) / \
        jnp.maximum(g_vol3, 1e-12)[..., None]
    g_vol3_mean = g_vol3 / g_n

    # second pass: centered second moments (stable covariance)
    dr = jnp.where(sel, rowf[None, None, :] - mean_r[:, :, None], 0.0)
    dc = jnp.where(sel, colf[None, None, :] - mean_c[:, :, None], 0.0)
    nm1 = jnp.maximum(g_n - 1.0, 1.0)
    a = jnp.sum(dr * dr, axis=-1) / nm1
    b = jnp.sum(dr * dc, axis=-1) / nm1
    c = jnp.sum(dc * dc, axis=-1) / nm1

    # closed-form symmetric 2x2 eigendecomposition (ascending)
    m = 0.5 * (a + c)
    d = 0.5 * (a - c)
    disc = jnp.sqrt(d * d + b * b)
    l0 = m - disc
    l1 = m + disc
    use_b = jnp.abs(b) > 1e-12
    v1r = jnp.where(use_b, b, jnp.where(a >= c, 1.0, 0.0))
    v1c = jnp.where(use_b, l1 - a, jnp.where(a >= c, 0.0, 1.0))
    nrm = jnp.sqrt(v1r * v1r + v1c * v1c)
    v1r, v1c = v1r / nrm, v1c / nrm
    # columns: [minor, major]
    eig_vecs = jnp.stack([
        jnp.stack([-v1c, v1r], axis=-1),
        jnp.stack([v1r, v1c], axis=-1),
    ], axis=-1)  # (..., 2 rows, 2 cols)

    small = g_cnt < sc.min_cell_cov
    sig2 = sc.point_sigma ** 2
    l0 = jnp.where(small, sc.point_sigma, jnp.maximum(l0, sc.point_sigma))
    l1 = jnp.where(small, sc.point_sigma, jnp.maximum(l1, sc.point_sigma))
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), eig_vecs.shape)
    eig_vecs = jnp.where(small[..., None, None], eye, eig_vecs)
    eig_vals = jnp.stack([l0, l1], axis=-1)

    # manual cov = V diag(eig) V^T (contour.h:376-378)
    manual_cov = jnp.einsum("...ij,...j,...kj->...ik", eig_vecs, eig_vals, eig_vecs,
                            precision=jax.lax.Precision.HIGHEST)

    # eccentricitySalient (contour.h:258-260)
    perc = jnp.abs((l0 - l1) / jnp.maximum(l0, l1))
    ecc_feat = (~small) & (g_cnt > 5) & (perc > 0.2) & (l1 > 2.5)

    com_r = jnp.linalg.norm(g_com - g_mean, axis=-1)
    cont_perc = g_cnt.astype(jnp.float32) / jnp.maximum(
        layer_cell_cnt.astype(jnp.float32), 1.0)[:, None]

    return dict(
        cnt=g_cnt, valid=sel_valid, mean=g_mean, eig_vals=eig_vals,
        eig_vecs=eig_vecs, manual_cov=manual_cov, vol3_mean=g_vol3_mean,
        com_r=com_r.astype(jnp.float32), ecc_feat=ecc_feat,
        cont_perc=cont_perc, layer_cell_cnt=layer_cell_cnt, n_cont=n_cont,
    )


# ---------------------------------------------------------------------------
# 3. Retrieval keys (contour_mng.h:689-830)
# ---------------------------------------------------------------------------

def make_keys(tab: dict, bev: jnp.ndarray, rowf: jnp.ndarray, colf: jnp.ndarray,
              cfg: ContourManagerConfig):
    """(L, A, 10) retrieval keys, zero for invalid anchors."""
    L = cfg.n_levels
    A = cfg.piv_firsts
    nr, nc = cfg.n_row, cfg.n_col
    S = nr * nc
    num_bins = RET_KEY_DIM - 3
    bin_len = cfg.roi_radius / num_bins
    div_per_bin = 5
    div_len = cfg.roi_radius / (num_bins * div_per_bin)
    div_centers = (jnp.arange(num_bins * div_per_bin, dtype=jnp.float32)
                   * div_len + 0.5 * div_len)
    roi_pad = int(math.ceil(cfg.roi_radius + 1))
    h_gate = cfg.lv_grads[DIST_BIN_LAYERS[0]]

    # Compact the above-gate pixel pool to a fixed size. Under overflow
    # (dense scenes exceeding pix_pool cells) keep the pixels with the
    # highest ring weight (#levels exceeded) — they dominate the histogram —
    # instead of the raster-order head; the contraction is a sum, so when
    # everything fits the kept SET (and thus the keys) is unchanged. The
    # drop count surfaces as ScanDesc.pix_overflow -> counters overflow_pix.
    from contour_context_tpu.ops.candidate import select_topk_stable

    n_pool = min(cfg.pix_pool, S)
    pvalid = bev > h_gate
    full_higher = jnp.zeros(S, jnp.float32)
    for ele in range(DIST_BIN_LAYERS[0], L):
        full_higher += (bev > cfg.lv_grads[ele]).astype(jnp.float32)
    order, p_ok, _, pix_overflow = select_topk_stable(
        -full_higher, pvalid, n_pool)
    p_r = (order // nc).astype(jnp.int32)
    p_c = (order % nc).astype(jnp.int32)
    p_rowf = rowf[order]
    p_colf = colf[order]
    higher = jnp.where(p_ok, full_higher[order], 0.0)

    # anchors: (L, A)
    cnt = tab["cnt"][:, :A]
    anch_valid = tab["valid"][:, :A] & (cnt >= cfg.min_cont_key_cnt)
    mean = tab["mean"][:, :A]                           # (L, A, 2)
    accum = jnp.cumsum(cnt, axis=1).astype(jnp.float32)

    v0 = mean[..., 0].reshape(-1)                       # (L*A,)
    v1 = mean[..., 1].reshape(-1)
    r_cen = v0.astype(jnp.int32)                        # C trunc-toward-zero
    c_cen = v1.astype(jnp.int32)
    r_min = jnp.maximum(0, r_cen - roi_pad)[:, None]
    r_max = jnp.minimum(nr - 1, r_cen + roi_pad)[:, None]
    c_min = jnp.maximum(0, c_cen - roi_pad)[:, None]
    c_max = jnp.minimum(nc - 1, c_cen + roi_pad)[:, None]
    in_box = ((p_r[None] >= r_min) & (p_r[None] <= r_max)
              & (p_c[None] >= c_min) & (p_c[None] <= c_max))
    dist = jnp.sqrt((p_rowf[None] - v0[:, None]) ** 2
                    + (p_colf[None] - v1[:, None]) ** 2)   # (L*A, P)
    contrib = in_box & (dist < cfg.roi_radius - 1e-2) & p_ok[None]
    w = jnp.where(contrib, higher[None], 0.0)
    cnt_point = contrib.sum(axis=1).astype(jnp.float32)

    if cfg.use_pallas_ring:
        # Pallas path: VMEM-resident pixel pool, MXU contraction per anchor
        # (see ops/pallas_kernels.py for when this wins over plain XLA)
        from contour_context_tpu.ops.pallas_kernels import ring_key_divs_pallas

        anchors8 = jnp.stack([
            v0, v1, jnp.broadcast_to(r_min[:, 0].astype(jnp.float32), v0.shape),
            r_max[:, 0].astype(jnp.float32), c_min[:, 0].astype(jnp.float32),
            c_max[:, 0].astype(jnp.float32), jnp.ones_like(v0),
            jnp.zeros_like(v0)], axis=1)
        pool8 = jnp.stack([
            p_r.astype(jnp.float32), p_c.astype(jnp.float32), p_rowf, p_colf,
            higher, p_ok.astype(jnp.float32), jnp.zeros_like(p_rowf),
            jnp.zeros_like(p_rowf)], axis=1)
        divs, cnt_point_k = ring_key_divs_pallas(
            anchors8, pool8, div_centers, cfg.roi_radius,
            num_bins * div_per_bin,
            interpret=jax.default_backend() != "tpu")
        cnt_point = cnt_point_k
    else:
        # (L*A, P, D) gaussian kernel, summed over pixels
        g = jnp.exp(-0.5 * (div_centers[None, None, :] - dist[..., None]) ** 2) \
            / math.sqrt(2 * math.pi)
        divs = jnp.einsum("ap,apd->ad", w, g,
                          precision=jax.lax.Precision.HIGHEST)  # (L*A, 35)
    ring = divs.reshape(-1, num_bins, div_per_bin).sum(-1)
    ring = jnp.where(cnt_point[:, None] > 0,
                     ring * bin_len / jnp.sqrt(jnp.maximum(cnt_point, 1.0))[:, None],
                     0.0)

    k0 = jnp.sqrt(tab["eig_vals"][:, :A, 1] * cnt.astype(jnp.float32))
    k1 = jnp.sqrt(tab["eig_vals"][:, :A, 0] * cnt.astype(jnp.float32))
    k2 = jnp.sqrt(accum)
    keys = jnp.concatenate([
        jnp.stack([k0, k1, k2], axis=-1),
        ring.reshape(L, A, num_bins),
    ], axis=-1)
    keys = jnp.where(anch_valid[..., None], keys, 0.0)
    return keys.astype(jnp.float32), anch_valid, pix_overflow


# ---------------------------------------------------------------------------
# 4. BCIs (contour_mng.h:846-883)
# ---------------------------------------------------------------------------

def make_bcis(tab: dict, anch_valid: jnp.ndarray, cfg: ContourManagerConfig):
    L = cfg.n_levels
    A = cfg.piv_firsts
    J = cfg.dist_firsts
    M = NUM_BIN_KEY_LAYER * J  # 40 slots in generation order (bl, j)

    mean = tab["mean"]                                  # (L, K, 2)
    n_cont = tab["n_cont"]                              # (L,)

    anchor_mean = mean[:, :A]                           # (L, A, 2)
    lay_idx = jnp.array(DIST_BIN_LAYERS, jnp.int32)     # (4,)
    nei_mean = mean[lay_idx][:, :J]                     # (4, <=J, 2)
    if nei_mean.shape[1] < J:   # max_contours < dist_firsts: pad the slot
        # axis to J (padded slots are masked by nei_exists, which counts
        # real contours), keeping the (L, A, 4*J) table shape config-stable
        nei_mean = jnp.pad(nei_mean,
                           ((0, 0), (0, J - nei_mean.shape[1]), (0, 0)))
    nei_exists = (jnp.arange(J)[None, :] <
                  jnp.minimum(J, n_cont[lay_idx])[:, None])  # (4, J)

    # (L, A, 4, J, 2)
    vec = nei_mean[None, None] - anchor_mean[:, :, None, None]
    d = jnp.sqrt((vec ** 2).sum(-1))
    theta = jnp.arctan2(vec[..., 1], vec[..., 0])
    d_hi = (BITS_PER_LAYER - 1) * 1.01 + 5.43 - 1e-3
    in_rng = (d > 5.43) & (d <= d_hi)
    ll_ar = jnp.arange(L, dtype=jnp.int32)
    seq_ar = jnp.arange(A, dtype=jnp.int32)
    is_self = (lay_idx[None, None, :, None] == ll_ar[:, None, None, None]) & \
              (jnp.arange(J, dtype=jnp.int32)[None, None, None, :] == seq_ar[None, :, None, None])
    valid = nei_exists[None, None] & in_rng & (~is_self) & anch_valid[..., None, None]
    bit_local = jnp.minimum(jnp.floor((d - 5.43) / 1.01), BITS_PER_LAYER - 1.0)
    bit = bit_local.astype(jnp.int32) + \
        (jnp.arange(NUM_BIN_KEY_LAYER, dtype=jnp.int32) * BITS_PER_LAYER)[None, None, :, None]

    nei_level = jnp.broadcast_to(lay_idx[None, None, :, None], valid.shape)
    nei_seq = jnp.broadcast_to(jnp.arange(J, dtype=jnp.int32)[None, None, None, :], valid.shape)

    def flat(x):
        return x.reshape(L, A, M)

    valid, bit, theta, nei_level, nei_seq = map(flat, (valid, bit, theta, nei_level, nei_seq))

    # sort by (bit, generation slot), invalid at the end
    slot = jnp.arange(M, dtype=jnp.int32)[None, None, :]
    sort_key = jnp.where(valid, bit * M + slot, jnp.int32(1 << 20))
    order = jnp.argsort(sort_key, axis=-1)
    take = lambda x: jnp.take_along_axis(x, order, axis=-1)
    # HBM-compact storage dtypes (values: level 0..5, seq 0..9, bit 0..256);
    # run_cascade widens them back to int32 at entry before any arithmetic
    return dict(
        nei_valid=take(valid),
        nei_level=take(nei_level).astype(jnp.int8),
        nei_seq=take(nei_seq).astype(jnp.int8),
        nei_bit=jnp.where(take(valid), take(bit), 256).astype(jnp.int16),
        nei_theta=take(theta).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# 5. GMM summary (correlation.h:49-122)
# ---------------------------------------------------------------------------

def gmm_summary(tab: dict, gmm_cfg: GMMOptConfig):
    cnt = tab["cnt"].astype(jnp.float32)
    valid = tab["valid"]
    lcc = jnp.maximum(tab["layer_cell_cnt"].astype(jnp.float32), 1.0)
    ex_cum = jnp.cumsum(cnt, axis=1) - cnt
    gmm_mask = valid & (ex_cum / lcc[:, None] < gmm_cfg.min_area_perc)

    lev = jnp.array(gmm_cfg.levels, jnp.int32)
    mus = tab["mean"][lev]          # (G, K, 2)
    covs = tab["manual_cov"][lev]   # (G, K, 2, 2)
    ws = jnp.where(gmm_mask[lev], cnt[lev], 0.0)

    from contour_context_tpu.ops.gmm import l2_pairwise

    auto_corr = l2_pairwise(mus, covs, ws, mus, covs, ws,
                            gmm_cfg.cov_dilate_scale).sum()
    # the serving/query gathers truncate each level's 95%-area prefix at
    # max_gmm_ellipses; count what that drops so corr skew is diagnosable
    # (ContourDB.counters overflow_gmm)
    prefix_n = jnp.sum(gmm_mask[lev], axis=1)
    gmm_overflow = jnp.sum(jnp.maximum(
        0, prefix_n - gmm_cfg.max_gmm_ellipses)).astype(jnp.int32)
    return gmm_mask, auto_corr.astype(jnp.float32), gmm_overflow


def pack_tab12(cnt, valid, mean, eig_vals, eig_vecs, vol3_mean, com_r,
               ecc_feat, cont_perc):
    """Pack the check-3 stats channels into ONE (4, J=10, 12) f32 table.

    Covers the DIST_BIN_LAYERS levels x first 10 seqs (the slice the
    reference's checkConstellCorrespSim reads, contour_mng.h:1124-1242).
    Channel order [cnt, eig0, eig1, h, comr, mean0, mean1, vec1x, vec1y,
    ecc, perc, ok]; bools ride as 0/1 floats and convert back exactly.
    Stored per scan (ScanDesc.tab12) so the cascade's per-pair stats lookup
    is ONE row gather from the archived store instead of nine small gathers
    plus a per-chunk stack — the largest per-chunk cost in the on-chip
    attribution (+0.32 ms/chunk, scripts/cascade_split_bench.py 2026-08-20).
    """
    from contour_context_tpu.config import DIST_BIN_LAYERS

    lv = jnp.array(DIST_BIN_LAYERS, jnp.int32)
    J = 10
    sl = lambda a: a[lv, :J]
    return jnp.stack([
        sl(cnt).astype(jnp.float32),
        sl(eig_vals)[..., 0], sl(eig_vals)[..., 1],
        sl(vol3_mean), sl(com_r),
        sl(mean)[..., 0], sl(mean)[..., 1],
        sl(eig_vecs)[..., 0, 1], sl(eig_vecs)[..., 1, 1],
        sl(ecc_feat).astype(jnp.float32), sl(cont_perc),
        sl(valid).astype(jnp.float32)], axis=-1)


def tab12_of(desc) -> jnp.ndarray:
    """Recompute ScanDesc.tab12 from a single-scan ScanDesc's own fields
    (checkpoint migration: pre-r4 files zero-fill the trailing leaf)."""
    return pack_tab12(desc.cnt, desc.valid, desc.mean, desc.eig_vals,
                      desc.eig_vecs, desc.vol3_mean, desc.com_r,
                      desc.ecc_feat, desc.cont_perc)


def pack_gmm(mean, manual_cov, cnt, eig_vals, gmm_mask, gmm_cfg) -> jnp.ndarray:
    """Pack the GMM source channels into ONE flat (G*K*8,) f32 row.

    G = len(gmm_cfg.levels), K = gmm_cfg.max_gmm_ellipses; channels
    [mu0, mu1, cov00, cov01, cov10, cov11, w(masked cnt), majax]. Pure
    copies/casts of the per-level slices gmm_from_desc reads, so the
    unpacked GmmScan (db._gather_gmm_impl) is bit-identical to gathering
    the five source leaves — but the store-side lookup becomes ONE flat row
    gather (the five-leaf gather cost +2.2 ms/query at a 131k-scan store,
    on-chip attribution 2026-08-20)."""
    lev = jnp.array(gmm_cfg.levels, jnp.int32)
    K = gmm_cfg.max_gmm_ellipses
    G = len(gmm_cfg.levels)
    ws = jnp.where(gmm_mask[lev][:, :K],
                   cnt[lev][:, :K].astype(jnp.float32), 0.0)
    packed = jnp.concatenate([
        mean[lev][:, :K],                                  # (G, K, 2)
        manual_cov[lev][:, :K].reshape(G, K, 4),
        ws[..., None],
        jnp.sqrt(eig_vals[lev][:, :K][..., 1])[..., None]], axis=-1)
    return packed.reshape(G * K * 8)


def gmm_pack_of(desc, gmm_cfg) -> jnp.ndarray:
    """Recompute ScanDesc.gmm_pack from a single-scan ScanDesc
    (checkpoint migration — the leaf is derived and never persisted)."""
    return pack_gmm(desc.mean, desc.manual_cov, desc.cnt, desc.eig_vals,
                    desc.gmm_mask, gmm_cfg)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "gmm_cfg"))
def build_descriptor(points: jnp.ndarray, cfg: ContourManagerConfig,
                     gmm_cfg: GMMOptConfig = GMMOptConfig()) -> ScanDesc:
    """points (P, 4) [x y z valid] -> ScanDesc. Jit-compiled once per shape.

    Accepts the int16 fixed-point wire format (utils/io.quantize_points_q16,
    1/256 m steps) and dequantizes on device — half the upload bytes on
    bandwidth-limited host links.
    """
    if points.dtype == jnp.int16:
        pf = points.astype(jnp.float32)
        points = jnp.concatenate([pf[:, :3] * (1.0 / 256.0), pf[:, 3:4]],
                                 axis=1)
    nr, nc = cfg.n_row, cfg.n_col
    bev, rowf, colf = rasterize_bev(points, cfg)
    grads = jnp.array(cfg.lv_grads, jnp.float32)
    masks = (bev.reshape(nr, nc)[None] > grads[:, None, None])
    labels = cc_labels(masks, cfg.cc_flush)
    tab = component_tables(labels, masks.reshape(cfg.n_levels, -1),
                           bev, rowf, colf, cfg)
    keys, anch_valid, pix_overflow = make_keys(tab, bev, rowf, colf, cfg)
    # NOTE: cfg.keys_bf16 no longer rounds the ARCHIVED keys (r5): the
    # oracle/checkpoint chain keeps exact f32 keys here; only the DB's
    # maintained search-layout copy (ContourDB.keys_q) is stored bfloat16
    # when the knob is on — the search is the only reader that scans all
    # N*A keys per query, so it alone pays the HBM traffic the knob halves.
    bci = make_bcis(tab, anch_valid, cfg)
    gmm_mask, auto_corr, gmm_overflow = gmm_summary(tab, gmm_cfg)
    return ScanDesc(
        cnt=tab["cnt"].astype(jnp.int16), valid=tab["valid"], mean=tab["mean"],
        eig_vals=tab["eig_vals"], eig_vecs=tab["eig_vecs"],
        manual_cov=tab["manual_cov"], vol3_mean=tab["vol3_mean"],
        com_r=tab["com_r"], ecc_feat=tab["ecc_feat"], cont_perc=tab["cont_perc"],
        layer_cell_cnt=tab["layer_cell_cnt"], n_cont=tab["n_cont"],
        keys=keys, nei_valid=bci["nei_valid"], nei_level=bci["nei_level"],
        nei_seq=bci["nei_seq"], nei_bit=bci["nei_bit"], nei_theta=bci["nei_theta"],
        gmm_mask=gmm_mask, auto_corr=auto_corr,
        pix_overflow=pix_overflow,
        gmm_overflow=gmm_overflow,
        tab12=pack_tab12(tab["cnt"].astype(jnp.float32), tab["valid"],
                         tab["mean"], tab["eig_vals"], tab["eig_vecs"],
                         tab["vol3_mean"], tab["com_r"], tab["ecc_feat"],
                         tab["cont_perc"]),
        gmm_pack=pack_gmm(tab["mean"], tab["manual_cov"], tab["cnt"],
                          tab["eig_vals"], gmm_mask, gmm_cfg),
    )
