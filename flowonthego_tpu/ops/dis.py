"""Dense Inverse Search patch optimizer — the hot loop, TPU-native.

Replaces the reference's one-CUDA-block-per-patch persistent kernel
(/root/reference/src/kernels/optimize.cu:97-243) with a batched
Gauss-Newton iteration over the whole patch grid: every patch steps in
lockstep inside a ``lax.fori_loop`` with a per-patch active mask.  On TPU,
uniform work + masked updates beats divergence handling, and the trip
count is statically bounded.

Faithful semantics notes (vs optimize.cu / extract.cu):
  * The GPU port sets min_iter == max_iter == grad_descent_iter, so the
    4-clause convergence test (optimize.cu:225-233) only fires dynamically
    through ``mares <= res_thresh`` (res_thresh = 0) or the outlier reset
    (optimize.cu:66-88) — the loop is effectively fixed-trip.  We replicate
    exactly that: ``gd_iter`` projection+resample trips, with an ``active``
    mask tracking outlier-frozen patches.
  * Iteration order matches the kernel: sample at the initial midpoint
    first, then (project -> resample -> cost) x gd_iter; a patch that
    trips the outlier check still resamples once at its reset midpoint
    before freezing (the while-loop structure at optimize.cu:116-241).
  * The outlier reset restores ``p_org`` (the coarser-scale init), marks
    the patch converged, and keeps its final cost from the reset position.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DISConfig
from .interp import blend_windows, gather_band_pairs, gather_windows, \
    sample_patches_bilinear
from .patches import PatchGrid

# Per-TILE VMEM budget for the fused Pallas Gauss-Newton loop: one lane
# tile's operands (envelope stack + weight stack + consts) plus the
# kernel's largest intermediates must fit comfortably in ~16 MB of VMEM.
_GN_PALLAS_VMEM_LIMIT = 10 << 20

# HBM budget for the per-patch envelope stack [P, E, E, C]; above this the
# optimizer samples each iteration with whole-image gathers instead.
# Sized to cover operating point 4's full-resolution scale at 1024x448
# (~450 MB, transient) — the build/consume traffic is ~1 ms of HBM
# bandwidth, noise next to the compile pathologies the envelope+Pallas
# path avoids (see sample_patches_bilinear_matmul).
_ENVELOPE_BYTES_LIMIT = 512 << 20


def envelope_fits(P: int, E: int, C: int) -> bool:
    """Does the displacement-bounded envelope stack fit the HBM budget?"""
    return P * E * E * C * 4 <= _ENVELOPE_BYTES_LIMIT


def gn_tile_lanes(cfg: DISConfig, n_patches: int, E: int, C: int,
                  ps: int) -> int:
    """Lane-tile width for the fused Pallas GN solve, or 0 for XLA.

    The patch axis is embarrassingly parallel (the reference runs one
    CUDA block per patch, optimize.cu:255-256), so a scale whose whole
    patch batch exceeds VMEM runs the SAME kernel over a 1-D grid of
    lane tiles.  Returns the largest power-of-two tile (128..2048 lanes)
    whose footprint fits the per-tile budget; `pallas` forces the
    single-block form (interpret mode off-TPU, used by equivalence
    tests).
    """
    Pp = max(128, -(-n_patches // 128) * 128)
    if cfg.gn_backend == "pallas":
        return Pp
    if cfg.gn_backend != "auto" or jax.default_backend() != "tpu":
        return 0
    K = ps + 1
    # env is padded for the kernel's radix shift select
    from .pallas.dis_gn import env_padded_dims
    E2, EC2 = env_padded_dims(E, K, C)
    env_elems = E2 * EC2
    # bf16 sampling stores env/weights/windows at half width (upcast on
    # read inside the kernel); scalar state and scratch stay fp32.
    item = 2 if cfg.dtype == "bfloat16" else 4
    # Single block when the whole batch fits (the round-1..3 criterion —
    # device-proven at the published op-2 operating points): no grid, no
    # block pipelining overhead.
    operands = item * Pp * (env_elems + 3 * ps * ps * C + K * 256) \
        + 4 * Pp * 16
    # outputs: p_cur (2, Pp) + cost_px (ps, ps*C, Pp), both fp32 — same
    # footprint the gridded per-lane estimate models below
    outputs = 4 * Pp * (ps * ps * C + 2)
    scratch = 4 * Pp * (K * E * C + K * K * C + 3 * ps * ps * C)
    if operands + outputs + scratch <= _GN_PALLAS_VMEM_LIMIT:
        return Pp
    # Gridded: Mosaic double-buffers each block's operand/output copies
    # (overlapping the grid step's DMA with compute), so the per-lane
    # footprint doubles for operands and outputs; measured headroom for
    # the remaining temporaries is the same scratch term.
    per_lane = (2 * item * (env_elems + 3 * ps * ps * C + K * 256)
                + 2 * 4 * (ps * ps * C + 2) + 4 * 16
                + 4 * (K * E * C + K * K * C + 3 * ps * ps * C))
    for tile in (1024, 512, 256, 128):
        if tile <= Pp and tile * per_lane <= _GN_PALLAS_VMEM_LIMIT:
            return tile
    return 0


def use_pallas_gn(cfg: DISConfig, n_patches: int, E: int, C: int,
                  ps: int) -> bool:
    """Resolve cfg.gn_backend for one scale's fused solve (see
    :func:`gn_tile_lanes`)."""
    return gn_tile_lanes(cfg, n_patches, E, C, ps) > 0


def _run_gn_pallas(state: "PatchState", env4, env_sy, env_sx, win1b, off1,
                   gx_sum, gy_sum, gxT, gyT, h00, h01, h11, det, started,
                   grid: PatchGrid, cfg: DISConfig, E: int, K: int, C: int,
                   mean_on: float):
    """Pack operands patches-on-lanes and run the fused scale solve.

    ``env4``: the envelope stack in grid form [n_h, E, n_w, E*C] (see the
    im2col builder in :func:`optimize`).
    Returns (p_cur [n_h, n_w, 2], cost_px [n_h, n_w, ps, ps, C]).
    """
    from .pallas.dis_gn import gn_scale_loop
    ps = grid.patch_size
    n_h, n_w = started.shape
    P = n_h * n_w
    tile = gn_tile_lanes(cfg, P, E, C, ps) or 128
    Pp = -(-P // tile) * tile
    f32 = jnp.float32
    # Sampling operands keep the envelope's dtype (bf16 under
    # cfg.dtype="bfloat16" — half the VMEM footprint, upcast in-kernel);
    # everything scalar stays fp32.
    samp = env4.dtype

    # Pad the envelope so the kernel's radix-B band reads never run past
    # the array (pallas.dis_gn.env_padded_dims); pad cells are selected
    # only by out-of-range selectors, which zero the window anyway.
    from .pallas.dis_gn import env_padded_dims
    E2, EC2 = env_padded_dims(E, K, C)
    env_t = jnp.pad(env4.transpose(1, 3, 0, 2).reshape(E, E * C, P),
                    ((0, E2 - E), (0, EC2 - E * C), (0, Pp - P)))
    # iteration-1 band pairs [P, K, 2*BAND] (interp.gather_band_pairs);
    # the in-band lane select happens in-kernel from consts row 14
    win1_t = jnp.pad(win1b.astype(samp),
                     ((0, Pp - P), (0, 0), (0, 0))).transpose(1, 2, 0)

    def pps(x):
        return x.reshape(P, ps, ps * C)

    w3 = jnp.stack([pps(state.templates), pps(state.tgrad_x),
                    pps(state.tgrad_y)], 0).astype(samp)
    w3_t = jnp.pad(w3, ((0, 0), (0, Pp - P), (0, 0), (0, 0))
                   ).transpose(0, 2, 3, 1)

    def flat(x):
        return x.reshape(P).astype(f32)

    consts = jnp.stack([
        flat(state.mid_org[..., 0]), flat(state.mid_org[..., 1]),
        flat(state.p_org[..., 0]), flat(state.p_org[..., 1]),
        flat(gx_sum), flat(gy_sum), flat(gxT), flat(gyT),
        flat(h00), flat(h01), flat(h11), flat(det),
        flat(env_sy), flat(env_sx), flat(off1)], 0)
    # Padding lanes get det = 1 so their (discarded) updates stay finite —
    # 0 * NaN would otherwise poison the masked carry.
    consts = jnp.pad(consts, ((0, 0), (0, Pp - P)))
    if Pp > P:
        consts = consts.at[11, P:].set(1.0)
    started_t = jnp.pad(started.reshape(1, P).astype(f32),
                        ((0, 0), (0, Pp - P)))

    p_out, cost_out = gn_scale_loop(
        env_t, w3_t, win1_t, consts, started_t,
        n_iters=cfg.grad_descent_iter - 1,
        E=E, K=K, C=C, ps=ps, padding=grid.padding,
        thresh=cfg.outlier_thresh, l_bound=grid.l_bound,
        ub_w=grid.u_bound_w, ub_h=grid.u_bound_h, mean_on=mean_on,
        n_vals=float(ps * ps * C), tile_lanes=tile,
        interpret=jax.default_backend() != "tpu")
    dtype = state.templates.dtype
    p_cur = jnp.stack([p_out[0, :P].reshape(n_h, n_w),
                       p_out[1, :P].reshape(n_h, n_w)],
                      axis=-1).astype(dtype)
    cost_px = cost_out.transpose(2, 0, 1)[:P].reshape(
        n_h, n_w, ps, ps, C).astype(dtype)
    return p_cur, cost_px


class PatchState(NamedTuple):
    """Struct-of-arrays equivalent of dev_patch_state
    (/root/reference/src/patch.h:15-36), shaped [n_h, n_w] (+ trailing dims).
    """
    p_cur: jax.Array       # [n_h, n_w, 2] current flow (u, v)
    p_org: jax.Array       # [n_h, n_w, 2] init flow (outlier reset target)
    mid_org: jax.Array     # [n_h, n_w, 2] grid midpoint (x, y)
    H: jax.Array           # [n_h, n_w, 3] Hessian (H00, H01, H11)
    templates: jax.Array   # [n_h, n_w, ps, ps, C] mean-normalized template
    tgrad_x: jax.Array     # [n_h, n_w, ps, ps, C] template d/dx
    tgrad_y: jax.Array     # [n_h, n_w, ps, ps, C] template d/dy
    converged: jax.Array   # [n_h, n_w] bool
    cost_px: jax.Array     # [n_h, n_w, ps, ps, C] final per-pixel sq. residual
    diff: jax.Array        # [n_h, n_w, ps, ps, C] residual (target - template)

    @property
    def mid_cur(self) -> jax.Array:
        return self.mid_org + self.p_cur


def init_state(templates, tgrad_x, tgrad_y, H, grid: PatchGrid) -> PatchState:
    """Fresh per-scale state (PatGridClass ctor init, patchgrid.cpp:124-147)."""
    mx, my = grid.midpoints()
    mid_org = jnp.stack([jnp.asarray(mx), jnp.asarray(my)], axis=-1)
    zeros2 = jnp.zeros((grid.n_h, grid.n_w, 2), templates.dtype)
    return PatchState(
        p_cur=zeros2,
        p_org=zeros2,
        mid_org=mid_org.astype(templates.dtype),
        H=H,
        templates=templates,
        tgrad_x=tgrad_x,
        tgrad_y=tgrad_y,
        converged=jnp.zeros((grid.n_h, grid.n_w), jnp.bool_),
        cost_px=jnp.zeros_like(templates),
        diff=jnp.zeros_like(templates),
    )


def init_from_coarser(state: PatchState, coarse_flow: jax.Array,
                      grid: PatchGrid) -> PatchState:
    """Warm-start from the coarser scale's dense flow.

    Mirrors kernelInitCoarserOF (extract.cu:125-164): nearest lookup at
    floor(midpoint / 2), flow scaled x2 — deliberately *not* bilinear.
    Patches whose warm-started midpoint leaves the valid box are frozen
    (converged) immediately with zero cost.

    The midpoint grid is static, so the lookup compiles to a constant-index
    gather of the [h/2, w/2, 2] coarse flow.
    """
    mx, my = grid.midpoints()
    ix = (mx.astype(int) // 2).astype(int)
    iy = (my.astype(int) // 2).astype(int)
    p = coarse_flow[iy, ix, :] * 2.0  # [n_h, n_w, 2]

    mid = state.mid_org + p
    oob = ((mid[..., 0] < grid.l_bound) | (mid[..., 1] < grid.l_bound)
           | (mid[..., 0] > grid.u_bound_w) | (mid[..., 1] > grid.u_bound_h))
    return state._replace(p_cur=p, p_org=p, converged=oob)


def _sample_residual(state: PatchState, I1_pad, grid: PatchGrid,
                     cfg: DISConfig, sample_offset=None):
    """Resample target patch at mid_cur, mean-normalize, subtract template.

    ``sample_offset`` (optional [2] integer offset, may be traced) maps
    global midpoints into the coordinate frame of ``I1_pad`` — used by the
    row-sharded path where I1_pad is a local strip.

    Returns (diff, cost_px, cost) — optimize.cu:125-209.
    """
    mid = state.mid_cur
    if sample_offset is not None:
        mid = mid + sample_offset
    raw = sample_patches_bilinear(I1_pad, mid[..., 0], mid[..., 1],
                                  grid.patch_size, grid.padding)
    if cfg.use_mean_normalization:
        raw = raw - raw.mean(axis=(2, 3, 4), keepdims=True)
    diff = raw - state.templates
    if cfg.cost_fn == "l1":
        # sign(d) * sqrt(|d|)  (kroeger/patch.cpp:240-247)
        diff = jnp.sign(diff) * jnp.sqrt(jnp.abs(diff))
        cost_px = jnp.abs(diff)
    elif cfg.cost_fn == "huber":
        # sign(d) * sqrt(2 b^2 (sqrt(1 + d^2/b^2) - 1))  (patch.cpp:248-261)
        b2 = cfg.norm_outlier * cfg.norm_outlier
        diff = jnp.sign(diff) * jnp.sqrt(
            2.0 * b2 * (jnp.sqrt(1.0 + diff * diff / b2) - 1.0))
        cost_px = jnp.abs(diff)
    else:
        cost_px = diff * diff
    cost = cost_px.sum(axis=(2, 3, 4))
    return diff, cost_px, cost


def _where(mask, a, b):
    """Broadcast a [n_h, n_w] mask over trailing dims of a/b."""
    extra = a.ndim - mask.ndim
    return jnp.where(mask.reshape(mask.shape + (1,) * extra), a, b)


def optimize_reference(state: PatchState, I1_pad: jax.Array, grid: PatchGrid,
                       cfg: DISConfig, sample_offset=None) -> PatchState:
    """Direct transcription of the reference loop (materializes the
    normalized residual tensor every iteration).  Kept as the behavior
    oracle for :func:`optimize`, and used when ``res_thresh > 0`` or the
    cost is non-quadratic (L1 / pseudo-Huber).

    ``sample_offset`` maps global midpoints into a local strip's frame
    (see :func:`_sample_residual`) so these modes also run row-sharded;
    the outlier/bounds checks stay in global coordinates.

    Equivalent of cu::interpolateAndComputeErr's in-kernel while loop
    (optimize.cu:97-243) + calcProjection (optimize.cu:23-94).
    """
    # mares normalizer: values per patch, channel-generic (the config's
    # n_vals property assumes RGB; gray/gradmag inputs have C=1)
    n_vals = float(np.prod(state.templates.shape[2:]))
    out_thresh = cfg.outlier_thresh

    # min_iter semantics (kroeger/oflow.h:37-38): below min_iter the dp/dr
    # early-exit clauses are suppressed.  None = fixed-trip GPU semantics.
    max_iter = cfg.grad_descent_iter
    min_iter = max_iter if cfg.min_iter is None else cfg.min_iter

    # --- initial resample at the warm-started midpoint (count == 0) ---
    active0 = ~state.converged
    diff, cost_px, cost = _sample_residual(state, I1_pad, grid, cfg,
                                           sample_offset)
    diff = _where(active0, diff, state.diff)
    cost_px = _where(active0, cost_px, state.cost_px)
    mares = cost / n_vals
    newly_done = active0 & (mares <= cfg.res_thresh)
    state = state._replace(diff=diff, cost_px=cost_px,
                           converged=state.converged | newly_done)
    # per-patch carries for the dp/dr clauses (patch.cpp:264-282):
    # previous-iteration mares and the first-iteration |delta_p|^2
    mares_prev = mares
    dp_init = jnp.full_like(mares, 1e-10)

    def body(i, carry):
        st, mares_prev, dp_init = carry
        cnt = i + 1                      # per-patch cnt == trip count while
        active = ~st.converged           # active (all start together)

        # --- projection: delta_p = H^-1 J^T diff (calcProjection) ---
        dpx = (st.tgrad_x * st.diff).sum(axis=(2, 3, 4))
        dpy = (st.tgrad_y * st.diff).sum(axis=(2, 3, 4))
        h00, h01, h11 = st.H[..., 0], st.H[..., 1], st.H[..., 2]
        det = h00 * h11 - h01 * h01
        delta_px = (h11 * dpx - h01 * dpy) / det
        delta_py = (h00 * dpy - h01 * dpx) / det
        delta = jnp.stack([delta_px, delta_py], axis=-1)

        p_new = st.p_cur - delta
        mid_new = st.mid_org + p_new

        # Outlier / bounds check (optimize.cu:66-88): displacement beyond
        # ps/2 or midpoint outside the valid box -> reset to p_org, freeze.
        disp = mid_new - st.mid_org
        norm = jnp.sqrt(disp[..., 0] ** 2 + disp[..., 1] ** 2)
        outlier = ((norm > out_thresh)
                   | (mid_new[..., 0] < grid.l_bound)
                   | (mid_new[..., 1] < grid.l_bound)
                   | (mid_new[..., 0] > grid.u_bound_w)
                   | (mid_new[..., 1] > grid.u_bound_h))
        p_new = _where(outlier, st.p_org, p_new)

        p_cur = _where(active, p_new, st.p_cur)
        st = st._replace(p_cur=p_cur)

        # --- resample + cost at the updated midpoint ---
        diff, cost_px, cost = _sample_residual(st, I1_pad, grid, cfg,
                                               sample_offset)
        diff = _where(active, diff, st.diff)
        cost_px = _where(active, cost_px, st.cost_px)
        mares = cost / n_vals

        # |delta_p|^2 of the solved step (pre-reset, patch.cpp:272); the
        # first iteration's value becomes the dp-ratio denominator
        dp_sq = delta_px * delta_px + delta_py * delta_py
        dp_init = jnp.where(active & (cnt == 1), dp_sq, dp_init)

        # 4-clause convergence test (patch.cpp:277-282 / optimize.cu:
        # 225-233): continue iff under max_iter, above res_thresh, and —
        # once past min_iter — the step and residual are still shrinking.
        past_min = cnt >= min_iter
        keep_going = ((cnt < max_iter) & (mares > cfg.res_thresh)
                      & (~past_min | (dp_sq / dp_init >= cfg.dp_thresh))
                      & (~past_min | (mares / mares_prev <= cfg.dr_thresh)))
        done_now = active & (outlier | ~keep_going)
        mares_prev = jnp.where(active, mares, mares_prev)
        st = st._replace(diff=diff, cost_px=cost_px,
                         converged=st.converged | done_now)
        return st, mares_prev, dp_init

    state, _, _ = jax.lax.fori_loop(0, cfg.grad_descent_iter, body,
                                    (state, mares_prev, dp_init))
    return state._replace(converged=jnp.ones_like(state.converged))


def optimize(state: PatchState, I1_pad: jax.Array, grid: PatchGrid,
             cfg: DISConfig, sample_offset=None) -> PatchState:
    """Fast inverse-search loop: reduction-form Gauss-Newton.

    Mathematically equivalent to :func:`optimize_reference` (the CUDA
    kernel's semantics) but restructured for TPU bandwidth: each
    iteration touches only the gathered (ps+1)^2 windows once.  The key
    identities, with S the mean-UNnormalized bilinear sample, m = sum(S)/N,
    T the mean-normalized template (sum(T) = 0), diff = (S - m) - T:

        J^T diff:  sum(g.diff) = sum(g.S) - m*sum(g) - sum(g.T)

    so the projection needs only the four linear reductions
    [sum(S), sum(T.S), sum(gx.S), sum(gy.S)] — computed as ONE batched
    matvec against a static per-scale weight stack — plus static
    per-patch constants.  No residual tensor is materialized until the
    final per-pixel cost for densification.

    The reference's ``mares <= res_thresh`` early exit is dropped when
    res_thresh == 0 (the default): zero residual implies a zero
    Gauss-Newton step, so continuing to iterate is a fixed point and the
    final state is identical.  For res_thresh > 0 we defer to the
    reference-form loop.
    """
    if (cfg.res_thresh > 0.0 or cfg.cost_fn != "l2"
            or (cfg.min_iter is not None
                and cfg.min_iter < cfg.grad_descent_iter)):
        # non-quadratic costs transform the residual before projection
        # (the linear-reduction shortcut only holds for plain L2), and the
        # dp/dr early-exit clauses need the materialized residual too
        return optimize_reference(state, I1_pad, grid, cfg, sample_offset)

    ps = grid.patch_size
    n_h, n_w = state.converged.shape
    C = state.templates.shape[-1]
    N = ps * ps * C
    dtype = state.templates.dtype

    # Static per-patch weight stack [n_h, n_w, 4, N] and constants.
    ones = jnp.ones_like(state.templates)
    W4 = jnp.stack([ones, state.templates, state.tgrad_x, state.tgrad_y],
                   axis=-1).reshape(n_h, n_w, N, 4)
    # Optional bf16 sampling path: halves the window-gather and matvec
    # traffic; the reductions and all scalar state stay f32.  EPE impact
    # is sub-percent (see tests/bench); opt in with cfg.dtype="bfloat16".
    bf16 = cfg.dtype == "bfloat16"
    I1_s = I1_pad.astype(jnp.bfloat16) if bf16 else I1_pad
    W4_s = W4.astype(jnp.bfloat16) if bf16 else W4
    gx_sum = state.tgrad_x.sum(axis=(2, 3, 4))
    gy_sum = state.tgrad_y.sum(axis=(2, 3, 4))
    gxT = (state.tgrad_x * state.templates).sum(axis=(2, 3, 4))
    gyT = (state.tgrad_y * state.templates).sum(axis=(2, 3, 4))
    h00, h01, h11 = state.H[..., 0], state.H[..., 1], state.H[..., 2]
    det = h00 * h11 - h01 * h01
    mean_on = 1.0 if cfg.use_mean_normalization else 0.0

    started = ~state.converged    # patches frozen at warm-start never sample

    def finish(win, rx, ry):
        if bf16:
            rx = rx.astype(jnp.bfloat16)
            ry = ry.astype(jnp.bfloat16)
        S = blend_windows(win, rx, ry).reshape(n_h, n_w, N)
        # one pass: batched matvec against the static weight stack
        return jnp.einsum("hwk,hwki->hwi", S, W4_s,
                          preferred_element_type=jnp.float32).astype(dtype)

    def reductions(p_cur):
        """[sum S, sum T.S, sum gx.S, sum gy.S] at midpoint mid_org + p."""
        mid = state.mid_org + p_cur
        if sample_offset is not None:
            mid = mid + sample_offset
        win, rx, ry = gather_windows(I1_s, mid[..., 0], mid[..., 1],
                                     ps, grid.padding)
        return finish(win, rx, ry)

    # ---- displacement-bounded envelope sampling (iterations 2..) ----
    # Every ACCEPTED Gauss-Newton step satisfies |mid - mid_org| <=
    # outlier_thresh (the reset at optimize.cu:66-88), and mid_org is the
    # static grid midpoint — so from the second iteration on, windows live
    # inside a small static per-patch envelope.  Gathering from the
    # envelope replaces the whole-image one-hot contraction (22 MB of
    # operand traffic per iteration at the 4K fine scale) with tiny
    # [K, E] selects.  Patches outside the envelope are exactly the
    # frozen ones, whose samples are masked anyway.
    #
    # The stack itself is a REGULAR tiling of the level image (row starts
    # depend only on the grid row, column starts only on the grid column,
    # both with stride ``steps``), so it is built with static im2col
    # slices + concats — no one-hot matmuls, no per-patch gathers.
    # Starts are NOT clipped; instead the image is zero-extended by the
    # overhang.  Sound because an active in-box midpoint only ever
    # selects envelope cells that lie inside the real padded image (the
    # shift index oy = floor(my)+off-sy0 stays in [R-thresh, thresh+R+1]
    # for accepted steps); the zero-filled slack cells are reachable only
    # by frozen patches, whose samples are masked.
    Hp, Wp = I1_pad.shape[0], I1_pad.shape[1]
    R = int(np.ceil(cfg.outlier_thresh))
    K = ps + 1
    E = K + 2 * (R + 1)
    P = n_h * n_w
    st = grid.steps
    env_ok = (sample_offset is None and E <= Hp and E <= Wp
              and envelope_fits(P, E, C))
    if env_ok:
        base_y = grid.offset_h + grid.padding - ps // 2 - (R + 1)
        base_x = grid.offset_w + grid.padding - ps // 2 - (R + 1)
        kseg = -(-E // st)                 # im2col segments per axis
        pre_y = max(0, -base_y)
        pre_x = max(0, -base_x)
        post_y = max(0, base_y + pre_y + (n_h + kseg - 1) * st
                     - (Hp + pre_y))
        post_x = max(0, base_x + pre_x + (n_w + kseg - 1) * st
                     - (Wp + pre_x))
        flat = I1_s.reshape(Hp, Wp * C)
        flat = jnp.pad(flat, ((pre_y, post_y), (pre_x * C, post_x * C)))
        top = base_y + pre_y
        left = (base_x + pre_x) * C
        rows = jnp.concatenate(
            [flat[top + a * st: top + (a + n_h) * st].reshape(
                n_h, st, flat.shape[1]) for a in range(kseg)],
            axis=1)[:, :E]                 # [n_h, E, W'']
        env4 = jnp.concatenate(
            [jax.lax.slice_in_dim(
                rows, left + b * st * C, left + (b + n_w) * st * C,
                axis=2).reshape(n_h, E, n_w, st * C) for b in range(kseg)],
            axis=3)[..., :E * C]           # [n_h, E, n_w, EC]
        my0 = np.arange(n_h) * st + base_y
        mx0 = np.arange(n_w) * st + base_x
        env_sy = jnp.asarray(np.broadcast_to(my0[:, None], (n_h, n_w)),
                             jnp.int32)
        env_sx = jnp.asarray(np.broadcast_to(mx0[None, :], (n_h, n_w)),
                             jnp.int32)
        prec = jax.lax.Precision.HIGHEST
        env_p = env4.transpose(0, 2, 1, 3).reshape(P, E, E * C)

        def reductions_env(p_cur):
            env = env_p
            mid = state.mid_org + p_cur
            fx = jnp.floor(mid[..., 0])
            fy = jnp.floor(mid[..., 1])
            rx = mid[..., 0] - fx
            ry = mid[..., 1] - fy
            oy = (fy.astype(jnp.int32) + (grid.padding - ps // 2)
                  - env_sy).reshape(P)
            ox = (fx.astype(jnp.int32) + (grid.padding - ps // 2)
                  - env_sx).reshape(P)
            # row select [P, K, E]: e == oy + r
            ee = jax.lax.broadcasted_iota(jnp.int32, (P, K, E), 2)
            rr = jax.lax.broadcasted_iota(jnp.int32, (P, K, E), 1)
            rows = (ee - rr == oy[:, None, None]).astype(env.dtype)
            W1 = jax.lax.dot_general(
                rows, env, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec).astype(env.dtype)       # [P, K, E*C]
            # column+channel select [P, E*C, K*C]: m - n == ox*C
            mm = jax.lax.broadcasted_iota(jnp.int32, (P, E * C, K * C), 1)
            nn = jax.lax.broadcasted_iota(jnp.int32, (P, E * C, K * C), 2)
            cols = (mm - nn == (ox * C)[:, None, None]).astype(env.dtype)
            win = jax.lax.dot_general(
                W1, cols, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec).astype(env.dtype)
            win = win.reshape(n_h, n_w, K, K, C)
            return finish(win, rx, ry)
    else:
        reductions_env = reductions

    def gn_step(p_cur, active, red_fn):
        red = red_fn(p_cur)
        m = red[..., 0] / N * mean_on
        dpx = red[..., 2] - m * gx_sum - gxT
        dpy = red[..., 3] - m * gy_sum - gyT
        delta_px = (h11 * dpx - h01 * dpy) / det
        delta_py = (h00 * dpy - h01 * dpx) / det
        p_new = p_cur - jnp.stack([delta_px, delta_py], axis=-1)
        mid_new = state.mid_org + p_new
        disp = mid_new - state.mid_org
        norm = jnp.sqrt(disp[..., 0] ** 2 + disp[..., 1] ** 2)
        outlier = ((norm > cfg.outlier_thresh)
                   | (mid_new[..., 0] < grid.l_bound)
                   | (mid_new[..., 1] < grid.l_bound)
                   | (mid_new[..., 0] > grid.u_bound_w)
                   | (mid_new[..., 1] > grid.u_bound_h))
        p_new = _where(outlier, state.p_org, p_new)
        p_cur = _where(active, p_new, p_cur)
        return p_cur, active & ~outlier

    def body(_, carry):
        return gn_step(*carry, reductions_env)

    if (env_ok and cfg.grad_descent_iter >= 1
            and use_pallas_gn(cfg, P, E, C, ps)):
        # The WHOLE scale solve in ONE Pallas launch (the analogue of the
        # reference's persistent kernel, optimize.cu:97-243): only the
        # iteration-1 window gather (arbitrary warm-start displacement)
        # stays outside; the kernel runs iteration 1, the envelope loop,
        # and the final per-pixel cost (a reset patch's final position is
        # its warm start — exactly where iteration 1 sampled — so the
        # kernel reuses that captured cost instead of resampling outside
        # the envelope).  ``diff`` (the signed residual tensor) is not
        # materialized on this path — nothing downstream of a fixed-trip
        # l2 solve consumes it (densification weights come from cost_px).
        mid0 = state.mid_org + state.p_cur
        win1b, off1, _, _ = gather_band_pairs(I1_s, mid0[..., 0],
                                              mid0[..., 1], ps,
                                              grid.padding)
        p_cur, cost_px = _run_gn_pallas(
            state, env4, env_sy, env_sx, win1b, off1, gx_sum, gy_sum, gxT,
            gyT, h00, h01, h11, det, started, grid, cfg, E, K, C, mean_on)
        return state._replace(p_cur=p_cur, cost_px=cost_px,
                              diff=jnp.zeros_like(state.diff),
                              converged=jnp.ones_like(state.converged))

    # The first step samples at the warm start (arbitrary displacement,
    # general gather); accepted positions afterwards are envelope-bounded.
    p_cur, active = state.p_cur, started
    if cfg.grad_descent_iter > 0:
        p_cur, active = gn_step(p_cur, active, reductions)
    if cfg.grad_descent_iter > 1:
        p_cur, _ = jax.lax.fori_loop(1, cfg.grad_descent_iter, body,
                                     (p_cur, active))

    # Final per-pixel cost at the final midpoint (reference computes it in
    # its last resample, optimize.cu:193-208); frozen-at-init patches keep
    # zero cost, matching the never-sampled ctor state.
    st = state._replace(p_cur=p_cur)
    diff, cost_px, _ = _sample_residual(st, I1_pad, grid, cfg, sample_offset)
    cost_px = _where(started, cost_px, jnp.zeros_like(cost_px))
    diff = _where(started, diff, jnp.zeros_like(diff))
    return st._replace(diff=diff, cost_px=cost_px,
                       converged=jnp.ones_like(state.converged))
