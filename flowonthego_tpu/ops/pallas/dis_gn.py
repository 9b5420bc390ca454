"""Fused Gauss-Newton scale solve — the DIS patch optimizer as one kernel.

The XLA envelope path (ops/dis.py) dispatches ~30 small ops per
Gauss-Newton iteration (~40 us/iter at the 4K fine scale for ~10 us of
arithmetic), plus a whole-image window gather and ~15 more ops for the
final per-pixel cost.  This kernel runs the ENTIRE per-scale solve in a
single Pallas invocation with every operand VMEM-resident:

  * iteration 1 (arbitrary warm-start displacement) from pre-gathered
    windows — the one whole-image gather a scale cannot avoid stays
    outside, but its blend, mean-normalization, projection, and outlier
    test happen in-kernel;
  * iterations 2..gd_iter from the displacement-bounded envelope stack
    (every ACCEPTED step satisfies |mid - mid_org| <= outlier_thresh, so
    from the second iteration on, windows live in a small static
    per-patch envelope);
  * the final resample + per-pixel squared residual (densification
    weights).  A patch that tripped the outlier reset sits at p_org —
    exactly where iteration 1 sampled — so its final cost is iteration
    1's captured cost and needs no out-of-envelope sampling
    (optimize.cu:66-88: the reset restores p_org and freezes the patch).

Layout: patches ride the 128-wide lane axis (P padded to a lane-tile
multiple); the per-patch envelope row/column selects become at most
E-K+1 = 2*ceil(outlier_thresh)+3 static shift-slices, each masked by a
per-patch lane predicate:

    W1[r, :, p] = env[oy_p + r, :, p]   ==   sum_s env[s+r, :, p]*(oy_p==s)

— pure VPU multiplies by 0/1 masks, so the arithmetic is bit-exact fp32
(no MXU precision games needed).  The bilinear blend is two static
sublane shifts; the Gauss-Newton reductions are plain axis sums against
the pre-transposed weight stack.

Semantics match ops/dis.optimize's XLA form (optimize.cu:23-94
projection + :66-88 outlier reset + :193-208 final cost).  Wired as the
TPU default through ``cfg.gn_backend`` (ops/dis.optimize packs the
operands); equivalence vs the XLA loop is asserted in interpret mode by
tests/test_dis_gn_pallas.py and on device by the end-to-end EPE.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Radix of the two-stage one-hot shift select in env_window.
_SHIFT_RADIX = 4


def env_padded_dims(E: int, K: int, C: int) -> tuple[int, int]:
    """(rows, lanes) the packer must pad the envelope stack to so the
    radix select's stage-1 band reads never run past the array."""
    n_shift = E - K + 1
    B = _SHIFT_RADIX
    if n_shift <= B + 1:
        return E, E * C
    n_coarse = -(-n_shift // B)
    reach = B * (n_coarse - 1) + K + B - 1
    return max(E, reach), max(E, reach) * C


def _kernel(env_ref, w3_ref, win1_ref, c_ref, s_ref, op_ref, oc_ref, *,
            n_iters: int, E: int, K: int, C: int, ps: int, padding: int,
            thresh: float, l_bound: float, ub_w: float, ub_h: float,
            mean_on: float, n_vals: float):
    # consts [15, P]: midx, midy, p0x, p0y, gx_sum, gy_sum, gxT, gyT,
    #                 h00, h01, h11, det, env start sy, env start sx,
    #                 win1 in-band lane offset (0..BAND-1)
    midx = c_ref[0:1, :]
    midy = c_ref[1:2, :]
    p0x = c_ref[2:3, :]
    p0y = c_ref[3:4, :]
    gx_sum = c_ref[4:5, :]
    gy_sum = c_ref[5:6, :]
    gxT = c_ref[6:7, :]
    gyT = c_ref[7:8, :]
    h00 = c_ref[8:9, :]
    h01 = c_ref[9:10, :]
    h11 = c_ref[10:11, :]
    det = c_ref[11:12, :]
    env_sy = c_ref[12:13, :]
    env_sx = c_ref[13:14, :]
    off1 = c_ref[14:15, :]

    # bf16 sampling mode stores env/w3/win1 at half width in VMEM (the
    # operands dominate the kernel's footprint); all arithmetic is fp32.
    env = env_ref[:].astype(jnp.float32)    # [E, EC, P]
    w3 = w3_ref[:].astype(jnp.float32)      # [3, ps, ps*C, P]: T, gx, gy
    win1 = win1_ref[:].astype(jnp.float32)  # [K, 2*BAND, P] band pair
    KC = K * C
    psc = ps * C
    n_shift = E - K + 1
    off = float(padding - ps // 2)

    def blend(W2, rx, ry):
        """Bilinear 4-shift blend [K, KC, P] -> sample S [ps, psC, P]."""
        w_tl = (1.0 - rx) * (1.0 - ry)
        w_tr = rx * (1.0 - ry)
        w_bl = (1.0 - rx) * ry
        w_br = rx * ry
        return (w_tl * W2[:ps, :psc, :] + w_tr * W2[:ps, C:C + psc, :]
                + w_bl * W2[1:, :psc, :] + w_br * W2[1:, C:C + psc, :])

    def env_window(px, py):
        """(W2, rx, ry) for the envelope window at p = (px, py).

        The per-lane one-hot shift select runs as a RADIX-B two-stage
        decomposition (s = B*q + r): stage 1 selects a coarse band of
        K+B-1 rows with ceil(n_shift/B) masked adds, stage 2 the final K
        rows with B masked adds — ~1.7x fewer VPU flops than the flat
        n_shift-term select at operating point 3/4 geometry (n_shift=15),
        and bit-exact (each output element still receives exactly ONE
        nonzero term per stage; out-of-range selectors yield all-zero
        windows exactly as the flat form did).  env is pre-padded by the
        packer so stage-1 bands never read past the array.
        """
        mx = midx + px
        my = midy + py
        fx = jnp.floor(mx)
        fy = jnp.floor(my)
        oy = fy + off - env_sy     # float compare below (integral values)
        ox = fx + off - env_sx
        B = _SHIFT_RADIX
        n_coarse = -(-n_shift // B)
        P_l = px.shape[1]
        if n_shift <= B + 1:
            # flat select (small envelopes: radix overhead not worth it)
            W1 = jnp.zeros((K, env.shape[1], P_l), jnp.float32)
            for s in range(n_shift):
                W1 = W1 + env[s:s + K, :, :] * \
                    jnp.where(oy == float(s), 1.0, 0.0)
            W2 = jnp.zeros((K, KC, P_l), jnp.float32)
            for s in range(n_shift):
                W2 = W2 + W1[:, s * C:s * C + KC, :] * \
                    jnp.where(ox == float(s), 1.0, 0.0)
            return W2, mx - fx, my - fy
        inv_b = 1.0 / B
        oy_q = jnp.floor(oy * inv_b)
        oy_r = oy - oy_q * B
        ox_q = jnp.floor(ox * inv_b)
        ox_r = ox - ox_q * B
        band = K + B - 1
        # rows, stage 1: T1[t] = env[B*q + t], t < band
        T1 = jnp.zeros((band, env.shape[1], P_l), jnp.float32)
        for q in range(n_coarse):
            T1 = T1 + env[B * q:B * q + band, :, :] * \
                jnp.where(oy_q == float(q), 1.0, 0.0)
        # rows, stage 2: W1[r] = T1[oy_r + r]
        W1 = jnp.zeros((K, env.shape[1], P_l), jnp.float32)
        for r in range(B):
            W1 = W1 + T1[r:r + K, :, :] * \
                jnp.where(oy_r == float(r), 1.0, 0.0)
        # cols, stage 1: bands of (K+B-1)*C lanes
        bandC = band * C
        T2 = jnp.zeros((K, bandC, P_l), jnp.float32)
        for q in range(n_coarse):
            T2 = T2 + W1[:, B * q * C:B * q * C + bandC, :] * \
                jnp.where(ox_q == float(q), 1.0, 0.0)
        # cols, stage 2
        W2 = jnp.zeros((K, KC, P_l), jnp.float32)
        for r in range(B):
            W2 = W2 + T2[:, r * C:r * C + KC, :] * \
                jnp.where(ox_r == float(r), 1.0, 0.0)
        return W2, mx - fx, my - fy

    def cost_of(S):
        """Mean-normalize, subtract template, square (per-pixel l2)."""
        m = jnp.sum(S, axis=(0, 1))[None, :] / n_vals * mean_on
        d = (S - m[None, :, :]) - w3[0]
        return d * d

    def project(px, py, act, S):
        """One Gauss-Newton step + outlier/bounds reset from sample S."""
        red0 = jnp.sum(S, axis=(0, 1))[None, :]
        red2 = jnp.sum(S * w3[1], axis=(0, 1))[None, :]
        red3 = jnp.sum(S * w3[2], axis=(0, 1))[None, :]
        m = red0 / n_vals * mean_on
        dpx = red2 - m * gx_sum - gxT
        dpy = red3 - m * gy_sum - gyT
        delta_px = (h11 * dpx - h01 * dpy) / det
        delta_py = (h00 * dpy - h01 * dpx) / det
        px_new = px - delta_px
        py_new = py - delta_py
        mx_new = midx + px_new
        my_new = midy + py_new
        norm = jnp.sqrt((mx_new - midx) ** 2 + (my_new - midy) ** 2)
        outlier = jnp.where(
            (norm > thresh) | (mx_new < l_bound) | (my_new < l_bound)
            | (mx_new > ub_w) | (my_new > ub_h), 1.0, 0.0)
        px_new = outlier * p0x + (1.0 - outlier) * px_new
        py_new = outlier * p0y + (1.0 - outlier) * py_new
        px = act * px_new + (1.0 - act) * px
        py = act * py_new + (1.0 - act) * py
        return px, py, act * (1.0 - outlier)

    started = s_ref[0:1, :]

    # --- iteration 1: select the K x KC window from the pre-gathered
    # 2*BAND-lane band pair at the per-patch lane offset (radix two-stage
    # masked shifts, exact), then blend at the warm start p_org; capture
    # its per-pixel cost (the final cost of any patch that later trips
    # the outlier reset back to p_org) ---
    B1 = 16
    n_q = (win1.shape[1] // 2) // B1          # BAND / 16 coarse options
    span = KC + B1 - 1
    oq = jnp.floor(off1 * (1.0 / B1))
    orr = off1 - oq * B1
    T1w = jnp.zeros((K, span, win1.shape[2]), jnp.float32)
    for q in range(n_q):
        T1w = T1w + win1[:, B1 * q:B1 * q + span, :] * \
            jnp.where(oq == float(q), 1.0, 0.0)
    Wk1 = jnp.zeros((K, KC, win1.shape[2]), jnp.float32)
    for r in range(B1):
        Wk1 = Wk1 + T1w[:, r:r + KC, :] * \
            jnp.where(orr == float(r), 1.0, 0.0)
    mx1 = midx + p0x
    my1 = midy + p0y
    S1 = blend(Wk1, mx1 - jnp.floor(mx1), my1 - jnp.floor(my1))
    cost1 = cost_of(S1)
    px, py, act = project(p0x, p0y, started, S1)

    # --- iterations 2..gd_iter from the envelope ---
    def body(carry):
        px, py, act = carry
        W2, rx, ry = env_window(px, py)
        return project(px, py, act, blend(W2, rx, ry))

    # fori_loop keeps the program size independent of gd_iter (operating
    # point 4 runs 128 iterations); the static shift loops inside body
    # stay unrolled.  A bit-exact fixed-point early exit (leave the loop
    # once an iteration changes nothing) was tried and REVERTED: a k-sweep
    # at op 4 shows <4% of pixels bitwise-stable even at 96/128
    # iterations — bilinear resampling keeps patches wandering at
    # sub-pixel scale, so the exit never fires tile-wide and its
    # per-iteration cross-lane reduce cost ~5% on op 4.
    px, py, act = jax.lax.fori_loop(0, n_iters, lambda _, c: body(c),
                                    (px, py, act))

    # --- final per-pixel cost at the final midpoint (optimize.cu:193-208)
    # act == 1: never reset -> final p is envelope-bounded, sample there.
    # act == 0 & started: reset to p_org -> iteration 1's cost.
    # never started: zero (the never-sampled ctor state).
    W2f, rxf, ryf = env_window(px, py)
    costf = cost_of(blend(W2f, rxf, ryf))
    op_ref[0:1, :] = px
    op_ref[1:2, :] = py
    oc_ref[:] = started * (act * costf + (1.0 - act) * cost1)


def gn_scale_loop(env_t: jax.Array, w3_t: jax.Array, win1_t: jax.Array,
                  consts: jax.Array, started: jax.Array, *, n_iters: int,
                  E: int, K: int, C: int, ps: int, padding: int,
                  thresh: float, l_bound: float, ub_w: float, ub_h: float,
                  mean_on: float, n_vals: float, tile_lanes: int = 0,
                  interpret: bool = False):
    """Run one scale's full Gauss-Newton solve in one kernel.

    env_t:  [E, E*C, Pp] envelope stack (patches on lanes, Pp % 128 == 0)
    w3_t:   [3, ps, ps*C, Pp] weight stack (template, gx, gy)
    win1_t: [K, 2*BAND, Pp] iteration-1 aligned band pairs (row-take at
      p_org outside — interp.gather_band_pairs; the in-band lane select
      happens in-kernel from consts row 14)
    consts: [15, Pp] per-patch constants (see kernel)
    started: [1, Pp] 1.0 where the patch was not frozen at warm start
    n_iters: envelope iterations to run (= grad_descent_iter - 1)
    tile_lanes: if > 0, run a 1-D grid over patch tiles of this many
      lanes (Pp % tile_lanes == 0) so scales whose whole-batch operands
      exceed VMEM (operating points 3/4: ps=12 grids, up to full-res at
      op 4) still use this kernel — the patch axis is embarrassingly
      parallel, so tiling it is exactly the reference's
      one-block-per-patch grid (optimize.cu:255-256) at a coarser grain.
    Returns (p [2, Pp] final flow, cost_px [ps, ps*C, Pp] final per-pixel
    squared residual, densification-ready).
    """
    kern = functools.partial(
        _kernel, n_iters=n_iters, E=E, K=K, C=C, ps=ps, padding=padding,
        thresh=thresh, l_bound=l_bound, ub_w=ub_w, ub_h=ub_h,
        mean_on=mean_on, n_vals=n_vals)
    Pp = env_t.shape[-1]
    out_shape = (jax.ShapeDtypeStruct((2, Pp), jnp.float32),
                 jax.ShapeDtypeStruct((ps, ps * C, Pp), jnp.float32))
    if tile_lanes and tile_lanes < Pp:
        assert Pp % tile_lanes == 0, (Pp, tile_lanes)
        Pt = tile_lanes

        def lane_spec(shape):
            # Block = full leading dims, one lane tile; grid steps lanes.
            nd = len(shape)
            return pl.BlockSpec(shape[:-1] + (Pt,),
                                lambda i, nd=nd: (0,) * (nd - 1) + (i,))

        return pl.pallas_call(
            kern,
            grid=(Pp // Pt,),
            out_shape=out_shape,
            in_specs=[lane_spec(env_t.shape),
                      lane_spec((3, ps, ps * C, Pp)),
                      lane_spec(win1_t.shape),
                      lane_spec((15, Pp)),
                      lane_spec((1, Pp))],
            out_specs=(lane_spec((2, Pp)),
                       lane_spec((ps, ps * C, Pp))),
            interpret=interpret,
        )(env_t, w3_t, win1_t, consts, started)
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(env_t, w3_t, win1_t, consts, started)
