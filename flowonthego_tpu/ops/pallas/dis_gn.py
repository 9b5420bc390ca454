"""Fused Gauss-Newton envelope loop — the DIS patch solve as one kernel.

The XLA envelope path (ops/dis.py) still dispatches ~30 small ops per
Gauss-Newton iteration (~40 us/iter at the 4K fine scale for ~10 us of
arithmetic).  This kernel runs ALL envelope iterations (2..gd_iter) in a
single Pallas invocation with every operand VMEM-resident.

Layout: patches ride the 128-wide lane axis (P padded to a lane-tile
multiple); the per-patch envelope row/column selects become at most
E-K+1 = 2*ceil(outlier_thresh)+3 static shift-slices, each masked by a
per-patch lane predicate:

    W1[r, :, p] = env[oy_p + r, :, p]   ==   sum_s env[s+r, :, p]*(oy_p==s)

— pure VPU multiplies by 0/1 masks, so the arithmetic is bit-exact fp32
(no MXU precision games needed).  The bilinear blend is two static
sublane shifts; the four Gauss-Newton reductions are plain axis sums
against the pre-transposed weight stack.

Semantics match ops/dis.optimize's envelope iterations exactly
(optimize.cu:23-94 projection + :66-88 outlier reset).  Wired as the TPU
default through ``cfg.gn_backend`` (ops/dis.optimize packs the operands);
equivalence vs the XLA envelope loop is asserted in interpret mode by
tests/test_dis_gn_pallas.py and on device by the end-to-end EPE.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(env_ref, w4_ref, c_ref, p_ref, o_ref, *, n_iters: int, E: int,
            K: int, C: int, ps: int, padding: int, thresh: float,
            l_bound: float, ub_w: float, ub_h: float, mean_on: float,
            n_vals: float):
    # consts [12, P]: midx, midy, p0x, p0y, gx_sum, gy_sum, gxT, gyT,
    #                 h00, h01, h11, det   (env start sy/sx in c2 [2, P])
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

    # bf16 sampling mode stores env/w4 at half width in VMEM (the operands
    # dominate the kernel's footprint); all arithmetic stays fp32.
    env = env_ref[:].astype(jnp.float32)   # [E, EC, P]
    w4 = w4_ref[:].astype(jnp.float32)     # [4, ps, ps*C, P]
    KC = K * C
    n_shift = E - K + 1

    def body(carry):
        px, py, act = carry   # [1, P] f32, f32, f32(0/1)
        mx = midx + px
        my = midy + py
        fx = jnp.floor(mx)
        fy = jnp.floor(my)
        rx = mx - fx
        ry = my - fy
        off = float(padding - ps // 2)
        oy = fy + off - env_sy     # float compare below (integral values)
        ox = fx + off - env_sx

        # rows: W1[r, :, p] = env[oy_p + r, :, p]
        W1 = jnp.zeros((K, env.shape[1], px.shape[1]), jnp.float32)
        for s in range(n_shift):
            W1 = W1 + env[s:s + K, :, :] * \
                jnp.where(oy == float(s), 1.0, 0.0)
        # cols: W2[r, kc, p] = W1[r, ox_p*C + kc, p]
        W2 = jnp.zeros((K, KC, px.shape[1]), jnp.float32)
        for s in range(n_shift):
            W2 = W2 + W1[:, s * C:s * C + KC, :] * \
                jnp.where(ox == float(s), 1.0, 0.0)

        # bilinear 4-shift blend -> S [ps, ps*C, P]
        w_tl = (1.0 - rx) * (1.0 - ry)
        w_tr = rx * (1.0 - ry)
        w_bl = (1.0 - rx) * ry
        w_br = rx * ry
        psc = ps * C
        S = (w_tl * W2[:ps, :psc, :] + w_tr * W2[:ps, C:C + psc, :]
             + w_bl * W2[1:, :psc, :] + w_br * W2[1:, C:C + psc, :])

        # reductions [sum S, sum T.S, sum gx.S, sum gy.S]
        red0 = jnp.sum(S * w4[0], axis=(0, 1))[None, :]
        red2 = jnp.sum(S * w4[2], axis=(0, 1))[None, :]
        red3 = jnp.sum(S * w4[3], axis=(0, 1))[None, :]

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
        act = act * (1.0 - outlier)
        return px, py, act

    px = p_ref[0:1, :]
    py = p_ref[1:2, :]
    act = p_ref[2:3, :]
    # fori_loop keeps the program size independent of gd_iter (operating
    # point 4 runs 128 iterations); the static shift loops inside body
    # stay unrolled.
    carry = jax.lax.fori_loop(0, n_iters, lambda _, c: body(c),
                              (px, py, act))
    o_ref[0:1, :] = carry[0]
    o_ref[1:2, :] = carry[1]


def gn_envelope_loop(env_t: jax.Array, w4_t: jax.Array, consts: jax.Array,
                     pstate: jax.Array, *, n_iters: int, E: int, K: int,
                     C: int, ps: int, padding: int, thresh: float,
                     l_bound: float, ub_w: float, ub_h: float,
                     mean_on: float, n_vals: float,
                     interpret: bool = False) -> jax.Array:
    """Run ``n_iters`` envelope GN iterations in one kernel.

    env_t:  [E, E*C, Pp] envelope stack (patches on lanes, Pp % 128 == 0)
    w4_t:   [4, ps, ps*C, Pp] weight stack (ones, template, gx, gy)
    consts: [14, Pp] per-patch constants (see kernel)
    pstate: [3, Pp] = (p_cur_x, p_cur_y, active)
    Returns [2, Pp] final (p_cur_x, p_cur_y).
    """
    kern = functools.partial(
        _kernel, n_iters=n_iters, E=E, K=K, C=C, ps=ps, padding=padding,
        thresh=thresh, l_bound=l_bound, ub_w=ub_w, ub_h=ub_h,
        mean_on=mean_on, n_vals=n_vals)
    Pp = env_t.shape[-1]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((2, Pp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(env_t, w4_t, consts, pstate)
