"""Fused variational-refinement inner loop as one Pallas TPU kernel.

The XLA formulation (ops/variational.py) issues ~100 small stencil ops
per inner iteration; at the reference's operating points the refined
fields are tiny (<= ~128x128), so the whole fixed-point loop fits in
VMEM and the per-op overhead dominates.  This kernel runs the complete
inner loop — smoothness, robust data term, sub-Laplacian, red-black SOR,
flow update (refine_variational.cpp:189-226) — in a single kernel
invocation with every operand VMEM-resident.

Warp + image derivatives stay outside (computed once per refine call,
they involve gathers which the VPU does not do natively).

Semantics identical to ops/variational.py (checked by equivalence tests
in interpret mode and on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import DISConfig
from ..variational import (DATANORM, EPS_COLOR, EPS_GRAD, EPS_SMOOTH,
                           Derivatives, get_derivatives, warp_image)


def _shift(x, dy, dx):
    """result[j, i] = x[j+dy, i+dx], zero-filled at the borders."""
    h, w = x.shape[-2], x.shape[-1]
    out = x
    if dy:
        out = pltpu.roll(out, (-dy) % h, axis=out.ndim - 2)
        jj = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 2)
        keep = (jj < h + dy) if dy > 0 else (jj >= -dy)
        out = jnp.where(keep, out, 0.0)
    if dx:
        out = pltpu.roll(out, (-dx) % w, axis=out.ndim - 1)
        ii = jax.lax.broadcasted_iota(jnp.int32, out.shape, out.ndim - 1)
        keep = (ii < w + dx) if dx > 0 else (ii >= -dx)
        out = jnp.where(keep, out, 0.0)
    return out


def _shift_edge(x, dx_sign):
    """result[j, i] = x[j, i+1] with edge-replicated last column (dx_sign=+1)
    or x[j, i-1] with first column replicated (-1)."""
    w = x.shape[-1]
    out = pltpu.roll(x, (-dx_sign) % w, axis=x.ndim - 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if dx_sign > 0:
        return jnp.where(ii < w - 1, out, x)
    return jnp.where(ii >= 1, out, x)


def _shift_edge_rows(x, dy_sign):
    h = x.shape[-2]
    out = pltpu.roll(x, (-dy_sign) % h, axis=x.ndim - 2)
    jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    if dy_sign > 0:
        return jnp.where(jj < h - 1, out, x)
    return jnp.where(jj >= 1, out, x)


def _deriv3_x(x):
    return 0.5 * (_shift_edge(x, +1) - _shift_edge(x, -1))


def _deriv3_y(x):
    return 0.5 * (_shift_edge_rows(x, +1) - _shift_edge_rows(x, -1))


def _kernel(wx_ref, wy_ref, mask_ref, dIs_ref, uu_ref, vv_ref, *,
            inner_iter: int, solve_iter: int, omega: float, qa: float,
            hd3: float, hg3: float):
    h, w = wx_ref.shape
    wx = wx_ref[:]
    wy = wy_ref[:]
    mask = mask_ref[:]
    # dIs: [8, 3, h, w] = Ix, Iy, Iz, Ixx, Ixy, Iyy, Ixz, Iyz
    Ix = dIs_ref[0]
    Iy = dIs_ref[1]
    Iz = dIs_ref[2]
    Ixx = dIs_ref[3]
    Ixy = dIs_ref[4]
    Iyy = dIs_ref[5]
    Ixz = dIs_ref[6]
    Iyz = dIs_ref[7]

    jj = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    parity = (ii + jj) % 2
    last_col = ii == w - 1
    last_row = jj == h - 1

    # precomputed data-term normalizers (constant across iterations)
    n_col = Ix * Ix + Iy * Iy + DATANORM                 # [3, h, w]
    n1 = Ixx * Ixx + Ixy * Ixy + DATANORM
    n2 = Iyy * Iyy + Ixy * Ixy + DATANORM

    du = jnp.zeros((h, w), jnp.float32)
    dv = jnp.zeros((h, w), jnp.float32)
    uu = wx
    vv = wy

    for _ in range(inner_iter):
        # ---- smoothness (flowUtil.cu:390-423) ----
        ux = _deriv3_x(uu)
        uy = _deriv3_y(uu)
        vx = _deriv3_x(vv)
        vy = _deriv3_y(vv)
        s = qa * jax.lax.rsqrt(ux * ux + uy * uy + vx * vx + vy * vy
                               + EPS_SMOOTH)
        s_h = jnp.where(last_col, 0.0, s + _shift(s, 0, 1))
        s_v = jnp.where(last_row, 0.0, s + _shift(s, 1, 0))

        # ---- data term (flowUtil.cu:27-151) ----
        due = du[None]
        dve = dv[None]
        r = Iz + Ix * due + Iy * dve
        t = mask * hd3 * jax.lax.rsqrt((r * r / n_col).sum(0) + EPS_COLOR)
        tc = t[None] / n_col
        a11 = (tc * Ix * Ix).sum(0)
        a12 = (tc * Ix * Iy).sum(0)
        a22 = (tc * Iy * Iy).sum(0)
        b1 = -(tc * Iz * Ix).sum(0)
        b2 = -(tc * Iz * Iy).sum(0)

        r1 = Ixz + Ixx * due + Ixy * dve
        r2 = Iyz + Ixy * due + Iyy * dve
        t = mask * hg3 * jax.lax.rsqrt(
            (r1 * r1 / n1 + r2 * r2 / n2).sum(0) + EPS_GRAD)
        t1 = t[None] / n1
        t2 = t[None] / n2
        a11 += (t1 * Ixx * Ixx + t2 * Ixy * Ixy).sum(0)
        a12 += (t1 * Ixx * Ixy + t2 * Ixy * Iyy).sum(0)
        a22 += (t2 * Iyy * Iyy + t1 * Ixy * Ixy).sum(0)
        b1 -= (t1 * Ixx * Ixz + t2 * Ixy * Iyz).sum(0)
        b2 -= (t2 * Iyy * Iyz + t1 * Ixy * Ixz).sum(0)

        # ---- sub-Laplacian of the base flow (flowUtil.cu:153-295) ----
        for (b_acc, src) in ((0, wx), (1, wy)):
            ch = s_h * (_shift_edge(src, +1) - src)
            ch = jnp.where(last_col, 0.0, ch)
            cv = s_v * (_shift_edge_rows(src, +1) - src)
            cv = jnp.where(last_row, 0.0, cv)
            upd = ch - _shift(ch, 0, -1) + cv - _shift(cv, -1, 0)
            if b_acc == 0:
                b1 = b1 + upd
            else:
                b2 = b2 + upd

        # ---- red-black SOR (flowUtil.cu:297-362, 651-706) ----
        s_v_up = _shift(s_v, -1, 0)
        s_h_left = _shift(s_h, 0, -1)
        sum_dpsis = s_v_up + s_h_left + s_v + s_h
        A11 = a11 + sum_dpsis
        A22 = a22 + sum_dpsis

        def half_sweep(du, dv, want):
            sig_u = -(s_v_up * _shift(du, -1, 0) + s_h_left * _shift(du, 0, -1)
                      + s_v * _shift(du, 1, 0) + s_h * _shift(du, 0, 1))
            sig_v = -(s_v_up * _shift(dv, -1, 0) + s_h_left * _shift(dv, 0, -1)
                      + s_v * _shift(dv, 1, 0) + s_h * _shift(dv, 0, 1))
            B1 = b1 - sig_u
            B2 = b2 - sig_v
            du_new = (1.0 - omega) * du + omega / A11 * (B1 - a12 * dv)
            dv_new = (1.0 - omega) * dv + omega / A22 * (B2 - a12 * du_new)
            sel = parity == want
            return jnp.where(sel, du_new, du), jnp.where(sel, dv_new, dv)

        for _ in range(solve_iter):
            du, dv = half_sweep(du, dv, 1)
            du, dv = half_sweep(du, dv, 0)

        uu = wx + du
        vv = wy + dv

    uu_ref[:] = uu
    vv_ref[:] = vv


def variational_refine_fused(flow: jax.Array, im1: jax.Array, im2: jax.Array,
                             cfg: DISConfig, level: int,
                             interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ops/variational.variational_refine with the
    inner fixed-point loop fused into one Pallas kernel."""
    inner_iter = level + 1
    wx = flow[..., 0].astype(jnp.float32)
    wy = flow[..., 1].astype(jnp.float32)
    w_im2, mask = warp_image(im2, wx, wy)
    d = get_derivatives(im1, w_im2)
    # [8, 3, h, w]
    dIs = jnp.stack([jnp.moveaxis(x, -1, 0) for x in
                     (d.Ix, d.Iy, d.Iz, d.Ixx, d.Ixy, d.Iyy, d.Ixz, d.Iyz)])

    kern = functools.partial(
        _kernel, inner_iter=inner_iter, solve_iter=cfg.var_ref_iter,
        omega=cfg.var_ref_sor_weight, qa=0.25 * cfg.var_ref_alpha,
        hd3=cfg.var_ref_delta * 0.5 / 3.0, hg3=cfg.var_ref_gamma * 0.5 / 3.0)

    uu, vv = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct(wx.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wy.shape, jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(wx, wy, mask, dIs)
    return jnp.stack([uu, vv], axis=-1)
