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


def _make_coords(shape, row0, col0, h_glob, w_glob):
    """Global (row, col) coordinate planes for a block whose local (0, 0)
    sits at global (row0, col0) — row0/col0 may be traced (tiled path).
    For the single-block path row0 = col0 = 0 and these are plain iotas."""
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 2) + row0
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1) + col0
    return jj, ii


class _Geom:
    """Boundary-aware shift helpers on a block with global coordinates.

    The halo-tiled path runs the same stencils on overlapping blocks;
    every edge-replication / zero-fill decision must fire at the GLOBAL
    image boundary (which may sit anywhere inside the block, or outside
    it), never at block-local edges.  Block-local wraparound from the
    rolls only pollutes the recompute halo, which the caller crops.
    """

    def __init__(self, shape, row0, col0, h_glob, w_glob):
        self.jj, self.ii = _make_coords(shape, row0, col0, h_glob, w_glob)
        self.h_glob = h_glob
        self.w_glob = w_glob

    def shift_zero(self, x, dy, dx):
        """x[j+dy, i+dx], zero where the TAP falls outside the image."""
        h, w = x.shape[-2], x.shape[-1]
        out = x
        if dy:
            out = pltpu.roll(out, (-dy) % h, axis=out.ndim - 2)
            tap = self.jj + dy
            out = jnp.where((tap >= 0) & (tap < self.h_glob), out, 0.0)
        if dx:
            out = pltpu.roll(out, (-dx) % w, axis=out.ndim - 1)
            tap = self.ii + dx
            out = jnp.where((tap >= 0) & (tap < self.w_glob), out, 0.0)
        return out

    def shift_edge(self, x, dx_sign):
        """x[j, i+1] with the image's last column replicated (dx_sign=+1),
        or x[j, i-1] with the first column replicated (-1)."""
        w = x.shape[-1]
        out = pltpu.roll(x, (-dx_sign) % w, axis=x.ndim - 1)
        if dx_sign > 0:
            return jnp.where(self.ii < self.w_glob - 1, out, x)
        return jnp.where(self.ii >= 1, out, x)

    def shift_edge_rows(self, x, dy_sign):
        h = x.shape[-2]
        out = pltpu.roll(x, (-dy_sign) % h, axis=x.ndim - 2)
        if dy_sign > 0:
            return jnp.where(self.jj < self.h_glob - 1, out, x)
        return jnp.where(self.jj >= 1, out, x)

    def deriv3_x(self, x):
        return 0.5 * (self.shift_edge(x, +1) - self.shift_edge(x, -1))

    def deriv3_y(self, x):
        return 0.5 * (self.shift_edge_rows(x, +1) - self.shift_edge_rows(x, -1))


def _refine_block(geom: _Geom, wx, wy, mask, dIs, *, inner_iter: int,
                  solve_iter: int, omega: float, qa: float, hd3: float,
                  hg3: float):
    """The complete inner fixed-point loop on one (possibly halo-padded)
    block, boundary conditions applied at GLOBAL image coordinates."""
    # dIs: [8, 3, h, w] = Ix, Iy, Iz, Ixx, Ixy, Iyy, Ixz, Iyz
    Ix, Iy, Iz, Ixx, Ixy, Iyy, Ixz, Iyz = (dIs[i] for i in range(8))
    _shift = geom.shift_zero
    _shift_edge = geom.shift_edge
    _shift_edge_rows = geom.shift_edge_rows

    parity = (geom.jj + geom.ii) % 2
    last_col = geom.ii == geom.w_glob - 1
    last_row = geom.jj == geom.h_glob - 1

    # precomputed data-term normalizers (constant across iterations)
    n_col = Ix * Ix + Iy * Iy + DATANORM                 # [3, h, w]
    n1 = Ixx * Ixx + Ixy * Ixy + DATANORM
    n2 = Iyy * Iyy + Ixy * Ixy + DATANORM

    du = jnp.zeros(wx.shape, jnp.float32)
    dv = jnp.zeros(wy.shape, jnp.float32)
    uu = wx
    vv = wy

    for _ in range(inner_iter):
        # ---- smoothness (flowUtil.cu:390-423) ----
        ux = geom.deriv3_x(uu)
        uy = geom.deriv3_y(uu)
        vx = geom.deriv3_x(vv)
        vy = geom.deriv3_y(vv)
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

    return uu, vv


def _kernel(wx_ref, wy_ref, mask_ref, dIs_ref, uu_ref, vv_ref, *,
            inner_iter: int, solve_iter: int, omega: float, qa: float,
            hd3: float, hg3: float):
    h, w = wx_ref.shape
    geom = _Geom((h, w), 0, 0, h, w)
    uu, vv = _refine_block(geom, wx_ref[:], wy_ref[:], mask_ref[:],
                           dIs_ref[:], inner_iter=inner_iter,
                           solve_iter=solve_iter, omega=omega, qa=qa,
                           hd3=hd3, hg3=hg3)
    uu_ref[:] = uu
    vv_ref[:] = vv


def _warp_and_derivs(flow, im1, im2, cfg):
    wx = flow[..., 0].astype(jnp.float32)
    wy = flow[..., 1].astype(jnp.float32)
    # densified flow is a convex combination of reset-bounded patch
    # flows -> |flow| <= outlier_thresh, which unlocks the banded warp
    w_im2, mask = warp_image(im2, wx, wy, flow_bound=cfg.outlier_thresh)
    d = get_derivatives(im1, w_im2)
    # [8, C, h, w]
    dIs = jnp.stack([jnp.moveaxis(x, -1, 0) for x in
                     (d.Ix, d.Iy, d.Iz, d.Ixx, d.Ixy, d.Iyy, d.Ixz, d.Iyz)])
    return wx, wy, mask, dIs


def variational_refine_fused(flow: jax.Array, im1: jax.Array, im2: jax.Array,
                             cfg: DISConfig, level: int,
                             interpret: bool = False) -> jax.Array:
    """Drop-in replacement for ops/variational.variational_refine with the
    inner fixed-point loop fused into one Pallas kernel."""
    inner_iter = level + 1
    wx, wy, mask, dIs = _warp_and_derivs(flow, im1, im2, cfg)

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


def _tiled_kernel(blk_ref, uu_ref, vv_ref, *, C: int, S: int, T: int, R: int,
                  n_j: int, h: int, w: int, inner_iter: int, solve_iter: int,
                  omega: float, qa: float, hd3: float, hg3: float):
    b = pl.program_id(0)
    row0 = (b // n_j) * S - R        # global coords of local (0, 0)
    col0 = (b % n_j) * T - R
    x = blk_ref[0]                   # [3 + 8C, BH, BW]
    BH, BW = x.shape[1], x.shape[2]
    geom = _Geom((BH, BW), row0, col0, h, w)
    uu, vv = _refine_block(geom, x[0], x[1], x[2],
                           x[3:].reshape(8, C, BH, BW),
                           inner_iter=inner_iter, solve_iter=solve_iter,
                           omega=omega, qa=qa, hd3=hd3, hg3=hg3)
    uu_ref[0] = uu[R:R + S, R:R + T]
    vv_ref[0] = vv[R:R + S, R:R + T]


def variational_refine_tiled(flow: jax.Array, im1: jax.Array, im2: jax.Array,
                             cfg: DISConfig, level: int,
                             interpret: bool = False,
                             tile_rows: int = 56, tile_cols: int = 384
                             ) -> jax.Array:
    """The fused refine for fields too large for one VMEM-resident block
    (lifting the single-block kernel's ~88k-pixel ceiling, e.g. custom
    finest_scale=0 configs at 1024x436 = 446k px).

    Overlap-and-recompute tiling: each [tile_rows, tile_cols] output tile
    is computed on a halo-padded block, where the halo radius R equals the
    fixed-point loop's total dependency radius —
    inner_iter * (3 + 2*solve_iter) rows/cols (one for the flow-derivative
    stencil, one for the smoothness pair sum, one for the sub-Laplacian,
    plus one per red-black half-sweep).  Every boundary condition fires at
    GLOBAL image coordinates (see _Geom), so the tiled result equals the
    single-block kernel except for halo wraparound garbage, which lies
    strictly outside the cropped core by construction.

    Matches src/kernels/flowUtil.cu:651-706 semantics like the fused
    kernel; equivalence is asserted in tests/test_pallas_kernels.py.
    """
    inner_iter = level + 1
    h, w = flow.shape[0], flow.shape[1]
    C = im1.shape[2]
    R = inner_iter * (3 + 2 * cfg.var_ref_iter)
    wx, wy, mask, dIs = _warp_and_derivs(flow, im1, im2, cfg)

    NP = 3 + 8 * C
    planes = jnp.concatenate([wx[None], wy[None], mask[None],
                              dIs.reshape(8 * C, h, w)], axis=0)

    S, T = min(tile_rows, h), min(tile_cols, w)
    n_i = -(-h // S)
    n_j = -(-w // T)
    BH, BW = S + 2 * R, T + 2 * R
    padded = jnp.pad(planes, ((0, 0), (R, R + n_i * S - h),
                              (R, R + n_j * T - w)))
    blocks = jnp.stack([
        jax.lax.slice(padded, (0, i * S, j * T), (NP, i * S + BH, j * T + BW))
        for i in range(n_i) for j in range(n_j)])   # [n_i*n_j, NP, BH, BW]

    kern = functools.partial(
        _tiled_kernel, C=C, S=S, T=T, R=R, n_j=n_j, h=h, w=w,
        inner_iter=inner_iter, solve_iter=cfg.var_ref_iter,
        omega=cfg.var_ref_sor_weight, qa=0.25 * cfg.var_ref_alpha,
        hd3=cfg.var_ref_delta * 0.5 / 3.0, hg3=cfg.var_ref_gamma * 0.5 / 3.0)

    uu, vv = pl.pallas_call(
        kern,
        grid=(n_i * n_j,),
        out_shape=(jax.ShapeDtypeStruct((n_i * n_j, S, T), jnp.float32),
                   jax.ShapeDtypeStruct((n_i * n_j, S, T), jnp.float32)),
        in_specs=[pl.BlockSpec((1, NP, BH, BW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, S, T), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, S, T), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(blocks)

    def assemble(t):
        full = t.reshape(n_i, n_j, S, T).transpose(0, 2, 1, 3)
        return full.reshape(n_i * S, n_j * T)[:h, :w]

    return jnp.stack([assemble(uu), assemble(vv)], axis=-1)
