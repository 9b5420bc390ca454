"""2D-tiled (rows x cols) variational refinement with per-sweep halos.

Extends parallel/varref_sharded.py (row strips) to a full H x W tile
mesh — the "spatial/model axis over image tiles" row of SURVEY.md §2.4
that a >8-device single-frame latency story needs: at 16-64 chips, row
strips of a 4K frame become too shallow for their own halos, while
(rows x cols) tiles keep the halo perimeter small relative to the tile.

Every stage runs on [hl, wl] tiles inside ``shard_map`` over a
(row_axis, col_axis) mesh:

  * 2D halos cost two ``lax.ppermute`` hops (rows, then cols of the
    row-extended tile — corners ride the lateral neighbor's row halo,
    see halo.exchange_cols);
  * warp: backward-bilinear against an im2 tile halo'd by the flow
    displacement bound on BOTH axes; sample coords are clamped exactly
    like the global kernel (flowUtil.cu:448-493) — global clamp, then
    tile lookup;
  * derivatives: 5-tap stencils on tiles halo'd by 2 rows/cols;
  * smoothness: diffusivity computed on a +-1 band so the neighbor-pair
    sums (s_h, s_v and their up/left shifts) are local reads;
  * SOR: both boundary rows AND columns of du/dv exchanged before every
    half-sweep — 2 x solve_iter x inner_iter 2D halos per scale.

Bit-compatible with ops/variational.variational_refine (the math is the
same per-pixel expression tree; only gather association in the warp can
differ by ulps).  Equivalence is asserted on the fake 8-device CPU mesh
in tests/test_varref_2d.py for 2x4, 4x2, and 8x1 meshes; 8x1 must match
the row-strip path varref_sharded.py by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DISConfig
from ..ops.variational import EPS_SMOOTH, Derivatives, data_term
from .halo import exchange_cols, exchange_rows

ROW_AXIS = "rows"
COL_AXIS = "cols"


def _ex2(x, hr: int, hc: int, row_axis: str, col_axis: str, mode: str):
    """[h, w, ...] tile -> [h+2*hr, w+2*hc, ...] with 2D halo."""
    if hr:
        x = exchange_rows(x, hr, row_axis, mode=mode)
    if hc:
        x = exchange_cols(x, hc, col_axis, mode=mode)
    return x


def _deriv5_rows(xh):
    """4th-order row derivative consuming a 2-row halo: [n+4,...] -> [n,...]."""
    return (8.0 * (xh[3:-1] - xh[1:-3]) - (xh[4:] - xh[:-4])) / 12.0


def _deriv5_cols(xh):
    return (8.0 * (xh[:, 3:-1] - xh[:, 1:-3]) - (xh[:, 4:] - xh[:, :-4])) / 12.0


def warp_tile(im2_halo, wx, wy, halo: int, idx_r, idx_c, hl: int, wl: int,
              H: int, W: int):
    """Backward warp of a [hl, wl, C] tile from an im2 tile with ``halo``
    extra rows and columns each side.  Coord clamp follows the global
    kernel: clamp to [0, H-1] x [0, W-1] globally, then to the physically
    available halo extent (a sample past the halo degrades to the halo
    edge rather than erroring — callers size ``halo`` to the displacement
    bound)."""
    jj = lax.broadcasted_iota(jnp.float32, (hl, wl), 0) + idx_r * hl
    ii = lax.broadcasted_iota(jnp.float32, (hl, wl), 1) + idx_c * wl
    xx = ii + wx
    yy = jj + wy
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = xx - x0
    dy = yy - y0
    mask = ((xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)).astype(wx.dtype)

    rbase = idx_r * hl - halo
    cbase = idx_c * wl - halo
    hh, hw = im2_halo.shape[:2]

    def loc_r(y):
        return jnp.clip(jnp.clip(y, 0, H - 1).astype(jnp.int32) - rbase,
                        0, hh - 1)

    def loc_c(x):
        return jnp.clip(jnp.clip(x, 0, W - 1).astype(jnp.int32) - cbase,
                        0, hw - 1)

    y1, y2 = loc_r(y0), loc_r(y0 + 1)
    x1, x2 = loc_c(x0), loc_c(x0 + 1)
    dxe = dx[..., None]
    dye = dy[..., None]
    warped = (im2_halo[y1, x1] * (1 - dxe) * (1 - dye)
              + im2_halo[y1, x2] * dxe * (1 - dye)
              + im2_halo[y2, x1] * (1 - dxe) * dye
              + im2_halo[y2, x2] * dxe * dye)
    return warped, mask


def variational_refine_tile(flow, im1, im2, cfg: DISConfig, level: int,
                            row_axis: str, col_axis: str, idx_r, idx_c,
                            hl: int, wl: int, H: int, W: int,
                            warp_halo: int):
    """Refine a [hl, wl, 2] flow tile against [hl, wl, C] image tiles."""
    inner_iter = level + 1
    qa = 0.25 * cfg.var_ref_alpha
    hd3 = cfg.var_ref_delta * 0.5 / 3.0
    hg3 = cfg.var_ref_gamma * 0.5 / 3.0
    omega = cfg.var_ref_sor_weight

    wx = flow[..., 0]
    wy = flow[..., 1]

    def ex(x, hr, hc, mode="edge"):
        return _ex2(x, hr, hc, row_axis, col_axis, mode)

    # ---- warp + derivatives (once per refine) ----
    im2h = ex(im2, warp_halo, warp_halo)
    w_im2, mask = warp_tile(im2h, wx, wy, warp_halo, idx_r, idx_c,
                            hl, wl, H, W)

    def d5r(x):
        return _deriv5_rows(ex(x, 2, 0))

    def d5c(x):
        return _deriv5_cols(ex(x, 0, 2))

    mean = 0.5 * (im1 + w_im2)
    Iz = w_im2 - im1
    Ix = d5c(mean)
    Iy = d5r(mean)
    d = Derivatives(Ix=Ix, Iy=Iy, Iz=Iz,
                    Ixx=d5c(Ix), Ixy=d5r(Ix), Iyy=d5r(Iy),
                    Ixz=d5c(Iz), Iyz=d5r(Iz))

    # global-border masks (the zero rows/cols of the pair sums live at the
    # image border, not the tile border)
    gj = lax.broadcasted_iota(jnp.int32, (hl, wl), 0) + idx_r * hl
    gi = lax.broadcasted_iota(jnp.int32, (hl, wl), 1) + idx_c * wl
    first_row, last_row = gj == 0, gj == H - 1
    first_col, last_col = gi == 0, gi == W - 1
    parity = (gi + gj) % 2

    def smoothness(uu, vv):
        """Pair sums s_h, s_v and their up/left shifts, from a +-1
        diffusivity band (s itself needs +-1 of uu/vv derivs -> 2-halo)."""
        uuh = ex(uu, 2, 2)
        vvh = ex(vv, 2, 2)

        def band_derivs(xh):                       # band = [-1, n+1) both axes
            dcol = 0.5 * (xh[1:-1, 2:] - xh[1:-1, :-2])
            drow = 0.5 * (xh[2:, 1:-1] - xh[:-2, 1:-1])
            return dcol, drow

        ux, uy = band_derivs(uuh)
        vx, vy = band_derivs(vvh)
        s_band = qa / jnp.sqrt(ux * ux + uy * uy + vx * vx + vy * vy
                               + EPS_SMOOTH)
        s = s_band[1:-1, 1:-1]
        s_h = jnp.where(last_col, 0.0, s + s_band[1:-1, 2:])
        s_v = jnp.where(last_row, 0.0, s + s_band[2:, 1:-1])
        s_h_left = jnp.where(first_col, 0.0, s_band[1:-1, :-2] + s)
        s_v_up = jnp.where(first_row, 0.0, s_band[:-2, 1:-1] + s)
        return s_h, s_v, s_h_left, s_v_up

    def sub_laplacian(dst, srch, s_h, s_v, s_h_left, s_v_up):
        """dst += weighted 5-point Laplacian; ``srch``: src with a 1-px 2D
        edge halo.  coeff[i-1]/coeff[j-1] are rebuilt from the left/up
        shifts of the pair sums (zero at the global border), matching
        ops/variational.sub_laplacian's shifted-concat form."""
        src = srch[1:-1, 1:-1]
        ch = s_h * (srch[1:-1, 2:] - src)
        ch_l = s_h_left * (src - srch[1:-1, :-2])
        cv = s_v * (srch[2:, 1:-1] - src)
        cv_u = s_v_up * (src - srch[:-2, 1:-1])
        return dst + ch - ch_l + cv - cv_u

    du = jnp.zeros_like(wx)
    dv = jnp.zeros_like(wy)
    uu = wx
    vv = wy
    wxh = ex(wx, 1, 1)
    wyh = ex(wy, 1, 1)

    for _ in range(inner_iter):
        s_h, s_v, s_h_left, s_v_up = smoothness(uu, vv)
        a11, a12, a22, b1, b2 = data_term(mask, du, dv, d, hd3, hg3)
        b1 = sub_laplacian(b1, wxh, s_h, s_v, s_h_left, s_v_up)
        b2 = sub_laplacian(b2, wyh, s_h, s_v, s_h_left, s_v_up)

        sum_dpsis = s_v_up + s_h_left + s_v + s_h
        A11 = a11 + sum_dpsis
        A22 = a22 + sum_dpsis

        def half_sweep(du, dv, want):
            duh = ex(du, 1, 1, mode="zero")
            dvh = ex(dv, 1, 1, mode="zero")

            def sig(xh):
                return -(s_v_up * xh[:-2, 1:-1] + s_h_left * xh[1:-1, :-2]
                         + s_v * xh[2:, 1:-1] + s_h * xh[1:-1, 2:])

            B1 = b1 - sig(duh)
            B2 = b2 - sig(dvh)
            du_new = (1.0 - omega) * du + omega / A11 * (B1 - a12 * dv)
            dv_new = (1.0 - omega) * dv + omega / A22 * (B2 - a12 * du_new)
            sel = parity == want
            return jnp.where(sel, du_new, du), jnp.where(sel, dv_new, dv)

        for _ in range(cfg.var_ref_iter):
            du, dv = half_sweep(du, dv, 1)         # odd first (flowUtil.cu:688)
            du, dv = half_sweep(du, dv, 0)

        uu = wx + du
        vv = wy + dv

    return jnp.stack([uu, vv], axis=-1)


def make_tile_mesh(n_rows: int, n_cols: int, devices=None) -> Mesh:
    """A (rows, cols) tile mesh over the available devices."""
    import numpy as np
    devices = list(devices if devices is not None else jax.devices())
    if n_rows * n_cols != len(devices):
        raise ValueError(
            f"{n_rows}x{n_cols} tile mesh != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(n_rows, n_cols),
                (ROW_AXIS, COL_AXIS))


def make_tiled_varref(mesh: Mesh, cfg: DISConfig, level: int,
                      H: int, W: int, warp_halo: int):
    """Jittable [H, W, 2] x [H, W, C] x [H, W, C] -> [H, W, 2] refinement
    sharded over ``mesh``'s (rows, cols) tile axes.

    ``warp_halo`` must cover the max |flow| component (the DIS
    displacement bound at this scale — see
    spatial_fine.displacement_bound — plus 1 interpolation pixel).
    """
    n_r = mesh.shape[ROW_AXIS]
    n_c = mesh.shape[COL_AXIS]
    if H % n_r or W % n_c:
        raise ValueError(f"{H}x{W} field not divisible by the "
                         f"{n_r}x{n_c} tile mesh")
    hl, wl = H // n_r, W // n_c
    # The halo exchanges are single-hop ppermutes: a halo wider than one
    # tile would need multi-hop forwarding and instead fails deep inside
    # shard_map tracing with an opaque broadcast-shape error; the stencil
    # halos additionally need 2 rows/cols of slack.  Fail fast with the
    # actual trade-off spelled out.
    if min(hl, wl) < 2:
        raise ValueError(
            f"tile {hl}x{wl} too small for the 2-px stencil halos; use a "
            f"coarser mesh than {n_r}x{n_c} for a {H}x{W} field")
    if warp_halo > min(hl, wl):
        raise ValueError(
            f"warp_halo={warp_halo} exceeds the {hl}x{wl} tile — the "
            f"single-hop halo exchange cannot reach past one neighbor. "
            f"Lower the displacement bound or use fewer tiles "
            f"(mesh {n_r}x{n_c}, field {H}x{W})")

    @partial(shard_map, mesh=mesh,
             in_specs=(P(ROW_AXIS, COL_AXIS, None),) * 3,
             out_specs=P(ROW_AXIS, COL_AXIS, None))
    def run(flow, im1, im2):
        idx_r = lax.axis_index(ROW_AXIS)
        idx_c = lax.axis_index(COL_AXIS)
        return variational_refine_tile(flow, im1, im2, cfg, level,
                                       ROW_AXIS, COL_AXIS, idx_r, idx_c,
                                       hl, wl, H, W, warp_halo)

    return run
