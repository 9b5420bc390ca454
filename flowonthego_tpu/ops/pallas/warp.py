"""Banded backward warp — the var-ref warp without gathers.

The flow entering variational refinement is the densified DIS field: a
convex combination of per-patch flows that all survived the outlier
reset, so |flow| <= cfg.outlier_thresh HOLDS BY CONSTRUCTION (the fb
merge only adds negated, equally-bounded backward flows).  That bound
turns the bilinear backward warp (kernelWarpImage,
/root/reference/src/kernels/flowUtil.cu:448-493) from a pixel gather —
which XLA lowers to ~0.65 ms-per-corner serial fusions at the op-3/op-4
fine scales — into a STATIC (2B+2)^2-term masked stencil, B =
ceil(bound)+1.  At the XLA level those 256 terms cost 256 HBM passes
(measured 4.3 ms at 512x224); in this kernel the source slab sits in
VMEM and the whole sum is VPU arithmetic (~0.05 ms).

Exactness: each (s, t) term carries weight
    a_s * b_t,  a_s = (1-dy)[y1-j==s] + dy[y2-j==s],
                b_t = (1-dx)[x1-i==t] + dx[x2-i==t]
with exactly one s (pair) and one t (pair) nonzero per pixel — the same
four taps as the reference, associated as rows-then-cols (<=1 ulp from
the reference's 4-term sum).  Border clamping reproduces the reference's
double-tap coincidence (x1 == x2 -> weight (1-dx)+dx = 1).

Layout: all per-pixel quantities live in LANE space [S, w*C] (flow
fields arrive pre-expanded xC), so channel masks need no in-kernel
repeat; row shifts are static sublane slices of the halo'd slab, column
shifts static lane slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(src_ref, wxe_ref, wye_ref, out_ref, *, B: int, S: int, w: int,
            C: int, h: int):
    i = pl.program_id(0)
    wC = w * C
    wxe = wxe_ref[0]                      # [S, wC] flow x, expanded xC
    wye = wye_ref[0]
    l_iota = lax.broadcasted_iota(jnp.int32, (S, wC), 1)
    ii = (l_iota // C).astype(jnp.float32)          # column index per lane
    jj = (lax.broadcasted_iota(jnp.int32, (S, wC), 0)
          + i * S).astype(jnp.float32)              # global row index

    xx = ii + wxe
    yy = jj + wye
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = xx - x0
    dy = yy - y0
    x1 = jnp.clip(x0, 0.0, float(w - 1))
    x2 = jnp.clip(x0 + 1.0, 0.0, float(w - 1))
    y1 = jnp.clip(y0, 0.0, float(h - 1))
    y2 = jnp.clip(y0 + 1.0, 0.0, float(h - 1))

    # The s axis runs as an in-kernel fori_loop with a DYNAMIC sublane
    # load (fully unrolling all (2B+2)^2 terms keeps every temporary
    # live and blows Mosaic's scoped-VMEM stack — measured 63 MB at op-3
    # scale 2); the t axis stays unrolled (lane offsets must be static).
    slab = src_ref[0]                      # [BH, lanes]

    def s_body(s_idx, acc):
        fs = (s_idx - B).astype(jnp.float32)
        a_s = (1.0 - dy) * jnp.where(y1 - jj == fs, 1.0, 0.0) \
            + dy * jnp.where(y2 - jj == fs, 1.0, 0.0)
        # dynamic sublane start must be 8-aligned for a direct load;
        # a dynamic rotate has no such constraint
        row = pltpu.roll(slab, -(s_idx + 1), 0)[:S, :]
        inner = jnp.zeros((S, wC), jnp.float32)
        for t in range(-B, B + 2):
            ft = float(t)
            b_t = (1.0 - dx) * jnp.where(x1 - ii == ft, 1.0, 0.0) \
                + dx * jnp.where(x2 - ii == ft, 1.0, 0.0)
            seg = row[:, (B + 1 + t) * C:(B + 1 + t) * C + wC]
            inner = inner + seg * b_t
        return acc + inner * a_s

    acc = lax.fori_loop(0, 2 * B + 2, s_body,
                        jnp.zeros((S, wC), jnp.float32))
    out_ref[0] = acc


def warp_image_banded(src: jax.Array, wx: jax.Array, wy: jax.Array,
                      bound: float, tile_rows: int = 64,
                      interpret: bool = False):
    """Backward-warp ``src`` [H, W, C] by flow (wx, wy), |flow| <= bound.

    Returns (warped [H, W, C], mask [H, W]) with kernelWarpImage
    semantics.  The caller is responsible for the bound (see module
    docstring — it holds for every var-ref call site by construction).
    """
    h, w, C = src.shape
    B = int(-(-bound // 1)) + 1
    wC = w * C
    # Mosaic's scoped-VMEM stack holds ~20-26 live [S, wC] temporaries
    # of the unrolled t-loop; keep S*wC <= 96k elements (measured safe)
    S = min(tile_rows, h, max(8, (98304 // wC) // 8 * 8))
    n_i = -(-h // S)
    BH = S + 2 * (B + 1)

    srcp = jnp.pad(src, ((B + 1, B + 1 + n_i * S - h), (B + 1, B + 1),
                         (0, 0)), mode="edge").reshape(
        h + 2 * (B + 1) + n_i * S - h, (w + 2 * (B + 1)) * C)
    blocks = jnp.stack([srcp[i * S:i * S + BH] for i in range(n_i)])

    wxe = jnp.repeat(wx, C, axis=1)
    wye = jnp.repeat(wy, C, axis=1)
    if n_i * S > h:
        wxe = jnp.pad(wxe, ((0, n_i * S - h), (0, 0)))
        wye = jnp.pad(wye, ((0, n_i * S - h), (0, 0)))
    wxe = wxe.reshape(n_i, S, wC)
    wye = wye.reshape(n_i, S, wC)

    kern = functools.partial(_kernel, B=B, S=S, w=w, C=C, h=h)
    out = pl.pallas_call(
        kern,
        grid=(n_i,),
        out_shape=jax.ShapeDtypeStruct((n_i, S, wC), jnp.float32),
        in_specs=[pl.BlockSpec((1, BH, srcp.shape[1]), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, S, wC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, S, wC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, wC), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blocks, wxe, wye)
    warped = out.reshape(n_i * S, w, C)[:h]

    jjm = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    iim = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xxm = iim + wx
    yym = jjm + wy
    mask = ((xxm >= 0) & (xxm < w) & (yym >= 0) & (yym < h)).astype(
        src.dtype)
    return warped, mask
