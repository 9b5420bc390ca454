"""Pallas 2x2 average-pool — the pyramid downsample hot op.

The reference builds its pyramid with NPP's bilinear x0.5 resize
(/root/reference/src/kernels/pyramid.cpp:151-155), which for even dims is
exactly a 2x2 box average.  XLA's ``reduce_window`` on a [H, W, 3] image
picks a pathological layout in the composed pipeline (measured 2.6 ms for
one 4K level — ~17x off the bandwidth bound), so pyramid levels use this
kernel instead.

Design (all structured around what's fast on the VPU/MXU):
  * The kernel reads raw [2*BR, BW] blocks of the flat [H, W*C] image —
    no host-side reshape (the previous merged-row-pair view forced XLA to
    materialize a full-image relayout, ~0.15 ms at 4K).  Row-pair pooling
    is a LEFT one-hot matmul: L[k, 2k] = L[k, 2k+1] = 1, a = L @ block —
    the MXU de-interleaves the rows (stride-2 sublane slicing does not
    compile; in-VMEM reshapes lower to slow sublane shuffles).
  * Column pooling is a one-hot-ish matmul: sel[m, n] has ones at the
    two source lanes {2C*k + ch, 2C*k + C + ch} of output lane n = C*k+ch,
    so the MXU performs both the pairing and the lane compaction.  sel is
    a BAND matrix (input lane ~ 2x output lane), so it is split into one
    narrow 128-aligned band per 128-lane output chunk — 1.8x fewer MACs
    than the full [BW, BW/2] contraction (measured ~10% on a 4K level;
    the kernel is mostly DMA-bound).
  * Manual bf16x3 split: a = a1 + a2 + a3 with each part exactly
    bf16-representable covers all 24 fp32 mantissa bits, so three native
    bf16 matmuls against the exactly-representable 0/1 matrix recover
    near-fp32 accuracy (the parts accumulate in a different order than an
    fp32 pairwise sum, so exact bit equality is not guaranteed — the
    equivalence test bounds the error at ~1-2 ulp of the 0..255 image
    scale) at half the cost of Precision.HIGHEST (Mosaic supports only
    DEFAULT/HIGHEST; DEFAULT alone would round the image to bf16 —
    ~0.5 absolute error on a 0..255 image).  Both the row and column
    pools use the split, so each block costs 6 tiny bf16 matmuls — noise
    next to the HBM traffic.

BW = 768 is a multiple of 2C for C in {1, 3} and of 256 (so both the
input block and the BW/2-wide output block are lane-tile aligned);
widths that don't divide are lane-padded and the result sliced.  Blocks
that overrun the image bottom read unspecified rows; the affected output
rows are cropped by the caller-visible out_shape, never observed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BW = 768
_BR = 64


@functools.lru_cache(maxsize=8)
def _sel_matrix(bw: int, channels: int) -> np.ndarray:
    """[bw, bw//2] with ones at the two source lanes of each output lane:
    out lane C*k+ch <- in lanes 2C*k+ch and 2C*k+C+ch."""
    sel = np.zeros((bw, bw // 2), np.float32)
    n = np.arange(bw // 2)
    m0 = (n // channels) * 2 * channels + (n % channels)
    sel[m0, n] = 1.0
    sel[m0 + channels, n] = 1.0
    return sel


@functools.lru_cache(maxsize=8)
def _sel_bands(bw: int, channels: int):
    """Split sel into one narrow 128-aligned band per 128-lane output
    chunk: out chunk [128m, 128m+128) reads only input lanes around
    [2*128m, 2*128m+256+2C) — a (lo, hi, band) triple per chunk with the
    guarantee sel[i, n] == 0 for i outside [lo, hi)."""
    sel = _sel_matrix(bw, channels)
    bands = []
    for m in range(bw // 2 // 128):
        cols = sel[:, m * 128:(m + 1) * 128]
        nz = np.nonzero(cols.any(axis=1))[0]
        lo = (int(nz.min()) // 128) * 128
        hi = min(-(-(int(nz.max()) + 1) // 128) * 128, bw)
        assert cols[:lo].sum() == 0 and cols[hi:].sum() == 0
        bands.append((lo, hi, cols[lo:hi]))
    return tuple(bands)


@functools.lru_cache(maxsize=2)
def _row_matrix(br: int) -> np.ndarray:
    """[br, 2*br] two-ones-per-row matrix: out row k <- in rows 2k, 2k+1."""
    L = np.zeros((br, 2 * br), np.float32)
    k = np.arange(br)
    L[k, 2 * k] = 1.0
    L[k, 2 * k + 1] = 1.0
    return L


def _split3(a):
    """Exact fp32 -> bf16 three-way split (a == a1 + a2 + a3)."""
    a1 = a.astype(jnp.bfloat16)
    r = a - a1.astype(jnp.float32)
    a2 = r.astype(jnp.bfloat16)
    a3 = (r - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    return a1, a2, a3


def _mm3(a, onehot):
    """a @ onehot with the bf16x3 operand split, f32 accumulation."""
    a1, a2, a3 = _split3(a)
    acc = jnp.dot(a1, onehot, preferred_element_type=jnp.float32)
    acc += jnp.dot(a2, onehot, preferred_element_type=jnp.float32)
    acc += jnp.dot(a3, onehot, preferred_element_type=jnp.float32)
    return acc


def _pool_kernel(x_ref, L_ref, *refs, n_rows: int, bands):
    band_refs = refs[:-1]
    o_ref = refs[-1]
    x = x_ref[:]                    # [2*BR, BW] raw interleaved rows
    if n_rows % (2 * _BR):
        # Blocks overrunning the image bottom read unspecified rows; a NaN
        # there would poison the left matmul through 0 * NaN, so zero them.
        jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(jj + pl.program_id(0) * (2 * _BR) < n_rows, x, 0.0)
    L = L_ref[:]
    x1, x2, x3 = _split3(x)
    a = jnp.dot(L, x1, preferred_element_type=jnp.float32)
    a += jnp.dot(L, x2, preferred_element_type=jnp.float32)
    a += jnp.dot(L, x3, preferred_element_type=jnp.float32)
    outs = [_mm3(a[:, lo:hi], bref[:])
            for (lo, hi, _), bref in zip(bands, band_refs)]
    o_ref[:] = jnp.concatenate(outs, axis=1) * 0.25


def pool2x2(img: jax.Array, interpret: bool = False) -> jax.Array:
    """2x2 average pool [H, W, C] -> [H//2, W//2, C] (H, W even)."""
    H, W, C = img.shape
    out = pool2x2_flat(img.reshape(H, W * C), C, interpret=interpret)
    return out.reshape(H // 2, W // 2, C)


def pool2x2_flat(x: jax.Array, C: int, interpret: bool = False) -> jax.Array:
    """2x2 average pool on the flat view: [H, W*C] -> [H//2, W*C//2].

    Callers that can should stay in this 2D form across the whole
    downsample chain — a rank-3 [H, W, 3] value crossing the pallas_call
    boundary tempts XLA's layout assignment into a lane-padded layout for
    the producer (measured 12.7 ms for one 4K elementwise add) plus a
    multi-GB relayout.  All-2D chains keep the packed layout throughout.
    """
    H, wc = x.shape
    assert H % 2 == 0 and wc % (2 * C) == 0
    pad = (-wc) % _BW
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    wcp = wc + pad
    nj = wcp // _BW
    grid = (pl.cdiv(H // 2, _BR), nj)
    bands = _sel_bands(_BW, C)
    out = pl.pallas_call(
        functools.partial(_pool_kernel, n_rows=H, bands=bands),
        out_shape=jax.ShapeDtypeStruct((H // 2, wcp // 2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2 * _BR, _BW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, 2 * _BR), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec((hi - lo, 128), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
             for (lo, hi, _) in bands],
        out_specs=pl.BlockSpec((_BR, _BW // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(_row_matrix(_BR), jnp.bfloat16),
      *[jnp.asarray(b, jnp.bfloat16) for (_, _, b) in bands])
    return out[:, :wc // 2]
