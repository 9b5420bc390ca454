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
  * The 0/1 matrices are generated IN-KERNEL from iota arithmetic —
    passing them as operands costs one HBM->VMEM DMA per buffer per
    launch (~8 DMA streams/frame in the streamed-video trace); the iota
    compares are a few VPU ops on tiny tiles.
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
  * Ragged widths are masked in-kernel (edge blocks zero their
    out-of-image lanes; Pallas clips the partial output block), so
    non-multiple-of-BW levels pay no host-visible pad/slice copy — the
    streamed-4K trace showed a 0.034 ms full-level pad between pyramid
    levels 1 and 2 (1080p flat width 5760 does not divide 768).
  * An optional scalar ``bias`` is added to the input inside the kernel
    (pool(x + b) == pool(x) + b for a 2x2 average; the add is applied to
    x pre-split, so results are bit-identical to adding outside).  The
    streamed-video loop uses it to fuse frame ingest into the first
    pyramid level — the standalone full-frame add costs a 100 MB
    read+write at 4K (~0.14 ms) that the fused form absorbs into the
    pool's own read.

BW = 768 is a multiple of 2C for C in {1, 3} and of 256 (so both the
input block and the BW/2-wide output block are lane-tile aligned).
Blocks that overrun the image bottom read unspecified rows; the affected
output rows are cropped by the caller-visible out_shape, never observed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block sweep (4K L0, round 5): (64,768) 0.20 ms, (64,1536) 0.13,
# (64,2304) 0.09 — the kernel is VPU/issue-bound (bf16x3 splits + iota
# matrix generation scale with data, but per-block fixed cost does not),
# so wider blocks win; (256,*) blows Mosaic's scoped-VMEM stack.
_BW = 2304
_BR = 64


def _band_ranges(bw: int, channels: int):
    """Static (lo, hi) input-lane range per 128-lane output chunk.

    Output lane n = C*k + ch reads input lanes m0 = 2C*k + ch and m0 + C;
    for the chunk n in [128m, 128m+128) that is m in
    [2*128m - slack, 2*(128m+128) + C), rounded to 128-lane tiles.
    """
    ranges = []
    for m in range(bw // 2 // 128):
        n_lo, n_hi = m * 128, m * 128 + 127
        m_lo = (n_lo // channels) * 2 * channels + (n_lo % channels)
        m_hi = (n_hi // channels) * 2 * channels + (n_hi % channels) + channels
        lo = (m_lo // 128) * 128
        hi = min(-(-(m_hi + 1) // 128) * 128, bw)
        ranges.append((lo, hi))
    return tuple(ranges)


def _row_matrix_iota(br: int) -> jax.Array:
    """[br, 2*br] bf16 one-hot: out row k <- in rows 2k, 2k+1 (in-kernel)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (br, 2 * br), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (br, 2 * br), 1)
    return ((c == 2 * r) | (c == 2 * r + 1)).astype(jnp.bfloat16)


def _band_matrix_iota(lo: int, hi: int, n0: int, channels: int) -> jax.Array:
    """[hi-lo, 128] bf16 band of the column-pair matrix (in-kernel).

    Column j selects input lanes m0 = 2C*(n//C) + n%C and m0 + C for
    global output lane n = n0 + j; rows are global input lanes lo..hi.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (hi - lo, 128), 0) + lo
    n = jax.lax.broadcasted_iota(jnp.int32, (hi - lo, 128), 1) + n0
    m0 = (n // channels) * (2 * channels) + n % channels
    return ((i == m0) | (i == m0 + channels)).astype(jnp.bfloat16)


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


def _pool_kernel(*refs, n_rows: int, n_cols: int, channels: int, ranges,
                 has_bias: bool):
    if has_bias:
        b_ref, x_ref, o_ref = refs
    else:
        x_ref, o_ref = refs
        b_ref = None
    x = x_ref[:]                    # [2*BR, BW] raw interleaved rows
    if x.dtype != jnp.float32:
        # uint8 ingest (run_dense.cpp:137-145 converts at load; real video
        # arrives as uint8): the upcast rides the pool's own read, so the
        # dominant full-res frame read costs 1/4 the HBM bytes.  Mosaic
        # has no direct uint8->f32 cast; widen through int32 (exact for
        # 0..255).
        x = x.astype(jnp.int32).astype(jnp.float32)
    if n_rows % (2 * _BR):
        # Blocks overrunning the image bottom read unspecified rows; a NaN
        # there would poison the left matmul through 0 * NaN, so zero them.
        jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        x = jnp.where(jj + pl.program_id(0) * (2 * _BR) < n_rows, x, 0.0)
    if n_cols % _BW:
        # Likewise for the ragged right edge (last column block).
        cc = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(cc + pl.program_id(1) * _BW < n_cols, x, 0.0)
    if b_ref is not None:
        x = x + b_ref[0, 0]
    L = _row_matrix_iota(_BR)
    x1, x2, x3 = _split3(x)
    a = jnp.dot(L, x1, preferred_element_type=jnp.float32)
    a += jnp.dot(L, x2, preferred_element_type=jnp.float32)
    a += jnp.dot(L, x3, preferred_element_type=jnp.float32)
    outs = [_mm3(a[:, lo:hi], _band_matrix_iota(lo, hi, m * 128, channels))
            for m, (lo, hi) in enumerate(ranges)]
    o_ref[:] = jnp.concatenate(outs, axis=1) * 0.25


def pool2x2(img: jax.Array, interpret: bool = False) -> jax.Array:
    """2x2 average pool [H, W, C] -> [H//2, W//2, C] (H, W even)."""
    H, W, C = img.shape
    out = pool2x2_flat(img.reshape(H, W * C), C, interpret=interpret)
    return out.reshape(H // 2, W // 2, C)


def pool2x2_flat(x: jax.Array, C: int, bias=None,
                 interpret: bool = False) -> jax.Array:
    """2x2 average pool on the flat view: [H, W*C] -> [H//2, W*C//2].

    Callers that can should stay in this 2D form across the whole
    downsample chain — a rank-3 [H, W, 3] value crossing the pallas_call
    boundary tempts XLA's layout assignment into a lane-padded layout for
    the producer (measured 12.7 ms for one 4K elementwise add) plus a
    multi-GB relayout.  All-2D chains keep the packed layout throughout.

    ``bias``: optional traced scalar added to the input inside the kernel
    (bit-identical to pooling ``x + bias``) — lets a streaming caller
    fuse frame ingest into the first level's read.

    ``x`` may be uint8 (deployment video frames): the kernel upcasts
    in-VMEM, so the full-res read moves 1/4 the bytes; the result is
    bit-identical to pooling ``x.astype(float32)`` (0..255 integers are
    exact in fp32).
    """
    H, wc = x.shape
    assert H % 2 == 0 and wc % (2 * C) == 0
    assert x.dtype in (jnp.float32, jnp.uint8), x.dtype
    grid = (pl.cdiv(H // 2, _BR), pl.cdiv(wc, _BW))
    ranges = _band_ranges(_BW, C)
    has_bias = bias is not None
    in_specs = [pl.BlockSpec((2 * _BR, _BW), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)]
    args = [x]
    if has_bias:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, jnp.asarray(bias, jnp.float32).reshape(1, 1))
    return pl.pallas_call(
        functools.partial(_pool_kernel, n_rows=H, n_cols=wc, channels=C,
                          ranges=ranges, has_bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((H // 2, wc // 2), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_BR, _BW // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
