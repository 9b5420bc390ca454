"""Pallas 2x2 average-pool — the pyramid downsample hot op.

The reference builds its pyramid with NPP's bilinear x0.5 resize
(/root/reference/src/kernels/pyramid.cpp:151-155), which for even dims is
exactly a 2x2 box average.  XLA's ``reduce_window`` on a [H, W, 3] image
picks a pathological layout in the composed pipeline (measured 2.6 ms for
one 4K level — ~17x off the bandwidth bound), so the big levels use this
kernel instead.

Design (all structured around what's fast on the VPU/MXU):
  * The image is viewed as [H//2, 2*W*C] (a free, major-dim reshape that
    lays each row pair side by side) and passed TWICE with block index
    maps selecting the even / odd half — the block DMA does the row
    de-interleave for free; the kernel's row pooling is a single
    elementwise add, no sublane ops.
  * Column pooling is ONE one-hot-ish matmul: sel[m, n] has ones at the
    two source lanes {2C*k + ch, 2C*k + C + ch} of output lane n = C*k+ch,
    so the MXU performs both the pairing and the lane compaction.
  * Manual bf16x3 split: a = a1 + a2 + a3 with each part exactly
    bf16-representable covers all 24 fp32 mantissa bits, so three native
    bf16 matmuls against the exactly-representable 0/1 matrix recover
    near-fp32 accuracy (the parts accumulate in a different order than an
    fp32 pairwise sum, so exact bit equality is not guaranteed — the
    equivalence test bounds the error at ~1 ulp) at half the cost of
    Precision.HIGHEST (Mosaic supports only DEFAULT/HIGHEST; DEFAULT
    alone would round the image to bf16 — ~0.5 absolute error on a
    0..255 image).

BW = 768 is a multiple of 2C for C in {1, 3} and of 256 (so both the
input block and the BW/2-wide output block are lane-tile aligned);
widths that don't divide are lane-padded and the result sliced.
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


def _pool_kernel(even_ref, odd_ref, sel_ref, o_ref):
    a = even_ref[:] + odd_ref[:]
    sel = sel_ref[:]
    a1 = a.astype(jnp.bfloat16)
    r = a - a1.astype(jnp.float32)
    a2 = r.astype(jnp.bfloat16)
    a3 = (r - a2.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(a1, sel, preferred_element_type=jnp.float32)
    acc += jnp.dot(a2, sel, preferred_element_type=jnp.float32)
    acc += jnp.dot(a3, sel, preferred_element_type=jnp.float32)
    o_ref[:] = acc * 0.25


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
    x = x.reshape(H // 2, 2 * wcp)
    grid = (pl.cdiv(H // 2, _BR), nj)
    out = pl.pallas_call(
        _pool_kernel,
        out_shape=jax.ShapeDtypeStruct((H // 2, wcp // 2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BR, _BW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BR, _BW), lambda i, j, nj=nj: (i, j + nj),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BW, _BW // 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BR, _BW // 2), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, x, jnp.asarray(_sel_matrix(_BW, C), jnp.bfloat16))
    return out[:, :wc // 2]
