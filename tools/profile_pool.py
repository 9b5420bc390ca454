"""Microbenchmark pool-kernel variants (the pyramid's dominant cost).

The one-hot pool matmuls are MXU-FLOP-bound: MACs per output element =
contraction length (2*BR=128 for rows, BW=768 for columns) while the
pooling itself needs only 2.  Both matrices are BAND matrices, so the
matmuls can be split into narrow 128-aligned bands:
  * columns: output chunk [128m, 128m+128) only reads input lanes
    [2*128m - 2, 2*128m + 261) ⊂ three static 128-aligned windows of
    width 384/512/384 — 1.8x fewer MACs;
  * rows: output rows [8m, 8m+8) only read input rows [16m, 16m+16) —
    8x fewer MACs (at the cost of 8 tiny matmuls).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from flowonthego_tpu.ops.pallas.pool import (_BW, _BR, _mm3, _split3,
                                             pool2x2_flat)


def _row_matrix(br):
    """[br, 2*br] two-ones-per-row matrix (out row k <- in rows 2k, 2k+1),
    as a host-side operand (the production kernel builds it from iota)."""
    L = np.zeros((br, 2 * br), np.float32)
    k = np.arange(br)
    L[k, 2 * k] = 1.0
    L[k, 2 * k + 1] = 1.0
    return jnp.asarray(L, jnp.bfloat16)


def _sel_matrix(bw, channels):
    """[bw, bw//2] column-pair matrix (host-side operand variant)."""
    sel = np.zeros((bw, bw // 2), np.float32)
    n = np.arange(bw // 2)
    m0 = (n // channels) * 2 * channels + (n % channels)
    sel[m0, n] = 1.0
    sel[m0 + channels, n] = 1.0
    return sel


def _sel_bands(bw, C):
    sel = _sel_matrix(bw, C)
    bands = []
    for m in range(bw // 2 // 128):
        cols = sel[:, m * 128:(m + 1) * 128]
        nz = np.nonzero(cols.any(axis=1))[0]
        lo = (nz.min() // 128) * 128
        hi = min(-(-(int(nz.max()) + 1) // 128) * 128, bw)
        bands.append((int(lo), int(hi), cols[lo:hi]))
    return bands


def make_banded(C, banded_rows=False, reshape_rows=False):
    bands = _sel_bands(_BW, C)

    def kernel(x_ref, L_ref, *args, n_rows):
        band_refs = args[:-1]
        o_ref = args[-1]
        x = x_ref[:]
        if n_rows % (2 * _BR):
            jj = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
            x = jnp.where(jj + pl.program_id(0) * (2 * _BR) < n_rows, x, 0.0)
        if reshape_rows:
            a = x.reshape(_BR, 2, _BW).sum(axis=1)
        elif banded_rows:
            RB = 8
            Lb = L_ref[:]                      # [RB, 2*RB]
            parts = []
            for m in range(_BR // RB):
                xs = x[2 * RB * m:2 * RB * (m + 1), :]
                x1, x2, x3 = _split3(xs)
                am = jnp.dot(Lb, x1, preferred_element_type=jnp.float32)
                am += jnp.dot(Lb, x2, preferred_element_type=jnp.float32)
                am += jnp.dot(Lb, x3, preferred_element_type=jnp.float32)
                parts.append(am)
            a = jnp.concatenate(parts, axis=0)
        else:
            L = L_ref[:]
            x1, x2, x3 = _split3(x)
            a = jnp.dot(L, x1, preferred_element_type=jnp.float32)
            a += jnp.dot(L, x2, preferred_element_type=jnp.float32)
            a += jnp.dot(L, x3, preferred_element_type=jnp.float32)
        outs = []
        for (lo, hi, _), bref in zip(bands, band_refs):
            outs.append(_mm3(a[:, lo:hi], bref[:]))
        o_ref[:] = jnp.concatenate(outs, axis=1) * 0.25

    def pool(x):
        H, wc = x.shape
        pad = (-wc) % _BW
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        wcp = wc + pad
        nj = wcp // _BW
        grid = (pl.cdiv(H // 2, _BR), nj)
        RB = 8
        Lmat = _row_matrix(RB if banded_rows else _BR)
        band_specs = [pl.BlockSpec((hi - lo, 128), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)
                      for (lo, hi, _) in bands]
        out = pl.pallas_call(
            functools.partial(kernel, n_rows=H),
            out_shape=jax.ShapeDtypeStruct((H // 2, wcp // 2), jnp.float32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((2 * _BR, _BW), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(Lmat.shape, lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ] + band_specs,
            out_specs=pl.BlockSpec((_BR, _BW // 2), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        )(x, jnp.asarray(Lmat, jnp.bfloat16),
          *[jnp.asarray(b, jnp.bfloat16) for (_, _, b) in bands])
        return out[:, :wc // 2]

    return pool


def timeit(fn, x, n=100):
    @jax.jit
    def chained(a):
        def body(i, acc):
            o = fn(a + acc * 1e-20)
            return acc + jnp.sum(o) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(chained(x))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e6


def main():
    rng = np.random.default_rng(0)
    C = 3
    for (H, WC) in [(2176, 11520), (1088, 5760), (544, 2880)]:
        x = jnp.asarray(rng.random((H, WC), np.float32) * 255.0)
        ref = np.asarray(pool2x2_flat(x, C))
        print(f"--- {H}x{WC} ---")
        variants = [
            ("P0 current", lambda a: pool2x2_flat(a, C)),
            ("P1 band-cols", make_banded(C)),
            ("P2 band-both", make_banded(C, banded_rows=True)),
            ("P3 reshape-rows", make_banded(C, reshape_rows=True)),
        ]
        for name, fn in variants:
            try:
                got = np.asarray(jax.jit(fn)(x))
                err = float(np.abs(got - ref).max())
                us = timeit(fn, x)
                print(f"{name:16s} {us:9.1f} us   maxerr {err:.2e}")
            except Exception as e:
                print(f"{name:16s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}")


if __name__ == "__main__":
    main()
