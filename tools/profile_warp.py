"""Microbenchmark variational-warp formulations on TPU.

The streamed-4K trace shows warp_image's 4 corner gathers cost
~0.18 ms/frame (4x f32[8160,3] gather fusions at 35 us each at the fine
scale) — gather on TPU is pathological.  Candidates:
  A. current: rank-3 fancy-index gather [h, w, 3]
  B. per-channel planar 2D gathers
  C. linearized 1D gather per channel
  D. one-hot MXU two-stage (rows matmul then per-pixel column select)
  E. row-shift masked sum + in-row one-hot column matmul (exact)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.ops.variational import warp_image


def timeit(fn, args, n=200):
    out = jax.block_until_ready(jax.jit(fn)(*args))

    @jax.jit
    def chained(*a):
        def body(i, acc):
            o = fn(*(x + acc * 1e-20 for x in a))
            o = o[0] if isinstance(o, tuple) else o
            return acc + jnp.sum(o) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / n * 1e6  # us


def variant_planar(src, wx, wy):
    h, w = src.shape[:2]
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xx = ii + wx
    yy = jj + wy
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = (xx - x0)[..., None]
    dy = (yy - y0)[..., None]
    mask = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)).astype(src.dtype)
    x1 = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x2 = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y2 = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    outs = []
    for c in range(src.shape[2]):
        p = src[:, :, c]
        o = (p[y1, x1] * (1 - dx[..., 0]) * (1 - dy[..., 0])
             + p[y1, x2] * dx[..., 0] * (1 - dy[..., 0])
             + p[y2, x1] * (1 - dx[..., 0]) * dy[..., 0]
             + p[y2, x2] * dx[..., 0] * dy[..., 0])
        outs.append(o)
    return jnp.stack(outs, -1), mask


def variant_linear(src, wx, wy):
    h, w = src.shape[:2]
    flat = src.reshape(h * w, src.shape[2])
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xx = ii + wx
    yy = jj + wy
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = (xx - x0)[..., None]
    dy = (yy - y0)[..., None]
    mask = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)).astype(src.dtype)
    x1 = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x2 = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y2 = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    i11 = (y1 * w + x1).reshape(-1)
    i12 = (y1 * w + x2).reshape(-1)
    i21 = (y2 * w + x1).reshape(-1)
    i22 = (y2 * w + x2).reshape(-1)
    out = (flat[i11].reshape(h, w, -1) * (1 - dx) * (1 - dy)
           + flat[i12].reshape(h, w, -1) * dx * (1 - dy)
           + flat[i21].reshape(h, w, -1) * (1 - dx) * dy
           + flat[i22].reshape(h, w, -1) * dx * dy)
    return out, mask


def variant_onehot(src, wx, wy):
    """Rows via one MXU matmul, columns via K-shift masked sum."""
    h, w = src.shape[:2]
    C = src.shape[2]
    wc = w * C
    flat = src.reshape(h, wc)
    jj = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    ii = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xx = ii + wx
    yy = jj + wy
    x0 = jnp.floor(xx)
    y0 = jnp.floor(yy)
    dx = (xx - x0)[..., None]
    dy = (yy - y0)[..., None]
    mask = ((xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)).astype(src.dtype)
    x1 = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    y1 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y2 = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)

    # gather rows y1 and y2 for every output pixel: [h*w, h] @ [h, wc]
    P = h * w
    prec = jax.lax.Precision.HIGHEST
    oh1 = (jax.lax.broadcasted_iota(jnp.int32, (P, h), 1)
           == y1.reshape(P)[:, None]).astype(src.dtype)
    oh2 = (jax.lax.broadcasted_iota(jnp.int32, (P, h), 1)
           == y2.reshape(P)[:, None]).astype(src.dtype)
    R1 = jnp.dot(oh1, flat, precision=prec)    # [P, wc]
    R2 = jnp.dot(oh2, flat, precision=prec)
    Ry = (R1.reshape(h, w, wc) * (1 - dy[..., None][..., 0, :])
          if False else R1)
    # blend y first
    Rb = R1 * (1 - dy.reshape(P, 1)) + R2 * dy.reshape(P, 1)   # [P, wc]
    # column select: out[p, c] = Rb[p, x1[p]*C + c], x2 = x1+1 clamped
    x1f = x1.reshape(P)
    x2c = jnp.clip(x1f + 1, 0, w - 1)
    ohc1 = (jax.lax.broadcasted_iota(jnp.int32, (P, w), 1)
            == x1f[:, None]).astype(src.dtype)
    ohc2 = (jax.lax.broadcasted_iota(jnp.int32, (P, w), 1)
            == x2c[:, None]).astype(src.dtype)
    Rb3 = Rb.reshape(P, w, C)
    g1 = jnp.einsum("pw,pwc->pc", ohc1, Rb3, precision=prec)
    g2 = jnp.einsum("pw,pwc->pc", ohc2, Rb3, precision=prec)
    out = g1 * (1 - dx.reshape(P, 1)) + g2 * dx.reshape(P, 1)
    return out.reshape(h, w, C), mask


def main():
    rng = np.random.default_rng(0)
    for (h, w) in [(68, 120), (34, 60), (109, 240)]:
        src = jnp.asarray(rng.random((h, w, 3), np.float32) * 255)
        wx = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 3)
        wy = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 3)
        ref = np.asarray(warp_image(src, wx, wy)[0])
        print(f"--- {h}x{w} ---")
        for name, fn in [("A current", warp_image),
                         ("B planar", variant_planar),
                         ("C linear", variant_linear),
                         ("D onehot", variant_onehot)]:
            got = np.asarray(jax.jit(fn)(src, wx, wy)[0])
            err = float(np.abs(got - ref).max())
            us = timeit(fn, (src, wx, wy))
            print(f"{name:10s} {us:8.1f} us   maxerr {err:.2e}")


if __name__ == "__main__":
    main()


def run_onehot_prod():
    """Measure the production warp_image one-hot path vs gather on TPU."""
    rng = np.random.default_rng(0)
    for (h, w) in [(68, 120), (34, 60), (109, 240)]:
        src = jnp.asarray(rng.random((h, w, 3), np.float32) * 255)
        wx = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 3)
        wy = jnp.asarray(rng.standard_normal((h, w)).astype(np.float32) * 3)
        import functools
        fn_g = functools.partial(warp_image, force_onehot=False)
        fn_o = functools.partial(warp_image, force_onehot=True)
        ref = np.asarray(jax.jit(fn_g)(src, wx, wy)[0])
        got = np.asarray(jax.jit(fn_o)(src, wx, wy)[0])
        err = float(np.abs(got - ref).max())
        print(f"--- {h}x{w} ---  gather {timeit(fn_g, (src, wx, wy)):8.1f} us"
              f"  onehot {timeit(fn_o, (src, wx, wy)):8.1f} us"
              f"  maxerr {err:.2e}")
