"""Time pyramid variants + downsample implementations at 4K.

Usage: python tools/profile_pyr.py [width height n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.ops.pyramid import build_pyramid, downsample_half


def chain_time(fn, args, n=64, trials=3):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(*(x + acc * 1e-12 for x in a))
            return acc + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(*args))
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    return times[len(times) // 2] * 1e3


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2176
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    cfg = operating_point(2, width=W)
    rng = np.random.default_rng(0)
    I = jax.device_put(rng.random((H, W, 3), np.float32) * 255)

    def consume(levels):
        acc = jnp.float32(0.0)
        for l in levels:
            acc += jnp.sum(l.image)
            if l.grad_x is not None:
                acc += jnp.sum(l.grad_x) + jnp.sum(l.grad_y)
        return acc

    t = chain_time(lambda a: consume(build_pyramid(
        a, cfg.coarsest_scale + 1, cfg.padding,
        start_level=cfg.finest_scale)), (I,), n)
    print(f"pyramid full consume (start_level={cfg.finest_scale}): {t:8.3f} ms")

    t = chain_time(lambda a: jnp.sum(downsample_half(a)), (I,), n)
    print(f"downsample_half reduce_window 4K:   {t:8.3f} ms")

    # variant: depthwise conv stride 2
    def pool_conv(x):
        k = jnp.full((2, 2, 1, 1), 0.25, x.dtype)
        x4 = x.transpose(2, 0, 1)[:, None]  # [C, 1, H, W]
        y = jax.lax.conv_general_dilated(
            x4, k.transpose(3, 2, 0, 1), (2, 2), "VALID")
        return y[:, 0].transpose(1, 2, 0)
    t = chain_time(lambda a: jnp.sum(pool_conv(a)), (I,), n)
    print(f"downsample conv(depthwise via batch): {t:8.3f} ms")

    # variant: reshape mean
    def pool_reshape(x):
        h, w, c = x.shape
        return x.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
    t = chain_time(lambda a: jnp.sum(pool_reshape(a)), (I,), n)
    print(f"downsample reshape-mean:             {t:8.3f} ms")

    # variant: matmul pair (banded box matrices)
    def box_matrix(n_out):
        import numpy as np2
        M = np2.zeros((n_out, 2 * n_out), np2.float32)
        idx = np2.arange(n_out)
        M[idx, 2 * idx] = 0.5
        M[idx, 2 * idx + 1] = 0.5
        return M
    Rv = jnp.asarray(box_matrix(H // 2))
    Rh = jnp.asarray(box_matrix(W // 2))

    def pool_matmul(x):
        tmp = jnp.einsum("oh,hwc->owc", Rv, x,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("pw,owc->opc", Rh, tmp,
                          preferred_element_type=jnp.float32)
    t = chain_time(lambda a: jnp.sum(pool_matmul(a)), (I,), n)
    print(f"downsample matmul pair:              {t:8.3f} ms")

    # variant: planar CHW reduce_window
    Ip = jnp.asarray(np.moveaxis(np.asarray(I), 2, 0))  # [C, H, W]

    def pool_planar(x):
        return jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                     (1, 2, 2), (1, 2, 2), "VALID") * 0.25
    t = chain_time(lambda a: jnp.sum(pool_planar(a)), (Ip,), n)
    print(f"downsample planar CHW reduce_window: {t:8.3f} ms")

    # variant: planar rows-then-cols slicing
    def pool_planar_slice(x):
        r = x[:, 0::2, :] + x[:, 1::2, :]
        return (r[:, :, 0::2] + r[:, :, 1::2]) * 0.25
    t = chain_time(lambda a: jnp.sum(pool_planar_slice(a)), (Ip,), n)
    print(f"downsample planar slice:             {t:8.3f} ms")

    # variant: HWC rows via sublane-ish slicing on flattened view
    def pool_flat(x):
        h, w, c = x.shape
        xf = x.reshape(h, w * c)
        r = xf[0::2] + xf[1::2]          # [h/2, w*c]
        r3 = r.reshape(h // 2, w // 2, 2 * c)
        return (r3[..., :c] + r3[..., c:]) * 0.25
    t = chain_time(lambda a: jnp.sum(pool_flat(a)), (I,), n)
    print(f"downsample flat rows + tail reshape: {t:8.3f} ms")


if __name__ == "__main__":
    main()
