"""Isolate the two-pyramid anomaly at 4K.

Usage: python tools/profile_pyr2.py [width height n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.ops.pyramid import build_pyramid


def chain_time(fn, args, n=64, trials=3, perturb=True):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            if perturb:
                out = fn(*(x + acc * 1e-12 for x in a))
            else:
                out = fn(*a) + acc * 0.0
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
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)

    def pyr_consume(a, start):
        levels = build_pyramid(a, cfg.coarsest_scale + 1, cfg.padding,
                               start_level=start)
        acc = jnp.float32(0.0)
        for l in levels:
            acc += jnp.sum(l.image)
            if l.grad_x is not None:
                acc += jnp.sum(l.grad_x) + jnp.sum(l.grad_y)
        return acc

    for start in (5, 7):
        t1 = chain_time(lambda a: pyr_consume(a, start), (I0,), n)
        t2 = chain_time(lambda a, b: pyr_consume(a, start)
                        + pyr_consume(b, start), (I0, I1), n)
        print(f"start={start}: one pyramid {t1:7.3f} ms   two {t2:7.3f} ms")

    t = chain_time(lambda a, b: pyr_consume(a, 7) + pyr_consume(b, 7),
                   (I0, I1), n, perturb=False)
    print(f"two pyramids, no perturb:      {t:7.3f} ms")

    t = chain_time(lambda a: pyr_consume(a, 7) + pyr_consume(a * 1.0001, 7),
                   (I0,), n)
    print(f"two pyramids from one input:   {t:7.3f} ms")

    t = chain_time(lambda a, b: jnp.sum(a) + jnp.sum(b), (I0, I1), n)
    print(f"just sum both inputs:          {t:7.3f} ms")


if __name__ == "__main__":
    main()
