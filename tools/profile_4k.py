"""Deep-chain 4K profile: n=64 iterations to push the tunnel RTT floor
(~25-35 ms / n) well below the device times being measured.

Usage: python tools/profile_4k.py [width height n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.models.dis_flow import dis_flow_padded, upsample_flow_to_full
from flowonthego_tpu.ops.pyramid import build_pyramid


def chain_time(fn, args, n=64, trials=3):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(*(x + acc * 1e-12 if x.dtype == jnp.float32 else x
                       for x in a))
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
    print(f"config: cs={cfg.coarsest_scale} fs={cfg.finest_scale}")

    rng = np.random.default_rng(0)
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    n_levels = cfg.coarsest_scale + 1

    t = chain_time(lambda a, b: sum(jnp.sum(l.image) for l in
                                    build_pyramid(a, n_levels, cfg.padding))
                   + jnp.sum(b[0, 0]), (I0, I1), n)
    print(f"pyramid (one frame):       {t:8.3f} ms")

    t = chain_time(lambda a, b: jnp.sum(dis_flow_padded(a, b, cfg)),
                   (I0, I1), n)
    print(f"dis_flow_padded (all-in):  {t:8.3f} ms")

    f_small = dis_flow_padded(I0, I1, cfg)

    t = chain_time(lambda f: jnp.sum(upsample_flow_to_full(f, cfg, H, W)),
                   (f_small,), n)
    print(f"upsample_flow_to_full:     {t:8.3f} ms")

    def full(a, b):
        f = dis_flow_padded(a, b, cfg)
        return jnp.sum(upsample_flow_to_full(f, cfg, H, W))
    t = chain_time(full, (I0, I1), n)
    print(f"TOTAL end-to-end:          {t:8.3f} ms  ({1000.0 / t:.1f} fps)")


if __name__ == "__main__":
    main()
