"""Bisect the composed dis_flow_padded cost by truncating the pipeline.

Usage: python tools/profile_bisect.py [width height n]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.models.dis_flow import dis_flow_padded


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
    base = operating_point(2, width=W)
    print(f"config: cs={base.coarsest_scale} fs={base.finest_scale}")

    rng = np.random.default_rng(0)
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)

    for fs in range(base.coarsest_scale, base.finest_scale - 1, -1):
        cfg = dataclasses.replace(base, finest_scale=fs)
        t = chain_time(lambda a, b: jnp.sum(dis_flow_padded(a, b, cfg)),
                       (I0, I1), n)
        cfg_nv = dataclasses.replace(cfg, use_var_ref=False)
        tn = chain_time(lambda a, b: jnp.sum(dis_flow_padded(a, b, cfg_nv)),
                        (I0, I1), n)
        print(f"fs={fs}: full {t:8.3f} ms   no-varref {tn:8.3f} ms")


if __name__ == "__main__":
    main()
