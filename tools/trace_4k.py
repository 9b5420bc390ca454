"""Capture a jax.profiler trace of the chained 4K pipeline and dump
op-level stats via tensorboard_plugin_profile.

Usage: python tools/trace_4k.py [width height n]
"""

import glob
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.models.dis_flow import dis_flow_padded, upsample_flow_to_full

LOGDIR = "/tmp/jaxtrace"


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2176
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cfg = operating_point(2, width=W)
    rng = np.random.default_rng(0)
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)

    @jax.jit
    def chained(a, b):
        def body(i, acc):
            f = dis_flow_padded(a + acc * 1e-12, b + acc * 1e-12, cfg)
            f = upsample_flow_to_full(f, cfg, H, W)
            return acc + jnp.sum(f) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(I0, I1))  # compile
    t0 = time.perf_counter()
    jax.profiler.start_trace(LOGDIR)
    float(chained(I0, I1))
    jax.profiler.stop_trace()
    print(f"wall for {n} frames: {(time.perf_counter()-t0)*1e3:.1f} ms")

    # Find the xplane file and convert to op stats.
    xplanes = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
    xplanes.sort(key=lambda p: -len(p))
    print("xplane:", xplanes[-1] if xplanes else None)


if __name__ == "__main__":
    main()
