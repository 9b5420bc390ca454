"""Trace the full pipeline at any operating point/size; dump top ops.

Usage: python tools/trace_op.py [--op N] [width height n] [--top K]
"""
import glob
import os
import shutil
import subprocess
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.models.dis_flow import dis_flow_padded, upsample_flow_to_full

LOGDIR = "/tmp/jaxtrace_op"


def main():
    argv = list(sys.argv[1:])
    op, top = 2, 40
    if "--op" in argv:
        i = argv.index("--op"); op = int(argv[i + 1]); del argv[i:i + 2]
    if "--top" in argv:
        i = argv.index("--top"); top = int(argv[i + 1]); del argv[i:i + 2]
    W = int(argv[0]) if len(argv) > 0 else 1024
    H = int(argv[1]) if len(argv) > 1 else 448
    n = int(argv[2]) if len(argv) > 2 else 16
    cfg = operating_point(op, width=W)
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
    shutil.rmtree(LOGDIR, ignore_errors=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(LOGDIR)
    float(chained(I0, I1))
    jax.profiler.stop_trace()
    print(f"wall for {n} frames: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"({(time.perf_counter()-t0)*1e3/n:.2f} ms/frame)")
    xplanes = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
    if xplanes:
        subprocess.run([sys.executable, "tools/xplane_stats.py",
                        xplanes[0], str(top)])


if __name__ == "__main__":
    main()
