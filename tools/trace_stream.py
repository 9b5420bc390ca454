"""Profile the STREAMED 4K chain (the headline workload) and rank ops.

Captures a jax.profiler trace of bench.py's stream_chain step (pyramid
reuse + warm start, n frames chained in one jit) and pipes the xplane
through tools/xplane_stats.py.

Usage: python tools/trace_stream.py [width height n]
"""

import glob
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tools")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.models.dis_flow import (dis_flow_from_pyramids,
                                             upsample_flow_to_full)
from flowonthego_tpu.ops.pyramid import build_pyramid

LOGDIR = "/tmp/jaxtrace_stream"


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 3840
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2176
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    op = int(os.environ.get("FOT_OP", "2"))
    cfg = operating_point(op, width=W)
    rng = np.random.default_rng(0)
    If = jax.device_put(
        (rng.random((H, W * 3), np.float32) * 255.0))

    n_levels = cfg.coarsest_scale + 1
    init_h, init_w = H >> (cfg.coarsest_scale + 1), W >> (cfg.coarsest_scale + 1)

    def pyramid(x, bias=None):
        return build_pyramid(x.reshape(H, W, 3), n_levels, cfg.padding,
                             start_level=cfg.finest_scale,
                             ingest_bias=bias)

    @jax.jit
    def chained(x):
        # bias=0 for the priming build too: keeps both pallas pool calls
        # structurally identical so XLA's buffer assignment parks the
        # frame in the same memory space for both (a mismatch inserts a
        # per-iteration 100 MB space-transfer copy before the in-loop one)
        pyr0 = pyramid(x, bias=jnp.float32(0.0))
        init0 = jnp.zeros((init_h, init_w, 2), jnp.float32)

        def body(i, carry):
            pyr_prev, init, acc = carry
            pyr_new = pyramid(x, bias=acc * 1e-12)
            flow = dis_flow_from_pyramids(pyr_prev, pyr_new, cfg,
                                          init_flow=init)
            out = upsample_flow_to_full(flow, cfg, H, W)
            nxt = jax.image.resize(
                flow / (2.0 ** (cfg.coarsest_scale + 1 - cfg.finest_scale)),
                (init_h, init_w, 2), method="linear")
            return pyr_new, nxt, acc + jnp.sum(out) * 1e-20
        _, _, acc = jax.lax.fori_loop(0, n, body,
                                      (pyr0, init0, jnp.float32(0.0)))
        return acc

    float(chained(If))  # compile + warm
    t0 = time.perf_counter()
    float(chained(If))
    wall = (time.perf_counter() - t0) * 1e3
    print(f"warm wall for {n} frames: {wall:.1f} ms "
          f"({wall/n:.3f} ms/frame incl RTT)")

    jax.profiler.start_trace(LOGDIR)
    float(chained(If))
    jax.profiler.stop_trace()

    xplanes = glob.glob(LOGDIR + "/**/*.xplane.pb", recursive=True)
    xplanes.sort(key=os.path.getmtime)
    print("xplane:", xplanes[-1] if xplanes else None)
    if xplanes:
        import xplane_stats
        stats = xplane_stats.plane_stats(xplanes[-1])
        for pname, agg in stats.items():
            total_ps = sum(v for v, _ in agg.values())
            print(f"\n== {pname}: device total {total_ps/1e9:.3f} ms "
                  f"for {n} frames = {total_ps/1e9/n:.4f} ms/frame ==")
            rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
            print(f"{'ms/frame':>10} {'%':>6} {'n/frame':>8}  op")
            for name, (ps, cnt) in rows[:50]:
                print(f"{ps/1e9/n:10.5f} {100*ps/max(total_ps,1):6.2f} "
                      f"{cnt/n:8.1f}  {name[:100]}")


if __name__ == "__main__":
    main()
