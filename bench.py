"""Benchmark harness: frames/sec/chip on the reference's headline workloads.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: dense 4K optical flow, operating point 2, single chip —
the reference achieves ~25 fps at 4K on a Jetson TX2
(/root/reference/docs/index.md:173-175, BASELINE.md).
Extras: 1024x436 fps (ref: 25 fps) and mean EPE vs the bundled
reference flow on Sintel alley_1 frames 1-2.
"""

import json
import sys
import time

import numpy as np


def time_fn(fn, *args, iters=8, warmup=2):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    import jax
    import jax.numpy as jnp
    from flowonthego_tpu.config import operating_point, pad_to_divisible
    from flowonthego_tpu.models.dis_flow import (dis_flow_padded,
                                                 upsample_flow_to_full)
    from flowonthego_tpu.io.images import load_image
    from flowonthego_tpu.io.flo import read_flo
    from flowonthego_tpu.utils.metrics import average_epe

    def make_step(H, W, cfg):
        def step(I0, I1):
            flow = dis_flow_padded(I0, I1, cfg)
            return upsample_flow_to_full(flow, cfg, H, W)
        return jax.jit(step)

    results = {}

    # ---- 4K (3840x2160 padded to 3840x2176), op 2 ----
    H4, W4 = 2176, 3840
    cfg4 = operating_point(2, width=W4)
    rng = np.random.default_rng(0)
    base = rng.random((H4 + 8, W4 + 8, 3), np.float32) * 255.0
    I0 = jnp.asarray(base[:H4, :W4])
    I1 = jnp.asarray(base[4:4 + H4, 3:3 + W4])
    step4 = make_step(H4, W4, cfg4)
    t4 = time_fn(step4, I0, I1)
    results["fps_4k"] = 1.0 / t4
    results["ms_4k"] = t4 * 1e3
    del I0, I1

    # ---- 1024x436 Sintel (padded 1024x448), op 2 + EPE ----
    A = load_image("/root/reference/images/alley_1/frame_0001.png")
    B = load_image("/root/reference/images/alley_1/frame_0002.png")
    h, w = A.shape[:2]
    cfg1 = operating_point(2, width=w)
    pt, pb, pl, pr = pad_to_divisible(w, h, cfg1.coarsest_scale)
    Ap = np.pad(A, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    Bp = np.pad(B, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    H1, W1 = Ap.shape[:2]
    step1 = make_step(H1, W1, cfg1)
    I0s, I1s = jnp.asarray(Ap), jnp.asarray(Bp)
    t1 = time_fn(step1, I0s, I1s)
    results["fps_1024x436"] = 1.0 / t1
    results["ms_1024x436"] = t1 * 1e3

    flow = np.asarray(step1(I0s, I1s))[pt:pt + h, pl:pl + w]
    ref = read_flo("/root/reference/kroeger/flows/alley_0001.flo")
    results["epe_vs_ref_alley1"] = average_epe(flow, ref)

    out = {
        "metric": "fps_4k_per_chip_op2",
        "value": round(results["fps_4k"], 3),
        "unit": "frames/sec",
        "vs_baseline": round(results["fps_4k"] / 25.0, 3),
        "fps_1024x436": round(results["fps_1024x436"], 3),
        "ms_4k": round(results["ms_4k"], 3),
        "ms_1024x436": round(results["ms_1024x436"], 3),
        "epe_vs_ref_alley1": round(results["epe_vs_ref_alley1"], 5),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
