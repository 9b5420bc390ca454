"""Bisect INSIDE the composed fs=7 pipeline at 4K.

Usage: python tools/profile_fs7.py [width height n]
"""

import dataclasses
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.ops import densify as densify_mod
from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops import variational as var_mod
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops.pyramid import build_pyramid


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
    sl = 7
    cfg = dataclasses.replace(operating_point(2, width=W), finest_scale=sl)
    rng = np.random.default_rng(0)
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    w_sl, h_sl = W >> sl, H >> sl
    grid = PatchGrid.create(cfg, w_sl, h_sl)

    def upto(stage):
        def fn(a, b):
            pyr0 = build_pyramid(a, cfg.coarsest_scale + 1, cfg.padding,
                                 start_level=sl)
            pyr1 = build_pyramid(b, cfg.coarsest_scale + 1, cfg.padding,
                                 start_level=sl)
            lvl0, lvl1 = pyr0[sl], pyr1[sl]
            acc = jnp.sum(lvl0.image) + jnp.sum(lvl1.image)
            if stage == "pyr":
                return acc + jnp.sum(lvl0.grad_x) + jnp.sum(lvl1.grad_y)
            tmpl, gx, gy, Hs = extract_templates_and_hessians(
                lvl0.image, lvl0.grad_x, lvl0.grad_y, grid, cfg)
            if stage == "extract":
                return acc + jnp.sum(tmpl) + jnp.sum(Hs)
            st = dis_mod.init_state(tmpl, gx, gy, Hs, grid)
            st = dis_mod.optimize(st, lvl1.image, grid, cfg)
            if stage == "optimize":
                return acc + jnp.sum(st.p_cur) + jnp.sum(st.cost_px)
            flow = densify_mod.densify(st, grid, cfg)
            if stage == "densify":
                return acc + jnp.sum(flow)
            p = cfg.padding
            im1 = lvl0.image[p:p + h_sl, p:p + w_sl, :]
            im2 = lvl1.image[p:p + h_sl, p:p + w_sl, :]
            flow = var_mod.variational_refine(flow, im1, im2, cfg, sl)
            return acc + jnp.sum(flow)
        return fn

    for stage in ["pyr", "extract", "optimize", "densify", "varref"]:
        t = chain_time(upto(stage), (I0, I1), n)
        print(f"through {stage:9s}: {t:8.3f} ms")


if __name__ == "__main__":
    main()
