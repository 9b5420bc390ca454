"""Micro-profile of one GN iteration's pieces at the 4K fine scale.

Usage: python tools/profile_gn_iter.py [width height n]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops.interp import blend_windows, gather_windows
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
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
    sl = 5
    cfg = operating_point(2, width=W)
    w_sl, h_sl = W >> sl, H >> sl
    grid = PatchGrid.create(cfg, w_sl, h_sl)
    print(f"scale {sl}: {w_sl}x{h_sl}, {grid.n_patches} patches "
          f"({grid.n_h}x{grid.n_w}), ps={grid.patch_size}")

    rng = np.random.default_rng(0)
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    pyr0 = build_pyramid(I0, cfg.coarsest_scale + 1, cfg.padding)
    pyr1 = build_pyramid(I1, cfg.coarsest_scale + 1, cfg.padding)
    lvl0, lvl1 = pyr0[sl], pyr1[sl]
    print("padded level shape:", lvl1.image.shape)

    tmpl, gx, gy, Hs = extract_templates_and_hessians(
        lvl0.image, lvl0.grad_x, lvl0.grad_y, grid, cfg)
    st = dis_mod.init_state(tmpl, gx, gy, Hs, grid)
    mx = st.mid_org[..., 0]
    my = st.mid_org[..., 1]
    ps = grid.patch_size
    n_h, n_w = grid.n_h, grid.n_w
    C = 3
    N = ps * ps * C
    ones = jnp.ones_like(tmpl)
    W4 = jnp.stack([ones, tmpl, gx, gy], axis=-1).reshape(n_h, n_w, N, 4)

    t = chain_time(lambda img, a, b: jnp.sum(
        gather_windows(img, a, b, ps, grid.padding)[0]), (lvl1.image, mx, my), n)
    print(f"gather_windows:            {t:8.3f} ms")

    win, rx, ry = gather_windows(lvl1.image, mx, my, ps, grid.padding)
    t = chain_time(lambda w, a, b: jnp.sum(blend_windows(w, a, b)),
                   (win, rx, ry), n)
    print(f"blend_windows:             {t:8.3f} ms")

    S = blend_windows(win, rx, ry).reshape(n_h, n_w, N)
    t = chain_time(lambda s, w4: jnp.sum(
        jnp.einsum("hwk,hwki->hwi", s, w4,
                   preferred_element_type=jnp.float32)), (S, W4), n)
    print(f"einsum reduction:          {t:8.3f} ms")

    def one_iter(img, p):
        mid = st.mid_org + p
        win, rx, ry = gather_windows(img, mid[..., 0], mid[..., 1],
                                     ps, grid.padding)
        Sl = blend_windows(win, rx, ry).reshape(n_h, n_w, N)
        red = jnp.einsum("hwk,hwki->hwi", Sl, W4,
                         preferred_element_type=jnp.float32)
        return red.sum(axis=-1)[..., None] * 1e-6 + p
    t = chain_time(lambda img: jnp.sum(one_iter(img, st.p_cur)),
                   (lvl1.image,), n)
    print(f"one full GN iter:          {t:8.3f} ms")

    def full_opt(img):
        s2 = dis_mod.optimize(st, img, grid, cfg)
        return s2.p_cur
    t = chain_time(lambda img: jnp.sum(full_opt(img)), (lvl1.image,), n)
    print(f"optimize (12 iters):       {t:8.3f} ms")


if __name__ == "__main__":
    main()
