"""Per-stage device timing via on-device chaining (amortizes tunnel RTT).

Usage: python tools/profile_stages.py [width height n] [--op N]

Note the ~25-35 ms tunnel RTT divides by the chain depth n: with the
default n=48 the floor under every number is ~0.6 ms.  Subtract it when
comparing stages; tools/profile_4k.py and profile_scales.py show the
same decomposition at 4K defaults.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.models.dis_flow import dis_flow_padded, upsample_flow_to_full
from flowonthego_tpu.ops import densify as densify_mod
from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops import variational as var_mod
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops.pyramid import build_pyramid


def chain_time(fn, args, n=None, trials=3):
    n = n or N_CHAIN
    """Median per-iteration device time of fn(*args) -> scalar-reducible."""

    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(*(x + acc * 1e-12 if x.dtype == jnp.float32 else x
                       for x in a))
            return acc + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(*args))  # compile
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    return times[len(times) // 2] * 1e3


N_CHAIN = 48


def main():
    global N_CHAIN
    argv = list(sys.argv[1:])
    op = 2
    if "--op" in argv:
        i = argv.index("--op")
        op = int(argv[i + 1])
        del argv[i:i + 2]
    W = int(argv[0]) if len(argv) > 0 else 1024
    H = int(argv[1]) if len(argv) > 1 else 448
    if len(argv) > 2:
        N_CHAIN = int(argv[2])
    cfg = operating_point(op, width=W)
    print(f"config: cs={cfg.coarsest_scale} fs={cfg.finest_scale} "
          f"ps={cfg.patch_size} steps={cfg.steps} iters={cfg.grad_descent_iter}")

    rng = np.random.default_rng(0)
    I0 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)
    I1 = jax.device_put(rng.random((H, W, 3), np.float32) * 255)

    n_levels = cfg.coarsest_scale + 1

    t = chain_time(lambda a, b: sum(jnp.sum(l.image) for l in
                                    build_pyramid(a, n_levels, cfg.padding))
                   + jnp.sum(b[0, 0]), (I0, I1))
    print(f"pyramid (one frame): {t:8.3f} ms")

    pyr0 = build_pyramid(I0, n_levels, cfg.padding)
    pyr1 = build_pyramid(I1, n_levels, cfg.padding)

    for sl in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
        w_sl, h_sl = W >> sl, H >> sl
        grid = PatchGrid.create(cfg, w_sl, h_sl)
        lvl0, lvl1 = pyr0[sl], pyr1[sl]

        def extract(img, gx, gy):
            t, a, b, Hs = extract_templates_and_hessians(img, gx, gy, grid, cfg)
            return jnp.sum(t) + jnp.sum(Hs)
        te = chain_time(extract, (lvl0.image, lvl0.grad_x, lvl0.grad_y))

        tmpl, gx, gy, Hs = extract_templates_and_hessians(
            lvl0.image, lvl0.grad_x, lvl0.grad_y, grid, cfg)

        def opt(img1):
            st = dis_mod.init_state(tmpl, gx, gy, Hs, grid)
            st = dis_mod.optimize(st, img1, grid, cfg)
            return st.p_cur
        to = chain_time(opt, (lvl1.image,))

        st = dis_mod.init_state(tmpl, gx, gy, Hs, grid)
        st = dis_mod.optimize(st, lvl1.image, grid, cfg)

        def dens(cost_px):
            return densify_mod.densify(st._replace(cost_px=cost_px), grid, cfg)
        td = chain_time(dens, (st.cost_px,))

        flow = densify_mod.densify(st, grid, cfg)
        p = cfg.padding
        im1c = lvl0.image[p:p + h_sl, p:p + w_sl, :]
        im2c = lvl1.image[p:p + h_sl, p:p + w_sl, :]

        def varref(f):
            return var_mod.variational_refine_auto(f, im1c, im2c, cfg, sl)
        tv = chain_time(varref, (flow,)) if cfg.use_var_ref else 0.0

        print(f"scale {sl} ({w_sl}x{h_sl}, {grid.n_patches} patches): "
              f"extract {te:7.3f}  optimize {to:7.3f}  densify {td:7.3f}  "
              f"varref {tv:7.3f} ms")

    def full(a, b):
        f = dis_flow_padded(a, b, cfg)
        return upsample_flow_to_full(f, cfg, H, W)
    tf = chain_time(full, (I0, I1))
    print(f"TOTAL end-to-end: {tf:8.3f} ms  ({1000.0 / tf:.1f} fps)")


if __name__ == "__main__":
    main()
