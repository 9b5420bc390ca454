"""Isolate the fused GN kernel at op-3/4 geometry: cost vs n_iters and
tile_lanes.  Separates per-iteration VPU work from per-tile overhead."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from flowonthego_tpu.ops.pallas.dis_gn import gn_scale_loop

ps, C = 12, 3
K = ps + 1
thresh = 6.0
E = 2 * int(np.ceil(thresh)) + ps + 2   # envelope rows
P = 12825                                # op3 scale-1 patches

rng = np.random.default_rng(0)

def timeit(n_iters, tile, Pp):
    env = jnp.asarray(rng.random((E, E * C, Pp), np.float32))
    w3 = jnp.asarray(rng.random((3, ps, ps * C, Pp), np.float32))
    win1 = jnp.asarray(rng.random((K, K * C, Pp), np.float32))
    consts = np.zeros((14, Pp), np.float32)
    consts[0] = 100; consts[1] = 100       # mid far from bounds
    consts[8] = 2; consts[10] = 2; consts[11] = 4   # H, det
    consts[12] = 100 - (E - K) // 2 - (13 - ps // 2)  # env start ~centered
    consts[13] = consts[12]
    consts = jnp.asarray(consts)
    started = jnp.ones((1, Pp), np.float32)

    def run(e):
        p, c = gn_scale_loop(e, w3, win1, consts, started, n_iters=n_iters,
                             E=E, K=K, C=C, ps=ps, padding=ps,
                             thresh=thresh, l_bound=-6.0, ub_w=500.0,
                             ub_h=500.0, mean_on=1.0, n_vals=float(ps*ps*C),
                             tile_lanes=tile)
        return jnp.sum(p) + jnp.sum(c)

    n = 16
    @jax.jit
    def chained(e):
        def body(i, acc):
            return acc + run(e + acc * 1e-20) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(chained(env))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(env))
        ts.append((time.perf_counter() - t0) / n)
    return sorted(ts)[1] * 1e3

Pp128 = -(-P // 128) * 128
Pp256 = -(-P // 256) * 256
Pp512 = -(-P // 512) * 512
print(f"E={E} K={K} P={P} Pp128={Pp128}")
for tile, Pp in ((128, Pp128), (256, Pp256), (512, Pp512)):
    for it in (1, 4, 15):
        t = timeit(it, tile, Pp)
        print(f"tile={tile:4d} n_iters={it:3d}: {t:8.3f} ms "
              f"({t / (Pp // tile):.4f} ms/tile)", flush=True)
