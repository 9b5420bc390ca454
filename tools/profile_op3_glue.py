"""Decompose op-3 scale-1 optimize() into kernel vs glue components."""
import sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, ".")
from flowonthego_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from flowonthego_tpu.config import operating_point
from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops.interp import (use_matmul_gather, gather_windows,
                                        _onehot_flops)
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops.pyramid import build_pyramid

W, H = 1024, 448
cfg = operating_point(3, width=W)
sl = cfg.finest_scale
w_sl, h_sl = W >> sl, H >> sl
grid = PatchGrid.create(cfg, w_sl, h_sl)
ps = grid.patch_size
K = ps + 1
print(f"scale {sl}: {w_sl}x{h_sl}, {grid.n_patches} patches, ps={ps}")

rng = np.random.default_rng(0)
I0 = jnp.asarray(rng.random((H, W, 3), np.float32) * 255)
I1 = jnp.asarray(rng.random((H, W, 3), np.float32) * 255)
pyr0 = build_pyramid(I0, cfg.coarsest_scale + 1, cfg.padding)
pyr1 = build_pyramid(I1, cfg.coarsest_scale + 1, cfg.padding)
lvl0, lvl1 = pyr0[sl], pyr1[sl]
print("padded level:", lvl1.image.shape,
      "matmul gather:", use_matmul_gather(grid.n_patches, K, lvl1.image.shape),
      f"flops {_onehot_flops(grid.n_patches, K, lvl1.image.shape)/1e9:.1f}G")

tmpl, gx, gy, Hs = extract_templates_and_hessians(
    lvl0.image, lvl0.grad_x, lvl0.grad_y, grid, cfg)
state = dis_mod.init_state(tmpl, gx, gy, Hs, grid)

def chain(fn, args, n=16, trials=3):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = fn(*(x + acc * 1e-20 for x in a))
            return acc + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    float(chained(*args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append((time.perf_counter() - t0) / n)
    return sorted(ts)[1] * 1e3

# 1. win1 gather alone (current path)
mid = state.mid_org
def win_gather(img):
    win, rx, ry = gather_windows(img, mid[..., 0], mid[..., 1], ps, grid.padding)
    return jnp.sum(win)
print(f"win1 gather (current): {chain(win_gather, (lvl1.image,)):8.3f} ms", flush=True)

# 2. full optimize
def opt(img):
    return dis_mod.optimize(state, img, grid, cfg).p_cur
print(f"optimize total:        {chain(opt, (lvl1.image,)):8.3f} ms", flush=True)

# 3. single-slice gather: out[p] = img[sy[p]:sy[p]+K, sxC[p]:sxC[p]+K*C]
Hp, Wp, C = lvl1.image.shape
fx = jnp.floor(mid[..., 0]); fy = jnp.floor(mid[..., 1])
sy = (fy.astype(jnp.int32) + (grid.padding - ps // 2)).reshape(-1)
sx = (fx.astype(jnp.int32) + (grid.padding - ps // 2)).reshape(-1)
sy = jnp.clip(sy, 0, Hp - K); sx = jnp.clip(sx, 0, Wp - K)
def gather_xla(img):
    flat = img.reshape(Hp, Wp * C)
    idx = jnp.stack([sy, sx * C], axis=-1)
    out = jax.lax.gather(
        flat, idx,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1), operand_batching_dims=(),
            start_indices_batching_dims=()),
        slice_sizes=(K, K * C), mode=jax.lax.GatherScatterMode.CLIP)
    return jnp.sum(out)
print(f"win1 via ONE xla gather: {chain(gather_xla, (lvl1.image,)):8.3f} ms", flush=True)

# 4. row-take then col-take
def gather_take(img):
    flat = img.reshape(Hp, Wp * C)
    rows = jnp.take(flat, (sy[:, None] + jnp.arange(K)[None, :]).reshape(-1),
                    axis=0).reshape(-1, K, Wp * C)
    cols = (sx * C)[:, None, None] + jnp.arange(K * C)[None, None, :]
    out = jnp.take_along_axis(rows, jnp.broadcast_to(cols, (rows.shape[0], K, K * C)), axis=2)
    return jnp.sum(out)
print(f"win1 via row+col take:  {chain(gather_take, (lvl1.image,)):8.3f} ms", flush=True)
