import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, dataclasses, functools
from flowonthego_tpu.config import operating_point, pad_to_divisible
from flowonthego_tpu.io.images import load_image
from flowonthego_tpu.ops.pyramid import build_pyramid
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops import dis as dis_mod, densify as densify_mod, variational as var_mod

which = sys.argv[1]
A = load_image("/root/reference/images/alley_1/frame_0001.png")
B = load_image("/root/reference/images/alley_1/frame_0002.png")
h, w = A.shape[:2]
cfg = dataclasses.replace(operating_point(3, width=w), finest_scale=2)
pt, pb, pl, pr = pad_to_divisible(w, h, cfg.coarsest_scale)
I0 = jnp.asarray(np.pad(A, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
I1 = jnp.asarray(np.pad(B, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
H, W = I0.shape[0], I0.shape[1]
n_levels = cfg.coarsest_scale + 1

if which == "pyr":
    f = jax.jit(lambda a: [ (l.image, l.grad_x, l.grad_y) for l in build_pyramid(a, n_levels, cfg.padding, start_level=cfg.finest_scale) if l is not None])
    jax.block_until_ready(f(I0)); print("pyr jit OK", flush=True)
    sys.exit(0)

# eager pyramids as inputs
pyr0 = build_pyramid(I0, n_levels, cfg.padding, start_level=cfg.finest_scale)
pyr1 = build_pyramid(I1, n_levels, cfg.padding, start_level=cfg.finest_scale)
jax.block_until_ready(pyr0[2].image); print("eager pyramids built", flush=True)

sl = 2
w_sl, h_sl = W >> sl, H >> sl
grid = PatchGrid.create(cfg, w_sl, h_sl)
lvl0, lvl1 = pyr0[sl], pyr1[sl]
# coarse flow from eager run of scales 5..3
flow = None
for s in range(cfg.coarsest_scale, sl, -1):
    g = PatchGrid.create(cfg, W >> s, H >> s)
    t, gx, gy, Hs = extract_templates_and_hessians(pyr0[s].image, pyr0[s].grad_x, pyr0[s].grad_y, g, cfg)
    st = dis_mod.init_state(t, gx, gy, Hs, g)
    if flow is not None: st = dis_mod.init_from_coarser(st, flow, g)
    st = dis_mod.optimize(st, pyr1[s].image, g, cfg)
    flow = densify_mod.densify(st, g, cfg)
    p = cfg.padding
    flow = var_mod.variational_refine_auto(flow, pyr0[s].image[p:p+(H>>s), p:p+(W>>s)], pyr1[s].image[p:p+(H>>s), p:p+(W>>s)], cfg, s)
jax.block_until_ready(flow); print("coarse flow ready", flush=True)

def scale2_chain(im0, g0x, g0y, im1t, coarse):
    t, gx, gy, Hs = extract_templates_and_hessians(im0, g0x, g0y, grid, cfg)
    st = dis_mod.init_state(t, gx, gy, Hs, grid)
    st = dis_mod.init_from_coarser(st, coarse, grid)
    st = dis_mod.optimize(st, im1t, grid, cfg)
    fl = densify_mod.densify(st, grid, cfg)
    p = cfg.padding
    return var_mod.variational_refine_auto(fl, im0[p:p+h_sl, p:p+w_sl], im1t[p:p+h_sl, p:p+w_sl], cfg, sl)

if which == "scale2":
    f = jax.jit(scale2_chain)
    out = f(lvl0.image, lvl0.grad_x, lvl0.grad_y, lvl1.image, flow)
    jax.block_until_ready(out); print("scale2 jit OK", float(jnp.mean(jnp.abs(out))), flush=True)
