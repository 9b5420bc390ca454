import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, dataclasses
from flowonthego_tpu.config import operating_point, pad_to_divisible
from flowonthego_tpu.io.images import load_image
from flowonthego_tpu.models import dis_flow as df
from flowonthego_tpu.ops.pyramid import build_pyramid
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops import dis as dis_mod, densify as densify_mod, variational as var_mod

A = load_image("/root/reference/images/alley_1/frame_0001.png")
B = load_image("/root/reference/images/alley_1/frame_0002.png")
h, w = A.shape[:2]
cfg = dataclasses.replace(operating_point(3, width=w), finest_scale=2)
pt, pb, pl, pr = pad_to_divisible(w, h, cfg.coarsest_scale)
I0 = jnp.asarray(np.pad(A, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
I1 = jnp.asarray(np.pad(B, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
H, W = I0.shape[0], I0.shape[1]

def ck(x, tag):
    jax.block_until_ready(x); print("done:", tag, flush=True)

n_levels = cfg.coarsest_scale + 1
pyr0 = build_pyramid(I0, n_levels, cfg.padding, start_level=cfg.finest_scale)
pyr1 = build_pyramid(I1, n_levels, cfg.padding, start_level=cfg.finest_scale)
ck([l.image for l in pyr0 if l is not None], "pyramids")

flow = None
for sl in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
    w_sl, h_sl = W >> sl, H >> sl
    grid = PatchGrid.create(cfg, w_sl, h_sl)
    lvl0, lvl1 = pyr0[sl], pyr1[sl]
    t, gx, gy, Hs = extract_templates_and_hessians(lvl0.image, lvl0.grad_x, lvl0.grad_y, grid, cfg)
    ck(t, f"extract sl={sl}")
    state = dis_mod.init_state(t, gx, gy, Hs, grid)
    if flow is not None:
        state = dis_mod.init_from_coarser(state, flow, grid)
    ck(state.p_cur, f"init sl={sl}")
    state = dis_mod.optimize(state, lvl1.image, grid, cfg)
    ck(state.p_cur, f"optimize sl={sl}")
    flow = densify_mod.densify(state, grid, cfg)
    ck(flow, f"densify sl={sl}")
    p = cfg.padding
    im1 = lvl0.image[p:p+h_sl, p:p+w_sl, :]
    im2 = lvl1.image[p:p+h_sl, p:p+w_sl, :]
    if cfg.use_var_ref:
        flow = var_mod.variational_refine_auto(flow, im1, im2, cfg, sl)
        ck(flow, f"varref sl={sl}")
print("ALL OK")
