import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, dataclasses, functools
from flowonthego_tpu.config import operating_point, pad_to_divisible
from flowonthego_tpu.io.images import load_image
from flowonthego_tpu.models import dis_flow as df

which = sys.argv[1]
A = load_image("/root/reference/images/alley_1/frame_0001.png")
B = load_image("/root/reference/images/alley_1/frame_0002.png")
h, w = A.shape[:2]
cfg = dataclasses.replace(operating_point(3, width=w), finest_scale=2)
pt, pb, pl, pr = pad_to_divisible(w, h, cfg.coarsest_scale)
I0 = jnp.asarray(np.pad(A, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
I1 = jnp.asarray(np.pad(B, ((pt, pb), (pl, pr), (0,0)), mode="edge"))

fn = jax.jit(functools.partial(df.dis_flow_padded, cfg=cfg))
lowered = fn.lower(I0, I1)
print("lowered", flush=True)
compiled = lowered.compile()
print("compiled", flush=True)
if which == "run":
    out = compiled(I0, I1)
    jax.block_until_ready(out)
    print("ran OK", float(jnp.mean(jnp.abs(out))))
