import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp, dataclasses
from flowonthego_tpu.config import operating_point, pad_to_divisible
from flowonthego_tpu.io.images import load_image
from flowonthego_tpu.models.dis_flow import compute_flow

vb, gb = sys.argv[1], sys.argv[2]
A = load_image("/root/reference/images/alley_1/frame_0001.png")
B = load_image("/root/reference/images/alley_1/frame_0002.png")
h, w = A.shape[:2]
base = operating_point(3, width=w)
pt, pb, pl, pr = pad_to_divisible(w, h, base.coarsest_scale)
An = jnp.asarray(np.pad(A, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
Bn = jnp.asarray(np.pad(B, ((pt, pb), (pl, pr), (0,0)), mode="edge"))
cfg = dataclasses.replace(base, varref_backend=vb, gn_backend=gb)
out = compute_flow(An, Bn, cfg)
print(vb, gb, "OK", float(jnp.mean(jnp.abs(out))))
