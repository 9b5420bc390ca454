"""Device smoke harness: compile + run every CLI contract on real silicon.

The round-3 op-3 escape showed that interpret-mode tests and CPU-mesh
dryruns cannot catch device-only failures (Mosaic compile hangs, runtime
kernel faults, pathological XLA schedules).  This tool runs each
operating point of the reference CLI contract
(/root/reference/src/run_dense.cpp:181-209) — plus the backend branches
the auto-resolvers can pick — as a SEPARATE SUBPROCESS with a wall-clock
timeout, so one hung/faulted case cannot take down the rest of the sweep
(a wedged TPU worker otherwise blocks every later program for minutes).

Usage:
    python tools/device_smoke.py                # the 4 op points
    python tools/device_smoke.py --full         # + backend matrix
    python tools/device_smoke.py --timeout 420  # per-case seconds

Exit status is the number of failed cases.  Each case prints one line:
    PASS op3            34.2s  mean=0.8123
    FAIL op4            TIMEOUT after 420s
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CASE_SRC = r"""
import sys, time
sys.path.insert(0, {repo!r})
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from flowonthego_tpu.config import operating_point, pad_to_divisible
from flowonthego_tpu.models.dis_flow import (dis_flow_padded,
                                             upsample_flow_to_full)
from flowonthego_tpu.io.images import load_image

op = {op}
A = load_image("/root/reference/images/alley_1/frame_0001.png")
B = load_image("/root/reference/images/alley_1/frame_0002.png")
h, w = A.shape[:2]
cfg = operating_point(op, width=w)
cfg = dataclasses.replace(cfg, **{overrides})
pt, pb, pl, pr = pad_to_divisible(w, h, cfg.coarsest_scale)
An = np.pad(A, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
Bn = np.pad(B, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
Hn, Wn = An.shape[:2]

def step(I0f, I1f):
    flow = dis_flow_padded(I0f.reshape(Hn, Wn, 3), I1f.reshape(Hn, Wn, 3),
                           cfg)
    return upsample_flow_to_full(flow, cfg, Hn, Wn)

I0 = jnp.asarray(An.reshape(Hn, -1))
I1 = jnp.asarray(Bn.reshape(Hn, -1))
out = jax.jit(step)(I0, I1)
# Fetch a real value: on the tunneled axon backend block_until_ready can
# return even though the program wedged/faulted — only a device-to-host
# read proves the program ran (round-4 finding).
val = float(jnp.mean(jnp.abs(out)))
assert np.isfinite(val), f"non-finite output mean {{val}}"
print(f"MEAN {{val:.6f}}", flush=True)
"""


def run_case(name: str, op: int, overrides: dict, timeout: float,
             cache_dir: str | None) -> bool:
    src = _CASE_SRC.format(repo=REPO, op=op, overrides=overrides)
    env = dict(os.environ)
    if cache_dir:
        env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    t0 = time.time()
    try:
        proc = subprocess.run([sys.executable, "-c", src], env=env,
                              capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"FAIL {name:<18} TIMEOUT after {timeout:.0f}s", flush=True)
        return False
    dt = time.time() - t0
    mean = next((ln.split()[1] for ln in proc.stdout.splitlines()
                 if ln.startswith("MEAN ")), None)
    if proc.returncode == 0 and mean is not None:
        print(f"PASS {name:<18} {dt:6.1f}s  mean={mean}", flush=True)
        return True
    tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
    print(f"FAIL {name:<18} rc={proc.returncode} {tail[0][:120] if tail else ''}",
          flush=True)
    return False


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--full", action="store_true",
                    help="also sweep forced backend branches")
    ap.add_argument("--timeout", type=float, default=480.0,
                    help="per-case wall-clock budget (s)")
    ap.add_argument("--cache", default="/tmp/fot_jax_cache",
                    help="persistent compile cache dir ('' to disable)")
    ap.add_argument("--ops", default="1,2,3,4",
                    help="comma-separated operating points")
    args = ap.parse_args()

    cases: list[tuple[str, int, dict]] = [
        (f"op{op}", op, {}) for op in
        (int(x) for x in args.ops.split(","))
    ]
    if args.full:
        cases += [
            ("op2-xla-xla", 2, {"varref_backend": "xla",
                                "gn_backend": "xla"}),
            ("op2-bf16", 2, {"dtype": "bfloat16"}),
            ("op3-xla-varref", 3, {"varref_backend": "xla"}),
            ("op2-fbcon", 2, {"use_fb_consistency": True}),
        ]

    failures = 0
    for name, op, overrides in cases:
        ok = run_case(name, op, overrides, args.timeout, args.cache or None)
        failures += 0 if ok else 1
    print(f"{len(cases) - failures}/{len(cases)} cases passed", flush=True)
    return failures


if __name__ == "__main__":
    sys.exit(main())
