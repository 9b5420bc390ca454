"""Streamed-video demo: dense flow over the 50-frame Sintel alley_1 clip.

Mirrors the reference's headline use case (realtime flow on streamed
video, docs/index.md:15-31) with the TPU-native stack: native threaded
frame decode -> device-resident pipeline -> flow warm-started from the
previous pair (oflow.cpp:268-271 initflow chaining).

    python examples/stream_alley.py [--save-dir OUT] [--frames N]

NOTE: over the tunneled dev TPU, per-frame host<->device transfers
dominate wall time (the link moves a few MB/s and misbehaves with deep
async queues); the meaningful streamed-throughput measurement on that
setup is the batched chained bench (bench.py / README).  On local TPU
hardware this driver streams at the device rate.
"""

import argparse
import glob
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--save-dir", default=None)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--op-point", type=int, default=2)
    ap.add_argument("--no-fetch", action="store_true",
                    help="keep flows on device (true device streaming rate; "
                         "host transfer dominates over slow tunnels)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/fot_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from flowonthego_tpu.config import operating_point, pad_to_divisible
    from flowonthego_tpu.io.native import FrameStream, write_flo_native
    from flowonthego_tpu.parallel import stream_flow

    paths = sorted(glob.glob("/root/reference/images/alley_1/frame_*.png"))
    paths = paths[:args.frames]
    print(f"streaming {len(paths)} frames")

    first = None
    stream = FrameStream(paths, n_threads=2)

    # pad every frame identically so the jit traces once
    probe = next(iter(FrameStream(paths[:1])))
    h, w = probe.shape[:2]
    cfg = operating_point(args.op_point, width=w)
    pt, pb, pl, pr = pad_to_divisible(w, h, cfg.coarsest_scale)

    def padded_frames():
        for frame in stream:
            yield np.pad(frame, ((pt, pb), (pl, pr), (0, 0)), mode="edge")

    n = 0
    t0 = None
    last = None
    for flow in stream_flow(padded_frames(), cfg, fetch=not args.no_fetch):
        if t0 is None:
            t0 = time.perf_counter()   # skip compile in rate measurement
        n += 1
        last = flow
        if args.save_dir and not args.no_fetch:
            out = flow[pt:pt + h, pl:pl + w]
            write_flo_native(f"{args.save_dir}/flow_{n:04d}.flo", out)
    if args.no_fetch:
        _ = float(np.asarray(last).sum())   # sync once at the end
    dt = time.perf_counter() - t0
    mode = ("device-resident" if args.no_fetch
            else "includes full-flow host fetch per frame")
    print(f"{n} flows; steady-state {dt / max(n - 1, 1) * 1e3:.2f} ms/frame "
          f"({(n - 1) / dt:.1f} fps) [{mode}]")


if __name__ == "__main__":
    main()
