"""Generate a synthetic video sequence as PNG frames for end-to-end
streaming measurements (tools/flow_stream.py).

The reference's bundled data tops out at 1024x436 (Sintel alley_1) and a
single 1920x1080 still; its 4K numbers were measured on video the repo
does not ship (docs/index.md:173-175).  This writes an N-frame 4K (or any
size) sequence: a smooth low-frequency pattern with a constant-velocity
crop walk, so consecutive pairs have a known translational flow and DIS
tracks it the way it tracks real video.

Usage:
    python tools/make_synth_seq.py /tmp/seq4k --frames 17 --width 3840 --height 2160
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smooth_field(rng, h, w, c=3, waves=8, amp=26.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, c), np.float32)
    for _ in range(waves):
        fx, fy = rng.uniform(1.0, 9.0, 2)
        ph = rng.uniform(0, 2 * np.pi, c).astype(np.float32)
        phase = (2 * np.pi * (fx * xx / w + fy * yy / h))[..., None]
        img += np.sin(phase + ph).astype(np.float32) * np.float32(amp)
    return np.clip(img + 128.0, 0, 255)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--vx", type=float, default=3.0, help="px/frame motion")
    ap.add_argument("--vy", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from flowonthego_tpu.io.images import save_image

    rng = np.random.default_rng(args.seed)
    mx = int(abs(args.vx) * args.frames) + 1
    my = int(abs(args.vy) * args.frames) + 1
    base = smooth_field(rng, args.height + my, args.width + mx)
    os.makedirs(args.out_dir, exist_ok=True)
    for t in range(args.frames):
        dy = int(round(abs(args.vy) * t))
        dx = int(round(abs(args.vx) * t))
        frame = base[dy:dy + args.height, dx:dx + args.width]
        save_image(os.path.join(args.out_dir, f"frame_{t:04d}.png"), frame)
        print(f"frame_{t:04d}.png  ({args.width}x{args.height}, "
              f"shift {dx},{dy})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
