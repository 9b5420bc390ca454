"""Input channel modes — parity with the reference's SELECTCHANNEL builds
(kroeger/CMakeLists.txt:42-64, kroeger/run_dense.cpp:136-147):

  3 = RGB (the GPU reference's only mode), 1 = intensity, 2 = gradient
  magnitude.  The whole pipeline is channel-count generic ([H, W, C]);
  these helpers produce the 1-channel variants.  Per-pixel densification
  weights degenerate to the reference's single-channel formula
  (1/max(minerr, cost), kroeger/patchgrid.cpp:254).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .pyramid import central_diff


def to_grayscale(img_bgr: jax.Array) -> jax.Array:
    """BGR [H, W, 3] -> intensity [H, W, 1] (ITU-R BT.601, cv::cvtColor)."""
    b, g, r = img_bgr[..., 0], img_bgr[..., 1], img_bgr[..., 2]
    return (0.114 * b + 0.587 * g + 0.299 * r)[..., None]


def to_gradient_magnitude(img_bgr: jax.Array) -> jax.Array:
    """SELECTCHANNEL=2: sqrt(dx^2 + dy^2) of the intensity image
    (kroeger/run_dense.cpp:138-147, central-difference gradients)."""
    gray = to_grayscale(img_bgr)
    gx, gy = central_diff(gray)
    return jnp.sqrt(gx * gx + gy * gy)


def prepare_input(img_bgr: jax.Array, mode: str) -> jax.Array:
    if mode in ("rgb", "3"):
        return img_bgr
    if mode in ("gray", "1"):
        return to_grayscale(img_bgr)
    if mode in ("gradmag", "2"):
        return to_gradient_magnitude(img_bgr)
    raise ValueError(f"unknown channel mode {mode!r}")
