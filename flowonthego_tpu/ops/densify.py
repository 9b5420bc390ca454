"""Patch-to-dense flow aggregation (densification) — TPU-native overlap-add.

The reference scatters every patch pixel with atomicAdd into weight/flow
accumulators (/root/reference/src/kernels/densify.cu:54-89).  On TPU we
exploit that patch origins are *static* (integer grid midpoints) and that
patches whose grid indices are congruent mod r = ceil(ps/steps) never
overlap: the scatter becomes r^2 dense overlap-add passes, each a pure
reshape + pad + add — no scatter, no atomics, bit-deterministic.

Per-pixel weight (densify.cu:75-78):
    absw = 1 / sum_c max(min_errval, cost_px[c])
accumulating (absw, absw * u, absw * v), then normalize where the weight
is positive (kernelNormalizeFlow, densify.cu:92-103).

Boundary semantics: contributions outside the image are dropped via the
padded accumulator margin (proper 2D clipping; the reference checks only
the flattened index, densify.cu:73, which wraps columns at row ends — a
1-2 px border artifact we do not reproduce).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DISConfig
from .dis import PatchState
from .patches import PatchGrid


def densify(state: PatchState, grid: PatchGrid, cfg: DISConfig) -> jax.Array:
    """Aggregate per-patch flow into a dense [H, W, 2] field."""
    ps, st = grid.patch_size, grid.steps
    n_h, n_w, h, w = grid.n_h, grid.n_w, grid.height, grid.width
    r = -(-ps // st)          # patches r apart in grid never overlap
    R = r * st                # cell pitch of one parity group
    margin = ps + R           # generous static margin, cropped at the end

    # Per-pixel contributions: [n_h, n_w, ps, ps, 3] = (absw, absw*u, absw*v)
    clamped = jnp.maximum(state.cost_px, cfg.min_errval)
    absw = 1.0 / clamped.sum(axis=-1)                     # [n_h, n_w, ps, ps]
    u = state.p_cur[..., 0][..., None, None]
    v = state.p_cur[..., 1][..., None, None]
    contrib = jnp.stack([absw, absw * u, absw * v], axis=-1)

    acc = jnp.zeros((h + 2 * margin, w + 2 * margin, 3), contrib.dtype)
    for a in range(r):          # parity group over grid rows
        for b in range(r):      # parity group over grid cols
            blocks = contrib[a::r, b::r]          # [g_h, g_w, ps, ps, 3]
            g_h, g_w = blocks.shape[0], blocks.shape[1]
            # Place each ps x ps block at the top-left of its R x R cell.
            blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, R - ps),
                                      (0, R - ps), (0, 0)))
            canvas = blocks.transpose(0, 2, 1, 3, 4).reshape(
                g_h * R, g_w * R, 3)
            top = margin + grid.offset_h - ps // 2 + a * st
            left = margin + grid.offset_w - ps // 2 + b * st
            assert top >= 0 and left >= 0
            assert top + g_h * R <= h + 2 * margin
            assert left + g_w * R <= w + 2 * margin
            acc = acc.at[top:top + g_h * R, left:left + g_w * R, :].add(canvas)

    acc = acc[margin:margin + h, margin:margin + w, :]
    weight = acc[..., 0:1]
    flow = jnp.where(weight > 0, acc[..., 1:3] / weight, 0.0)
    return flow
