"""Spatial (row-strip) sharding of a single frame pair across chips.

Design (SURVEY.md §2.4 / §7.5 — replicate-coarse, shard-fine): at the
reference's operating points the DIS + variational work runs at
1/2^finest resolution (e.g. 120x68 for 4K at op 2) — sharding *that*
across chips would be pure overhead.  All the real full-resolution work
is (a) the pyramid downsample chain from level 0 to the finest processed
level and (b) the final flow upsample.  So:

  1. each shard holds a row strip of the full-res frames and downsamples
     locally (2x2 average pooling needs no halo when the strip height is
     divisible by 2^finest_scale);
  2. one small ``all_gather`` (the only collective, a few hundred KB)
     replicates the finest-level images; the DIS scale loop + variational
     refinement run replicated on every chip;
  3. each shard computes only its own row strip of the full-res bilinear
     flow upsample (ops/resize.resize_rows_strip with a traced row
     offset).

For pipelines that process fine scales at full resolution
(finest_scale == 0 on large frames) the halo-exchange primitives in
parallel/halo.py extend stencil stages across strips; wiring the DIS
patch stage itself over halos is future work and documented as such.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import DISConfig
from ..models.dis_flow import dis_flow_padded
from ..ops.pyramid import downsample_half
from ..ops.resize import resize_rows_strip
from .mesh import SPACE_AXIS


def make_spatial_flow(mesh: Mesh, cfg: DISConfig, H: int, W: int):
    """Build a jitted spatially-sharded flow fn for padded [H, W, C] frames.

    Returns flow at full resolution [H, W, 2], row-sharded over 'space'.
    H must be divisible by n_space * 2^finest_scale.
    """
    n_space = mesh.shape[SPACE_AXIS]
    fs = cfg.finest_scale
    # the gathered coarse pipeline needs H % 2^cs == 0; local downsampling
    # to the finest level needs (H / n_space) % 2^fs == 0
    if H % (2 ** cfg.coarsest_scale) != 0 or H % n_space != 0 \
            or (H // n_space) % (2 ** fs) != 0:
        raise ValueError(
            f"H={H} must satisfy H % 2^{cfg.coarsest_scale} == 0 and "
            f"(H/{n_space}) % 2^{fs} == 0")
    h_local = H // n_space
    scale = float(2 ** fs)
    # The replicated coarse pipeline runs on the finest-level image with
    # re-indexed scales; level_offset restores the true level numbers for
    # the per-level variational iteration count.
    small_cfg = dataclasses.replace(
        cfg, coarsest_scale=cfg.coarsest_scale - fs, finest_scale=0)

    def worker(i0, i1):
        # i0, i1: [h_local, W, C] local strips
        a, b = i0, i1
        for _ in range(fs):
            a = downsample_half(a)
            b = downsample_half(b)
        a_full = lax.all_gather(a, SPACE_AXIS, axis=0, tiled=True)
        b_full = lax.all_gather(b, SPACE_AXIS, axis=0, tiled=True)

        flow_small = dis_flow_padded(a_full, b_full, small_cfg,
                                     level_offset=fs)
        if fs == 0:
            return flow_small[lax.axis_index(SPACE_AXIS) * h_local
                              + jnp.arange(h_local)]
        row_start = lax.axis_index(SPACE_AXIS) * h_local
        return resize_rows_strip(flow_small * scale, scale, scale,
                                 row_start, h_local, W)

    # check_vma=False: the replicated coarse stage mixes gathered (varying-
    # typed) tensors with constant grid state inside lax.fori_loop carries;
    # values are shard-identical by construction (verified by the
    # sharded-vs-single equivalence test).
    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(SPACE_AXIS), P(SPACE_AXIS)),
        out_specs=P(SPACE_AXIS), check_vma=False)

    return jax.jit(sharded)


def make_batch_spatial_flow(mesh: Mesh, cfg: DISConfig, H: int, W: int):
    """Full 2D-mesh training-style step: frame batch over 'data', rows
    over 'space'.  Input [B, H, W, C]; output [B, H, W, 2]."""
    spatial = make_spatial_flow(mesh, cfg, H, W)

    def fn(I0, I1):
        return jax.vmap(spatial)(I0, I1)

    from .mesh import DATA_AXIS
    in_sh = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    out_sh = NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return jax.jit(fn, in_shardings=(in_sh, in_sh), out_shardings=out_sh)
