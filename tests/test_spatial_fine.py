"""Halo-coupled row-sharded DIS vs the unsharded pipeline.

The equivalence bar is tight (atol 1e-3): extraction halos, strip
sampling offsets, and the densification boundary fold must reproduce the
single-device math, not just approximate it (SURVEY.md hard parts 1-2).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowonthego_tpu.config import DISConfig
from flowonthego_tpu.models.dis_flow import dis_flow_padded, upsample_flow_to_full
from flowonthego_tpu.parallel import make_mesh
from flowonthego_tpu.parallel.spatial_fine import (make_fine_spatial_flow,
                                                   sharded_scale_levels,
                                                   displacement_bound)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 (virtual) devices")


def _smooth(rng, h, w):
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(
        rng.standard_normal((h, w, 3)).astype(np.float32),
        sigma=(3, 3, 0)) * 120 + 128


def test_displacement_bound_and_level_selection():
    cfg = DISConfig(patch_size=8, coarsest_scale=4, finest_scale=1)
    assert displacement_bound(cfg, 4) == 4.0
    assert displacement_bound(cfg, 1) == 32.0
    # H=512, 4 shards: strips are 128 rows; scale1 strip=64 needs halo 40
    levels = sharded_scale_levels(cfg, 512, 4)
    assert 1 in levels


@pytest.mark.parametrize("use_var_ref", [False, True])
def test_fine_sharded_matches_single(rng, use_var_ref):
    cfg = DISConfig(patch_size=8, patch_stride=0.4, coarsest_scale=3,
                    finest_scale=1, grad_descent_iter=8,
                    use_var_ref=use_var_ref)
    mesh = make_mesh(n_data=1, n_space=4, devices=jax.devices()[:4])
    # var-ref adds halo slack, which needs taller strips to stay sharded
    H, W = (512, 64) if use_var_ref else (256, 64)
    assert 1 in sharded_scale_levels(cfg, H, 4)
    I0 = _smooth(rng, H, W)
    I1 = np.roll(np.roll(I0, 2, axis=1), 1, axis=0)

    fn = make_fine_spatial_flow(mesh, cfg, H, W)
    sharded = np.asarray(fn(jnp.asarray(I0), jnp.asarray(I1)))

    single = dis_flow_padded(jnp.asarray(I0), jnp.asarray(I1), cfg)
    full = np.asarray(upsample_flow_to_full(single, cfg, H, W))

    np.testing.assert_allclose(sharded, full, rtol=1e-3, atol=1e-3)


def test_fine_sharded_finest_zero(rng):
    """finest_scale=0: the full-resolution scale itself runs sharded."""
    cfg = DISConfig(patch_size=8, patch_stride=0.4, coarsest_scale=3,
                    finest_scale=0, grad_descent_iter=8, use_var_ref=False)
    mesh = make_mesh(n_data=1, n_space=4, devices=jax.devices()[:4])
    H, W = 256, 64
    assert 0 in sharded_scale_levels(cfg, H, 4)
    I0 = _smooth(rng, H, W)
    I1 = np.roll(I0, 2, axis=1)

    fn = make_fine_spatial_flow(mesh, cfg, H, W)
    sharded = np.asarray(fn(jnp.asarray(I0), jnp.asarray(I1)))
    single = np.asarray(dis_flow_padded(jnp.asarray(I0), jnp.asarray(I1),
                                        cfg))
    np.testing.assert_allclose(sharded, single, rtol=1e-3, atol=1e-3)
