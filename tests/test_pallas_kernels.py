"""Pallas kernel equivalence tests (interpret mode on CPU).

On-device compilation of these kernels is validated separately on TPU
(remote Mosaic compile is too slow for the CPU CI loop).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flowonthego_tpu.config import DISConfig
from flowonthego_tpu.ops import variational as var
from flowonthego_tpu.ops.pallas.varref_fused import variational_refine_fused


@pytest.mark.parametrize("level", [0, 3])
def test_fused_varref_matches_xla(rng, level):
    from scipy.ndimage import gaussian_filter
    h, w = 32, 48
    base = gaussian_filter(
        rng.standard_normal((h + 8, w + 8, 3)).astype(np.float32),
        sigma=(3, 3, 0)) * 120 + 128
    im1 = jnp.asarray(base[4:4 + h, 4:4 + w])
    im2 = jnp.asarray(base[4:4 + h, 3:3 + w])
    flow = jnp.asarray(
        0.3 * rng.standard_normal((h, w, 2)).astype(np.float32)
        + np.array([1.0, 0.0], np.float32))
    cfg = DISConfig()
    ref = np.asarray(var.variational_refine(flow, im1, im2, cfg, level))
    fused = np.asarray(variational_refine_fused(flow, im1, im2, cfg, level,
                                                interpret=True))
    np.testing.assert_allclose(fused, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(64, 96, 3), (34, 60, 3), (128, 128, 1)])
def test_pool2x2_matches_reduce_window(rng, shape):
    from flowonthego_tpu.ops.pallas.pool import pool2x2
    from flowonthego_tpu.ops.pyramid import downsample_half
    x = jnp.asarray(rng.random(shape).astype(np.float32) * 255)
    ref = np.asarray(downsample_half(x))
    got = np.asarray(pool2x2(x, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)
