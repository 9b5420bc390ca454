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


def test_pool2x2_flat_ragged_width_and_bias(rng):
    """Ragged (non-multiple-of-block) flat widths are masked in-kernel
    (no host-visible pad/slice), and the fused ingest bias is
    bit-identical to adding the scalar before pooling."""
    from flowonthego_tpu.ops.pallas.pool import pool2x2_flat, _BW
    # flat width: one full + one ragged block, whatever _BW is
    h, C = 40, 3
    w = 2 * ((_BW + _BW // 2) // (2 * C))
    assert (w * C) % _BW != 0 and w * C > _BW
    x = jnp.asarray(rng.random((h, w * C)).astype(np.float32) * 255)
    ref = np.asarray(
        (x.reshape(h // 2, 2, w // 2, 2, C).mean(axis=(1, 3)))
        .reshape(h // 2, (w // 2) * C))
    got = np.asarray(pool2x2_flat(x, C, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-4)

    bias = jnp.float32(3.25)
    with_bias = np.asarray(pool2x2_flat(x, C, bias=bias, interpret=True))
    plain = np.asarray(pool2x2_flat(x + bias, C, interpret=True))
    np.testing.assert_array_equal(with_bias, plain)


def test_pool2x2_flat_uint8_ingest(rng):
    """uint8 frames pool bit-identically to their fp32 conversion (the
    in-kernel upcast; 0..255 integers are exact in fp32)."""
    from flowonthego_tpu.ops.pallas.pool import pool2x2_flat
    h, w, C = 40, 322, 3
    u8 = (rng.random((h, w * C)) * 255).astype(np.uint8)
    got = np.asarray(pool2x2_flat(jnp.asarray(u8), C, interpret=True))
    ref = np.asarray(pool2x2_flat(jnp.asarray(u8, jnp.float32), C,
                                  interpret=True))
    np.testing.assert_array_equal(got, ref)
    # with the fused ingest bias on top
    gb = np.asarray(pool2x2_flat(jnp.asarray(u8), C,
                                 bias=jnp.float32(1.5), interpret=True))
    rb = np.asarray(pool2x2_flat(jnp.asarray(u8, jnp.float32), C,
                                 bias=jnp.float32(1.5), interpret=True))
    np.testing.assert_array_equal(gb, rb)


def test_build_pyramid_uint8(rng):
    """build_pyramid on uint8 equals build_pyramid on its float32 cast,
    with and without a start_level (which routes the upcast through the
    first pool's read)."""
    from flowonthego_tpu.ops.pyramid import build_pyramid
    u8 = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    for start in (0, 1):
        pu = build_pyramid(jnp.asarray(u8), 3, 4, start_level=start)
        pf = build_pyramid(jnp.asarray(u8, jnp.float32), 3, 4,
                           start_level=start)
        for lu, lf in zip(pu, pf):
            np.testing.assert_array_equal(
                np.asarray(lu.image, np.float32), np.asarray(lf.image))


def test_build_pyramid_ingest_bias(rng):
    """build_pyramid(img, ingest_bias=b) == build_pyramid(img + b) on the
    processed levels (start_level and coarser)."""
    import jax
    from flowonthego_tpu.ops.pyramid import build_pyramid
    img = jnp.asarray(rng.random((32, 48, 3)).astype(np.float32) * 255)
    b = jnp.float32(0.125)
    fused = build_pyramid(img, 3, padding=4, start_level=1, ingest_bias=b)
    plain = build_pyramid(img + b, 3, padding=4, start_level=1)
    for lvl in range(1, 3):
        for a, r in zip(fused[lvl], plain[lvl]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=1e-6, atol=1e-4)
    with pytest.raises(ValueError):
        build_pyramid(img, 3, padding=4, start_level=0, ingest_bias=b)


@pytest.mark.parametrize("level,channels", [(0, 3), (1, 3), (0, 1)])
def test_tiled_varref_matches_xla(rng, level, channels):
    """Halo-tiled refine (fields past the single-block VMEM ceiling) ==
    the XLA stencil form, with tiles forced small so the grid is real
    (multiple row AND column tiles, image edges inside and outside
    tiles)."""
    from scipy.ndimage import gaussian_filter
    from flowonthego_tpu.ops.pallas.varref_fused import \
        variational_refine_tiled
    h, w = 61, 83
    base = gaussian_filter(
        rng.standard_normal((h + 8, w + 8, channels)).astype(np.float32),
        sigma=(3, 3, 0)) * 120 + 128
    im1 = jnp.asarray(base[4:4 + h, 4:4 + w])
    im2 = jnp.asarray(base[4:4 + h, 3:3 + w])
    flow = jnp.asarray(
        0.3 * rng.standard_normal((h, w, 2)).astype(np.float32)
        + np.array([1.0, 0.0], np.float32))
    cfg = DISConfig()
    ref = np.asarray(var.variational_refine(flow, im1, im2, cfg, level))
    tiled = np.asarray(variational_refine_tiled(
        flow, im1, im2, cfg, level, interpret=True,
        tile_rows=24, tile_cols=32))
    np.testing.assert_allclose(tiled, ref, rtol=1e-4, atol=1e-5)


def test_varref_backend_resolver():
    from flowonthego_tpu.ops.variational import varref_backend_for
    cfg = DISConfig()
    # beyond the single-block ceiling -> tiled on TPU, xla on CPU
    import jax
    big = varref_backend_for(cfg, 436, 1024, level=0)
    assert big == ("tiled" if jax.default_backend() == "tpu" else "xla")
    small = varref_backend_for(cfg, 68, 120, level=0)
    assert small == ("fused" if jax.default_backend() == "tpu" else "xla")
    # wide-but-small fields (op-3 scale 2: 256x112) must NOT take the
    # single-block kernel: its Mosaic compile hangs past ~128 lanes
    wide = varref_backend_for(cfg, 112, 256, level=2)
    assert wide == ("tiled" if jax.default_backend() == "tpu" else "xla")
