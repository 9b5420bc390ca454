"""Pyramid ops vs numpy oracles (semantics of src/kernels/pyramid.cpp)."""

import numpy as np
import jax.numpy as jnp

from flowonthego_tpu.ops.pyramid import (build_pyramid, central_diff,
                                         downsample_half, pad_replicate,
                                         pad_constant)


def test_downsample_is_2x2_mean(rng):
    img = rng.standard_normal((8, 12, 3)).astype(np.float32)
    out = np.asarray(downsample_half(jnp.asarray(img)))
    expect = img.reshape(4, 2, 6, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_central_diff_matches_loop(rng):
    img = rng.standard_normal((6, 7, 3)).astype(np.float32)
    gx, gy = central_diff(jnp.asarray(img))
    gx, gy = np.asarray(gx), np.asarray(gy)
    h, w, _ = img.shape
    for y in range(h):
        for x in range(w):
            xm, xp = max(x - 1, 0), min(x + 1, w - 1)
            ym, yp = max(y - 1, 0), min(y + 1, h - 1)
            np.testing.assert_allclose(gx[y, x], img[y, xp] - img[y, xm],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(gy[y, x], img[yp, x] - img[ym, x],
                                       rtol=1e-5, atol=1e-6)


def test_padding_modes(rng):
    img = rng.standard_normal((4, 5, 2)).astype(np.float32)
    rep = np.asarray(pad_replicate(jnp.asarray(img), 3))
    assert rep.shape == (10, 11, 2)
    np.testing.assert_array_equal(rep[0, 0], img[0, 0])
    np.testing.assert_array_equal(rep[-1, -1], img[-1, -1])
    np.testing.assert_array_equal(rep[3:7, 3:8], img)

    zer = np.asarray(pad_constant(jnp.asarray(img), 2))
    assert zer.shape == (8, 9, 2)
    assert (zer[:2] == 0).all() and (zer[:, :2] == 0).all()
    np.testing.assert_array_equal(zer[2:6, 2:7], img)


def test_build_pyramid_levels(rng):
    img = rng.standard_normal((16, 32, 3)).astype(np.float32)
    pyr = build_pyramid(jnp.asarray(img), n_levels=3, padding=4)
    assert len(pyr) == 3
    assert pyr[0].image.shape == (16 + 8, 32 + 8, 3)
    assert pyr[1].image.shape == (8 + 8, 16 + 8, 3)
    assert pyr[2].image.shape == (4 + 8, 8 + 8, 3)
    # level 1 is the 2x2 mean of level 0; its gradients are zero-padded
    lvl1 = np.asarray(pyr[1].image)[4:-4, 4:-4]
    np.testing.assert_allclose(lvl1, img.reshape(8, 2, 16, 2, 3).mean((1, 3)),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(pyr[1].grad_x)[:4] == 0).all()
