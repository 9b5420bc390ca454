"""Bilinear patch sampling vs a per-pixel numpy oracle
(semantics of src/kernels/optimize.cu:125-170)."""

import numpy as np
import jax.numpy as jnp

from flowonthego_tpu.ops.interp import sample_patches_bilinear


def bilinear_oracle(img_pad, mx, my, ps, padding):
    """Direct per-pixel bilinear sample at (mx + dx, my + dy) for
    dx, dy in [-ps/2, ps/2)."""
    C = img_pad.shape[2]
    out = np.zeros((ps, ps, C), np.float64)
    for r in range(ps):
        for c in range(ps):
            x = mx + c - ps // 2
            y = my + r - ps // 2
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            fx, fy = x - x0, y - y0
            xp, yp = x0 + padding, y0 + padding
            out[r, c] = (img_pad[yp, xp] * (1 - fx) * (1 - fy)
                         + img_pad[yp, xp + 1] * fx * (1 - fy)
                         + img_pad[yp + 1, xp] * (1 - fx) * fy
                         + img_pad[yp + 1, xp + 1] * fx * fy)
    return out


def test_bilinear_matches_oracle(rng):
    ps, pad = 8, 8
    img_pad = rng.standard_normal((40, 48, 3)).astype(np.float32)
    mids = [(12.0, 10.0), (12.3, 9.7), (15.99, 8.01), (10.5, 10.5)]
    mx = np.array([[m[0] for m in mids]], np.float32)
    my = np.array([[m[1] for m in mids]], np.float32)
    out = np.asarray(sample_patches_bilinear(jnp.asarray(img_pad),
                                             jnp.asarray(mx), jnp.asarray(my),
                                             ps, pad))
    for i, (x, y) in enumerate(mids):
        ref = bilinear_oracle(img_pad, x, y, ps, pad)
        np.testing.assert_allclose(out[0, i], ref, rtol=1e-4, atol=1e-4)


def test_integer_midpoint_is_direct_window(rng):
    ps, pad = 8, 8
    img_pad = rng.standard_normal((40, 40, 3)).astype(np.float32)
    mx = np.array([[10.0]], np.float32)
    my = np.array([[12.0]], np.float32)
    out = np.asarray(sample_patches_bilinear(jnp.asarray(img_pad),
                                             jnp.asarray(mx), jnp.asarray(my),
                                             ps, pad))
    ref = img_pad[12 + pad - ps // 2: 12 + pad + ps // 2,
                  10 + pad - ps // 2: 10 + pad + ps // 2]
    np.testing.assert_array_equal(out[0, 0], ref)


def test_matmul_gather_matches_dynamic_slice(rng):
    """The one-hot MXU gather must agree with vmapped dynamic_slice
    bit-for-bit, including the clamp at out-of-range starts."""
    import jax
    from flowonthego_tpu.ops.interp import gather_windows_matmul

    K = 9
    img_pad = jnp.asarray(rng.standard_normal((30, 26, 3)).astype(np.float32))
    Hp, Wp, C = img_pad.shape
    # In-range, edge, and out-of-range starts (negative and beyond).
    sy = jnp.asarray([0, 5, Hp - K, -3, Hp + 4, 12], jnp.int32)
    sx = jnp.asarray([0, 7, Wp - K, Wp + 2, -1, 3], jnp.int32)
    got = np.asarray(gather_windows_matmul(img_pad, sy, sx, K))

    def one(sy_, sx_):
        return jax.lax.dynamic_slice(img_pad, (sy_, sx_, 0), (K, K, C))
    ref = np.asarray(jax.vmap(one)(sy, sx))
    np.testing.assert_array_equal(got, ref)
