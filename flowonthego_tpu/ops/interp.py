"""Bilinear patch sampling from the target image.

TPU equivalent of the interpolation step of kernelInterpolateAndComputeErr
(/root/reference/src/kernels/optimize.cu:125-170): for each patch, the four
bilinear weights are constant over the patch (pure translation), so the
sampled patch is a blend of four integer-shifted windows:

    value[r, c] = w3*W[r, c] + w2*W[r, c+1] + w1*W[r+1, c] + w0*W[r+1, c+1]

where W is the (ps+1)x(ps+1) window whose top-left sits at
(floor(my) - ps/2, floor(mx) - ps/2) and (rx, ry) = mid - floor(mid),
w0 = rx*ry, w1 = (1-rx)*ry, w2 = rx*(1-ry), w3 = (1-rx)*(1-ry)
(optimize.cu:133-143; the ceil(+1e-5)/floor index pair reduces to this).

The dynamic (ps+1)^2 window gather is formulated as two one-hot MXU
matmuls (row select then column select) — XLA lowers a vmapped
``lax.dynamic_slice`` to a *sequential* per-patch loop of tiny
dynamic-update-slices on TPU (measured ~1 us/patch/iteration, the single
largest cost in the whole pipeline), whereas the one-hot contraction is a
dense batched matmul the MXU eats for breakfast.  The dynamic-slice form
is kept as a fallback for very large levels where the one-hot operands
would not pay for themselves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Gate by a TIME model, not operand bytes: XLA fuses the iota-compare
# one-hot generation into the MXU contraction, so the select matrices
# never materialize in HBM — the one-hot path costs its matmul FLOPs
# (measured ~40 TFLOP/s effective at fp32-HIGHEST incl. the row-gathered
# intermediate's traffic), while the vmapped dynamic_slice fallback
# serializes at ~2 us/patch.  The old 256 MB byte cap mis-routed the
# op-3/op-4 fine scales (12.8k-51k patches) onto the serial path: at op-3
# scale 1 the measured gather was 25.3 ms serial vs 6.6 ms one-hot.
_ONEHOT_EFF_FLOPS = 40e12
_SLICE_SECS_PER_PATCH = 2e-6
# The row-gathered intermediate G = [P, K, Wp*C] DOES materialize
# between the two stages; chunk the patch axis to bound it.
_ONEHOT_CHUNK_BYTES = 256 * 1024 * 1024


def _onehot_flops(n_patches: int, window: int, img_shape) -> float:
    Hp, Wp, C = img_shape
    rows = 2.0 * n_patches * window * Hp * Wp * C
    cols = 2.0 * n_patches * window * Wp * C * window * C
    return rows + cols


def use_matmul_gather(n_patches: int, window: int, img_shape) -> bool:
    t_onehot = _onehot_flops(n_patches, window, img_shape) / _ONEHOT_EFF_FLOPS
    t_slice = n_patches * _SLICE_SECS_PER_PATCH
    return t_onehot <= t_slice


def gather_windows_matmul(img_pad: jax.Array, start_y: jax.Array,
                          start_x: jax.Array, window: int):
    """Gather [P, K, K, C] windows at integer starts via one-hot matmuls.

    img_pad: [Hp, Wp, C]; start_y/start_x: [P] int32 top-left corners in
    padded coordinates.  Starts are clamped to keep the window in-bounds,
    matching ``lax.dynamic_slice`` semantics exactly (the sharded path
    leans on that clamp for graceful degradation past its halo slack,
    parallel/spatial_fine.py).

    Stage 1 (rows):  R[p*K + r, y] = [y == start_y[p] + r]
                     G = R @ img.reshape(Hp, Wp*C)          (one big matmul)
    Stage 2 (cols):  S[p, m, n]   = [m == start_x[p]*C + n]  (m over Wp*C,
                     n over K*C — folding the channel axis keeps stage 2 a
                     clean batched matmul with no transposes)
                     out[p] = G[p] @ S[p]
    """
    K = window
    Hp, Wp, C = img_pad.shape
    P = start_y.shape[0]
    dtype = img_pad.dtype
    # jax.lax.dynamic_slice semantics: negative starts wrap Python-style,
    # then everything clamps to keep the window in-bounds.
    start_y = jnp.clip(jnp.where(start_y < 0, start_y + Hp, start_y),
                       0, Hp - K)
    start_x = jnp.clip(jnp.where(start_x < 0, start_x + Wp, start_x),
                       0, Wp - K)

    # Bound the materialized row-gathered intermediate [Pc, K, Wp*C] by
    # chunking the patch axis (operating point 4's full-resolution grid is
    # 51k patches — unchunked G would be ~8 GB).  Chunks are identical
    # math; concat restores the full batch.
    g_bytes_per_patch = 4 * K * Wp * C
    max_chunk = max(1, _ONEHOT_CHUNK_BYTES // g_bytes_per_patch)
    if P > max_chunk:
        n_chunks = -(-P // max_chunk)
        chunk = -(-P // n_chunks)
        outs = [gather_windows_matmul(img_pad,
                                      start_y[i * chunk:(i + 1) * chunk],
                                      start_x[i * chunk:(i + 1) * chunk],
                                      window)
                for i in range(n_chunks)]
        return jnp.concatenate(outs, axis=0)

    # Stage 1: row one-hot [P*K, Hp].
    yy = jax.lax.broadcasted_iota(jnp.int32, (P, K, Hp), 2)
    tgt = start_y[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (P, K, Hp), 1)
    R = (yy == tgt).astype(dtype).reshape(P * K, Hp)
    # HIGHEST precision: one-hot contractions must pass image values
    # through bit-exactly (default TPU matmul precision rounds fp32
    # operands to bf16); these matmuls are tiny, the cost is noise.
    G = jnp.dot(R, img_pad.reshape(Hp, Wp * C),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(dtype)
    G = G.reshape(P, K, Wp * C)

    # Stage 2: column one-hot [P, Wp*C, K*C]; m - n == start_x*C.
    mm = jax.lax.broadcasted_iota(jnp.int32, (P, Wp * C, K * C), 1)
    nn = jax.lax.broadcasted_iota(jnp.int32, (P, Wp * C, K * C), 2)
    S = (mm - nn == (start_x * C)[:, None, None]).astype(dtype)
    out = jax.lax.dot_general(
        G, S, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(dtype)
    return out.reshape(P, K, K, C)


def sample_patches_bilinear_matmul(img_pad: jax.Array, mid_x: jax.Array,
                                   mid_y: jax.Array, patch_size: int,
                                   padding: int) -> jax.Array:
    """Bilinear patch sampling with the interpolation FOLDED INTO the
    one-hot gather matmuls.

    Instead of gathering (ps+1)^2 windows and blending 4 shifted slices
    (:func:`blend_windows`), the row-select matrix places ``(1-ry, ry)``
    at rows ``start+r`` / ``start+r+1`` and the column-select places
    ``(1-rx, rx)`` — two MXU matmuls emit the fully interpolated
    [P, ps, ps*C] patches directly.  Algebraically identical to the
    4-term blend (optimize.cu:133-143), associated as rows-then-cols.

    Beyond saving the blend FLOPs, this removes the offset slices on
    odd-sized 5-D window tensors, which at ps=12 (operating points 3/4,
    window dim 13) send the TPU compiler's fusion pass into a multi-
    MINUTE compile (the round-3 "op-3 worker crash": the deferred
    server-side compile blew the driver's patience, not the kernel).
    """
    ps = patch_size
    K = ps + 1
    Hp, Wp, C = img_pad.shape
    n_h, n_w = mid_x.shape
    P = n_h * n_w
    dtype = img_pad.dtype

    fx = jnp.floor(mid_x)
    fy = jnp.floor(mid_y)
    rx = (mid_x - fx).reshape(P)
    ry = (mid_y - fy).reshape(P)
    start_y = (fy.astype(jnp.int32) + (padding - ps // 2)).reshape(P)
    start_x = (fx.astype(jnp.int32) + (padding - ps // 2)).reshape(P)
    # dynamic_slice-compatible clamp (keeps the K-reach window in-bounds).
    start_y = jnp.clip(jnp.where(start_y < 0, start_y + Hp, start_y),
                       0, Hp - K)
    start_x = jnp.clip(jnp.where(start_x < 0, start_x + Wp, start_x),
                       0, Wp - K)

    # Rows: R[p, r, y] = (1-ry_p)[y == sy_p+r] + ry_p[y == sy_p+r+1].
    yy = jax.lax.broadcasted_iota(jnp.int32, (P, ps, Hp), 2)
    tgt = start_y[:, None, None] + jax.lax.broadcasted_iota(
        jnp.int32, (P, ps, Hp), 1)
    wy0 = (1.0 - ry)[:, None, None].astype(dtype)
    wy1 = ry[:, None, None].astype(dtype)
    R = ((yy == tgt).astype(dtype) * wy0
         + (yy == tgt + 1).astype(dtype) * wy1).reshape(P * ps, Hp)
    G = jnp.dot(R, img_pad.reshape(Hp, Wp * C),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST).astype(dtype)
    G = G.reshape(P, ps, Wp * C)

    # Cols: S[p, m, n] = (1-rx_p)[m-n == sx_p*C] + rx_p[m-n == (sx_p+1)*C].
    mm = jax.lax.broadcasted_iota(jnp.int32, (P, Wp * C, ps * C), 1)
    nn = jax.lax.broadcasted_iota(jnp.int32, (P, Wp * C, ps * C), 2)
    d0 = (start_x * C)[:, None, None]
    wx0 = (1.0 - rx)[:, None, None].astype(dtype)
    wx1 = rx[:, None, None].astype(dtype)
    S = ((mm - nn == d0).astype(dtype) * wx0
         + (mm - nn == d0 + C).astype(dtype) * wx1)
    out = jax.lax.dot_general(
        G, S, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(dtype)
    return out.reshape(n_h, n_w, ps, ps, C)


_BAND = 128


def gather_band_pairs(img_pad: jax.Array, mid_x: jax.Array,
                      mid_y: jax.Array, patch_size: int, padding: int):
    """Aligned-band form of the warm-start window gather for the fused
    GN kernel: returns (bands [P, K, 2*_BAND], off [P] int32, rx, ry)
    where the patch's K x K*C window lives at lane ``off`` of its
    128-aligned band pair.

    Rationale: XLA lowers the one-hot row gather to a ~470 GB/s gather
    fusion, but gathering full Wp*C-wide rows moves ~6x the needed bytes
    (measured 6.2 ms at op-3 scale 1).  Gathering 128-lane-aligned band
    PAIRS via one row-take moves only [P, K, 256] and leaves the cheap
    in-band lane select to the kernel's radix masked shifts (measured
    2.5 ms; exact — jnp.take + the masked select reproduce
    dynamic_slice-clamped windows bit-for-bit).
    """
    ps = patch_size
    K = ps + 1
    Hp, Wp, C = img_pad.shape
    WpC = Wp * C
    KC = K * C
    n_h, n_w = mid_x.shape
    P = n_h * n_w

    fx = jnp.floor(mid_x)
    fy = jnp.floor(mid_y)
    rx = mid_x - fx
    ry = mid_y - fy
    start_y = (fy.astype(jnp.int32) + (padding - ps // 2)).reshape(P)
    start_x = (fx.astype(jnp.int32) + (padding - ps // 2)).reshape(P)
    # dynamic_slice-compatible clamp
    start_y = jnp.clip(jnp.where(start_y < 0, start_y + Hp, start_y),
                       0, Hp - K)
    start_x = jnp.clip(jnp.where(start_x < 0, start_x + Wp, start_x),
                       0, Wp - K)
    sxC = start_x * C
    assert _BAND >= KC, "window must fit one band step"

    nb = -(-WpC // _BAND) + 1           # pad + one spare zero band
    flat = jnp.pad(img_pad.reshape(Hp, WpC),
                   ((0, 0), (0, nb * _BAND - WpC)))
    rows2d = flat.reshape(Hp * nb, _BAND)
    b = sxC // _BAND
    off = sxC - b * _BAND
    ridx = ((start_y[:, None] + jnp.arange(K)[None, :])[:, :, None] * nb
            + b[:, None, None] + jnp.arange(2)[None, None, :])
    bands = jnp.take(rows2d, ridx.reshape(-1), axis=0).reshape(
        P, K, 2 * _BAND)
    return bands, off, rx, ry


def gather_windows(img_pad: jax.Array, mid_x: jax.Array, mid_y: jax.Array,
                   patch_size: int, padding: int):
    """(ps+1)x(ps+1) windows + bilinear fractions for float midpoints.

    Returns (windows [n_h, n_w, ps+1, ps+1, C], rx, ry) where the bilinear
    sample is the 4-shift blend of ``windows`` with weights built from
    (rx, ry) — see :func:`sample_patches_bilinear`.
    """
    ps = patch_size
    n_h, n_w = mid_x.shape
    C = img_pad.shape[2]

    fx = jnp.floor(mid_x)
    fy = jnp.floor(mid_y)
    rx = mid_x - fx
    ry = mid_y - fy

    start_y = (fy.astype(jnp.int32) + (padding - ps // 2)).reshape(-1)
    start_x = (fx.astype(jnp.int32) + (padding - ps // 2)).reshape(-1)

    if use_matmul_gather(n_h * n_w, ps + 1, img_pad.shape):
        windows = gather_windows_matmul(img_pad, start_y, start_x, ps + 1)
    else:
        def one_window(sy, sx):
            return jax.lax.dynamic_slice(img_pad, (sy, sx, 0),
                                         (ps + 1, ps + 1, C))

        windows = jax.vmap(one_window)(start_y, start_x)
    return windows.reshape(n_h, n_w, ps + 1, ps + 1, C), rx, ry


def blend_windows(windows: jax.Array, rx: jax.Array, ry: jax.Array) -> jax.Array:
    """Bilinear 4-shift blend of (ps+1)^2 windows -> ps x ps samples."""
    ps = windows.shape[2] - 1
    rx = rx[..., None, None, None]
    ry = ry[..., None, None, None]
    w_tl = (1.0 - rx) * (1.0 - ry)
    w_tr = rx * (1.0 - ry)
    w_bl = (1.0 - rx) * ry
    w_br = rx * ry
    return (w_tl * windows[:, :, :ps, :ps, :]
            + w_tr * windows[:, :, :ps, 1:, :]
            + w_bl * windows[:, :, 1:, :ps, :]
            + w_br * windows[:, :, 1:, 1:, :])


def sample_patches_bilinear(img_pad: jax.Array, mid_x: jax.Array,
                            mid_y: jax.Array, patch_size: int,
                            padding: int) -> jax.Array:
    """Sample ps x ps patches centered at float midpoints.

    img_pad: [Hp, Wp, C] padded image; mid_x/mid_y: [n_h, n_w] float
    midpoints in unpadded coordinates.  Returns [n_h, n_w, ps, ps, C].

    Midpoints are assumed within the valid box [l_bound, u_bound]
    (enforced by the optimizer's outlier reset, optimize.cu:71-88), so all
    windows land inside the padded image; dynamic_slice clamps regardless.

    Uses the interpolating-matmul form when the one-hot operands fit the
    budget (see :func:`sample_patches_bilinear_matmul`); otherwise the
    window gather + 4-shift blend.
    """
    n_h, n_w = mid_x.shape
    if use_matmul_gather(n_h * n_w, patch_size + 1, img_pad.shape):
        return sample_patches_bilinear_matmul(img_pad, mid_x, mid_y,
                                              patch_size, padding)
    windows, rx, ry = gather_windows(img_pad, mid_x, mid_y, patch_size,
                                     padding)
    return blend_windows(windows, rx, ry)
