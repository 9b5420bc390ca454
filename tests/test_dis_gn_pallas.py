"""Fused Gauss-Newton Pallas kernel vs the XLA envelope loop.

The kernel (ops/pallas/dis_gn.gn_scale_loop) runs the WHOLE per-scale
solve in one launch — iteration 1 from pre-gathered windows, the envelope
loop, and the final per-pixel cost; these tests assert it reproduces
ops/dis.optimize's XLA path (interpret mode on CPU; on-device parity is
covered by the end-to-end bench EPE).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import gaussian_filter

from flowonthego_tpu.config import DISConfig
from flowonthego_tpu.models.dis_flow import compute_flow
from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops.pyramid import pad_constant, pad_replicate
from flowonthego_tpu.ops.pyramid import central_diff


def _scene(rng, h, w, shift=(2.0, 1.0)):
    base = gaussian_filter(
        rng.standard_normal((h + 16, w + 16, 3)).astype(np.float32),
        sigma=(4, 4, 0)) * 120 + 128
    i0 = base[8:8 + h, 8:8 + w]
    sy, sx = int(round(shift[1])), int(round(shift[0]))
    i1 = base[8 - sy:8 - sy + h, 8 - sx:8 - sx + w]
    return jnp.asarray(i0), jnp.asarray(i1)


def _optimize_both(cfg, i0, i1, coarse_flow=None):
    """Run one scale's optimize with gn_backend xla vs pallas."""
    h, w = i0.shape[:2]
    grid = PatchGrid.create(cfg, w, h)
    I0p = pad_replicate(i0, cfg.padding)
    gx0, gy0 = central_diff(i0)
    tmpl, gx, gy, H = extract_templates_and_hessians(
        I0p, pad_constant(gx0, cfg.padding), pad_constant(gy0, cfg.padding),
        grid, cfg)
    I1p = pad_replicate(i1, cfg.padding)
    out = {}
    for backend in ("xla", "pallas"):
        c = dataclasses.replace(cfg, gn_backend=backend)
        state = dis_mod.init_state(tmpl, gx, gy, H, grid)
        if coarse_flow is not None:
            state = dis_mod.init_from_coarser(state, coarse_flow, grid)
        out[backend] = dis_mod.optimize(state, I1p, grid, c)
    return out["xla"], out["pallas"]


def test_gn_pallas_matches_xla_cold_start(rng):
    cfg = DISConfig(coarsest_scale=0, finest_scale=0)
    i0, i1 = _scene(rng, 48, 64)
    ref, got = _optimize_both(cfg, i0, i1)
    np.testing.assert_allclose(np.asarray(got.p_cur), np.asarray(ref.p_cur),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.cost_px),
                               np.asarray(ref.cost_px),
                               rtol=1e-3, atol=1e-3)


def test_gn_pallas_matches_xla_warm_start(rng):
    """Warm start exercises frozen-at-init patches and the outlier reset."""
    cfg = DISConfig(coarsest_scale=1, finest_scale=1)
    i0, i1 = _scene(rng, 48, 64, shift=(3.0, -2.0))
    coarse = jnp.asarray(
        rng.standard_normal((24, 32, 2)).astype(np.float32) * 2.0)
    ref, got = _optimize_both(cfg, i0, i1, coarse_flow=coarse)
    np.testing.assert_allclose(np.asarray(got.p_cur), np.asarray(ref.p_cur),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("gd_iter", [1, 2])
def test_gn_pallas_short_loops(rng, gd_iter):
    """gd_iter == 1 runs a kernel with zero envelope iterations (iteration
    1 + final cost only); == 2 adds one envelope iteration."""
    cfg = DISConfig(coarsest_scale=0, finest_scale=0,
                    grad_descent_iter=gd_iter)
    i0, i1 = _scene(rng, 48, 64)
    ref, got = _optimize_both(cfg, i0, i1)
    np.testing.assert_allclose(np.asarray(got.p_cur), np.asarray(ref.p_cur),
                               rtol=1e-4, atol=1e-4)


def test_gn_pallas_bf16_envelope(rng):
    """cfg.dtype="bfloat16" no longer changes backend: the fused kernel
    accepts the bf16 envelope + weight stack directly (upcast in-kernel,
    fp32 carries).  The XLA bf16 path blends windows in bf16 where the
    kernel blends in fp32, so agreement is quantization-level, not exact.
    """
    i0, i1 = _scene(rng, 48, 64)
    cfg = DISConfig(coarsest_scale=0, finest_scale=0, dtype="bfloat16")
    ref, got = _optimize_both(cfg, i0, i1)
    d = np.abs(np.asarray(got.p_cur) - np.asarray(ref.p_cur))
    assert float(np.quantile(d, 0.95)) < 0.05 and float(d.max()) < 0.5, \
        f"q95={np.quantile(d, 0.95):.3g} max={d.max():.3g}"
    # and the bf16 kernel stays close to the fp32 kernel (sampling
    # quantization only)
    ref32, got32 = _optimize_both(
        dataclasses.replace(cfg, dtype="float32"), i0, i1)
    d32 = np.abs(np.asarray(got.p_cur) - np.asarray(got32.p_cur))
    assert float(np.quantile(d32, 0.95)) < 0.1, \
        f"bf16-vs-f32 q95={np.quantile(d32, 0.95):.3g}"


def test_gn_pallas_full_pipeline(rng):
    """End-to-end op-point-2 flow with the fused kernel forced on."""
    i0, i1 = _scene(rng, 64, 96)
    cfg = DISConfig(coarsest_scale=2, finest_scale=0)
    flow_ref = np.asarray(compute_flow(
        i0, i1, dataclasses.replace(cfg, gn_backend="xla")))
    flow_pal = np.asarray(compute_flow(
        i0, i1, dataclasses.replace(cfg, gn_backend="pallas")))
    np.testing.assert_allclose(flow_pal, flow_ref, rtol=1e-3, atol=1e-3)


def test_gn_pallas_gridded_matches_single_block(rng, monkeypatch):
    """The lane-tiled grid form (ops 3/4's big scales) matches the
    single-block form (interpret mode exercises the BlockSpec indexing).
    Not bit-equal: the per-lane reduction association depends on the
    block shape under CPU vectorization (~1e-5); the math is otherwise
    identical per lane."""
    cfg = DISConfig(coarsest_scale=0, finest_scale=0, gn_backend="pallas")
    i0, i1 = _scene(rng, 48, 64)
    _, single = _optimize_both(cfg, i0, i1)
    assert single.p_cur.shape[0] * single.p_cur.shape[1] > 128

    monkeypatch.setattr(dis_mod, "gn_tile_lanes",
                        lambda *a, **k: 128)
    _, gridded = _optimize_both(cfg, i0, i1)
    np.testing.assert_allclose(np.asarray(gridded.p_cur),
                               np.asarray(single.p_cur),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gridded.cost_px),
                               np.asarray(single.cost_px),
                               rtol=1e-3, atol=1e-2)
