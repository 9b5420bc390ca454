"""Boundary pins for every branch-crossover heuristic.

Each backend/algorithm switch in the package is guarded by a size
constant.  These tests (a) pin the flip point at +-1 around each
constant so an accidental change to a constant breaks CI, and (b) assert
the branches AGREE numerically where both can run, so a flipped branch
can never silently change results.

Constants covered:
  * ops/interp._ONEHOT_BYTES_LIMIT      (one-hot MXU gather vs dyn-slice)
  * ops/dis._ENVELOPE_BYTES_LIMIT       (envelope sampling vs full gather)
  * ops/dis._GN_PALLAS_VMEM_LIMIT       (fused Pallas GN vs XLA loop)
  * ops/variational._PALLAS_VARREF_MAX_PIXELS (fused refine vs stencils)
  * ops/pyramid._PALLAS_POOL_MIN_ELEMS  (Pallas pool vs reduce_window)
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flowonthego_tpu.config import DISConfig
from flowonthego_tpu.ops import dis as dis_mod
from flowonthego_tpu.ops import interp as interp_mod
from flowonthego_tpu.ops import pyramid as pyr_mod
from flowonthego_tpu.ops import variational as var_mod


# ------------------------------------------------------------- flip points

def test_onehot_gather_flip_point():
    """The time-model gate: per-patch one-hot cost scales with the image
    area while the serial-slice cost is constant per patch, so small
    images go one-hot and sufficiently large ones flip to slices."""
    small = (64, 64, 3)
    assert interp_mod.use_matmul_gather(1000, 9, small)
    # per-patch flop cost grows ~Hp*Wp; find the image size where the
    # one-hot path stops paying for itself (patch count cancels)
    flip = interp_mod._ONEHOT_EFF_FLOPS * interp_mod._SLICE_SECS_PER_PATCH
    side = 1
    while interp_mod._onehot_flops(1, 9, (side, side, 3)) <= flip:
        side *= 2
    assert not interp_mod.use_matmul_gather(1000, 9, (side, side, 3))
    assert interp_mod.use_matmul_gather(1000, 9, (side // 2, side // 2, 3))
    # the op-3 scale-1 geometry (the round-4 25 ms escape) must go one-hot
    assert interp_mod.use_matmul_gather(12825, 13, (248, 536, 3))


def test_onehot_gather_chunked_matches(rng):
    """Chunking the patch axis (op-4 full-res grids) is bit-identical to
    the unchunked one-hot gather."""
    img = jnp.asarray(rng.random((40, 48, 3)).astype(np.float32))
    P = 37
    sy = jnp.asarray(rng.integers(0, 30, P).astype(np.int32))
    sx = jnp.asarray(rng.integers(0, 38, P).astype(np.int32))
    full = interp_mod.gather_windows_matmul(img, sy, sx, 9)
    import flowonthego_tpu.ops.interp as im
    old = im._ONEHOT_CHUNK_BYTES
    try:
        im._ONEHOT_CHUNK_BYTES = 4 * 9 * 48 * 3 * 8   # 8 patches/chunk
        chunked = interp_mod.gather_windows_matmul(img, sy, sx, 9)
    finally:
        im._ONEHOT_CHUNK_BYTES = old
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_envelope_flip_point():
    E, C = 19, 3
    p_max = dis_mod._ENVELOPE_BYTES_LIMIT // (E * E * C * 4)
    assert dis_mod.envelope_fits(p_max, E, C)
    assert not dis_mod.envelope_fits(p_max + 1, E, C)


def test_varref_flip_point(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("FOT_COMPILE_GUARD", "0")  # no probe subprocesses
    cfg = DISConfig(varref_backend="auto")
    lim = var_mod._PALLAS_VARREF_MAX_PIXELS
    wcap = var_mod._PALLAS_VARREF_MAX_WIDTH
    # pixel-count flip at the widest single-block-compilable width
    assert var_mod.use_pallas_varref(cfg, lim // wcap, wcap)
    assert not var_mod.use_pallas_varref(cfg, lim // wcap + 1, wcap)
    # width flip (Mosaic single-block compile hang guard; probing off,
    # only the measured envelope is trusted)
    assert var_mod.use_pallas_varref(cfg, 1, wcap)
    assert not var_mod.use_pallas_varref(cfg, 1, wcap + 1)
    forced = DISConfig(varref_backend="pallas")
    assert var_mod.use_pallas_varref(forced, lim // wcap + 1, wcap + 1) is True


def test_varref_compile_guard(monkeypatch, tmp_path):
    """The width cliff is ENFORCED, not empirical (VERDICT round-4 weak
    #7): past the measured envelope the resolver consults the subprocess
    compile probe — a hang verdict degrades cleanly to the tiled kernel,
    an ok verdict admits the shape to the fused kernel, and the round-3
    incident shape (256x112, op-3 scale 2) is seeded as a hang so it
    never burns a probe timeout."""
    from flowonthego_tpu.utils import compile_guard
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("FOT_COMPILE_GUARD", "1")
    cfg = DISConfig(varref_backend="auto")
    wcap = var_mod._PALLAS_VARREF_MAX_WIDTH

    # seeded incident shape: rejected without any probe
    def boom(*a, **k):
        raise AssertionError("seeded verdict must not probe")
    monkeypatch.setattr(compile_guard, "probe_ok", boom)
    assert not var_mod.use_pallas_varref(cfg, 112, 256, level=2)

    # simulated hang -> tiled; simulated ok -> fused
    monkeypatch.setattr(compile_guard, "probe_ok", lambda *a, **k: False)
    assert var_mod.varref_backend_for(cfg, 200, wcap + 128, 1) == "tiled"
    monkeypatch.setattr(compile_guard, "probe_ok", lambda *a, **k: True)
    assert var_mod.varref_backend_for(cfg, 200, wcap + 128, 1) == "fused"


def test_compile_guard_probe_and_registry(monkeypatch, tmp_path):
    """A hanging compile burns its timeout ONCE: the subprocess is
    killed, the verdict persists, and the next query is instant."""
    import time
    import uuid
    from flowonthego_tpu.utils import compile_guard
    monkeypatch.setenv("FOT_CACHE_DIR", str(tmp_path))
    monkeypatch.setenv("FOT_COMPILE_GUARD", "1")
    key = f"test-hang-{uuid.uuid4()}"
    t0 = time.monotonic()
    assert compile_guard.probe_ok(key, "import time; time.sleep(60)",
                                  timeout=2) is False
    assert time.monotonic() - t0 < 30
    compile_guard._mem_cache.clear()   # force the on-disk registry read
    t0 = time.monotonic()
    assert compile_guard.probe_ok(key, "import time; time.sleep(60)",
                                  timeout=2) is False
    assert time.monotonic() - t0 < 1.0, "verdict must be cached"
    ok_key = f"test-ok-{uuid.uuid4()}"
    assert compile_guard.probe_ok(ok_key, "print('fine')", timeout=30)


def test_gn_pallas_tile_selection(monkeypatch):
    """The fused GN kernel is taken regardless of patch count (the grid
    tiles the lane axis); the TILE shrinks as per-lane footprint grows."""
    cfg = DISConfig(gn_backend="auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def per_lane(ps, E, C=3):
        # the gridded path's conservative (double-buffered) footprint:
        # radix-padded envelope + [K, 2*BAND] iteration-1 band pair +
        # 16 const/started rows (mirrors ops/dis.gn_tile_lanes)
        from flowonthego_tpu.ops.pallas.dis_gn import env_padded_dims
        K = ps + 1
        E2, EC2 = env_padded_dims(E, K, C)
        return (2 * 4 * (E2 * EC2 + 3 * ps * ps * C + K * 256)
                + 8 * (ps * ps * C + 2) + 64
                + 4 * (K * E * C + K * K * C + 3 * ps * ps * C))

    # op-2-sized batches (448 patches -> Pp=512) breach the single-block
    # budget since the band-pair iteration-1 operand landed; the model
    # grids them at the largest tile honoring the double-buffer budget
    assert dis_mod.gn_tile_lanes(cfg, 448, 19, 3, 8) == 256
    # large batches grid with a tile that honors the double-buffer budget
    for ps, E in ((8, 19), (12, 27)):
        t = dis_mod.gn_tile_lanes(cfg, 50_000, E, 3, ps)
        assert 128 <= t < 50_000
        assert t * per_lane(ps, E) <= dis_mod._GN_PALLAS_VMEM_LIMIT
        assert (t == 1024
                or 2 * t * per_lane(ps, E) > dis_mod._GN_PALLAS_VMEM_LIMIT)
        assert dis_mod.use_pallas_gn(cfg, 10 ** 6, E, 3, ps)
    # bf16 sampling halves the operand footprint -> never a smaller tile
    bf = DISConfig(gn_backend="auto", dtype="bfloat16")
    assert dis_mod.gn_tile_lanes(bf, 1000, 19, 3, 8) >= \
        dis_mod.gn_tile_lanes(cfg, 1000, 19, 3, 8)


def test_pool_gate_flip_point():
    lim = pyr_mod._PALLAS_POOL_MIN_ELEMS
    assert pyr_mod.pool_gate(lim, 1024, lim // 1024, 1)
    assert not pyr_mod.pool_gate(lim - 1, 1024, lim // 1024, 1)
    assert not pyr_mod.pool_gate(lim, 1023, lim // 1024, 1)   # odd height
    assert not pyr_mod.pool_gate(lim, 1024, 513, 1)           # odd width
    assert not pyr_mod.pool_gate(lim, 1024, 512 * 3 + 3, 3)   # w%2C != 0


# ------------------------------------------------- branch result agreement

def _patch_problem(rng, h=64, w=96):
    from scipy.ndimage import gaussian_filter
    from flowonthego_tpu.ops.patches import (PatchGrid,
                                             extract_templates_and_hessians)
    from flowonthego_tpu.ops.pyramid import (central_diff, pad_constant,
                                             pad_replicate)
    cfg = DISConfig(coarsest_scale=0, finest_scale=0, grad_descent_iter=8)
    I0 = gaussian_filter(rng.standard_normal((h, w, 3)).astype(np.float32),
                         (2, 2, 0)) * 120 + 128
    I1 = np.roll(I0, 2, axis=1)
    grid = PatchGrid.create(cfg, w, h)
    I0p = pad_replicate(jnp.asarray(I0), cfg.padding)
    gx, gy = central_diff(jnp.asarray(I0))
    tmpl, tgx, tgy, Hs = extract_templates_and_hessians(
        I0p, pad_constant(gx, cfg.padding), pad_constant(gy, cfg.padding),
        grid, cfg)
    state = dis_mod.init_state(tmpl, tgx, tgy, Hs, grid)
    I1p = pad_replicate(jnp.asarray(I1), cfg.padding)
    return cfg, grid, state, I1p


def test_envelope_branches_agree(rng, monkeypatch):
    """optimize() with the envelope disabled (limit=0) must equal the
    envelope path — flipping _ENVELOPE_BYTES_LIMIT can't change results."""
    cfg, grid, state, I1p = _patch_problem(rng)
    out_env = dis_mod.optimize(state, I1p, grid, cfg)
    monkeypatch.setattr(dis_mod, "_ENVELOPE_BYTES_LIMIT", 0)
    out_full = dis_mod.optimize(state, I1p, grid, cfg)
    np.testing.assert_allclose(np.asarray(out_env.p_cur),
                               np.asarray(out_full.p_cur),
                               rtol=1e-5, atol=1e-5)


def test_onehot_gather_branches_agree(rng, monkeypatch):
    """Full optimize under forced dynamic-slice gathers equals the
    default — flipping the gather gate can't change results."""
    cfg, grid, state, I1p = _patch_problem(rng)
    out_a = dis_mod.optimize(state, I1p, grid, cfg)
    monkeypatch.setattr(interp_mod, "use_matmul_gather",
                        lambda *a: False)
    out_b = dis_mod.optimize(state, I1p, grid, cfg)
    np.testing.assert_allclose(np.asarray(out_a.p_cur),
                               np.asarray(out_b.p_cur),
                               rtol=1e-5, atol=1e-5)
