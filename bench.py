"""Benchmark harness: frames/sec/chip on the reference's headline workloads.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Methodology: per-frame device time is measured by chaining N dependent
pipeline executions inside one jitted fori_loop and fetching a single
scalar — this amortizes the host<->device tunnel round-trip (~25-35 ms on
the axon link, far larger than the compute itself) exactly the way a
streaming-video deployment would.  Two variants:
  * ms_* (headline) — STREAMED video: each chained iteration ingests one
    new frame, builds its pyramid once, and reuses the carried previous
    frame's pyramid + warm-start flow (the deployment loop; the
    reference's 25 fps 4K claim is likewise a video number).
  * ms_*_pair — cold two-frame call (both pyramids built, no warm start).
fps_* = 1000 / ms.

Baseline: the reference CUDA implementation runs 1024x448 and 4K at
~40 ms/frame (25 fps) on a Jetson TX2 (/root/reference/docs/index.md:29-31,
173-175; BASELINE.md).  Headline metric: 4K fps per chip, op point 2.
"""

import json
import sys
import time


def chain_timer(step, args, n=48, trials=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(i, acc):
            out = step(*(x + acc * 1e-12 for x in a))
            return acc + jnp.sum(out) * 1e-20
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chained(*args))  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(*args))
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    return times[len(times) // 2] * 1e3


def stream_chain_timer(H, W, cfg, frame_flat, n=64, trials=5):
    """Per-frame device time of STREAMED video flow.

    Chains n frames through the streaming step: each iteration ingests a
    'new' frame (the base frame perturbed by the carried scalar — one
    full-frame read, like a real ingest), builds ITS pyramid once, and
    computes flow against the carried previous pyramid with the carried
    warm-start flow.  This is the deployment loop (frame t's pyramid is
    reused as pair t+1's I0 pyramid; the reference instead rebuilds both
    pyramids every pair, oflow.cpp:189-196).
    """
    import jax
    import jax.numpy as jnp
    from flowonthego_tpu.models.dis_flow import (dis_flow_from_pyramids,
                                                 upsample_flow_to_full)
    from flowonthego_tpu.ops.pyramid import build_pyramid

    n_levels = cfg.coarsest_scale + 1
    init_h, init_w = H >> (cfg.coarsest_scale + 1), W >> (cfg.coarsest_scale + 1)

    def pyramid(If, bias=None):
        # bias emulates ingesting a new frame; it is fused into the first
        # pyramid level's read (a standalone full-frame add costs a
        # 100 MB read+write at 4K) — a real deployment's frames arrive as
        # fresh device buffers and pay neither.
        return build_pyramid(If.reshape(H, W, 3), n_levels, cfg.padding,
                             start_level=cfg.finest_scale,
                             ingest_bias=bias)

    @jax.jit
    def chained(If):
        pyr0 = pyramid(If)
        init0 = jnp.zeros((init_h, init_w, 2), jnp.float32)

        def body(i, carry):
            pyr_prev, init, acc = carry
            pyr_new = pyramid(If, bias=acc * 1e-12)  # ingest one new frame
            flow = dis_flow_from_pyramids(pyr_prev, pyr_new, cfg,
                                          init_flow=init)
            out = upsample_flow_to_full(flow, cfg, H, W)
            nxt = jax.image.resize(
                flow / (2.0 ** (cfg.coarsest_scale + 1 - cfg.finest_scale)),
                (init_h, init_w, 2), method="linear")
            return pyr_new, nxt, acc + jnp.sum(out) * 1e-20
        _, _, acc = jax.lax.fori_loop(0, n, body, (pyr0, init0,
                                                   jnp.float32(0.0)))
        return acc

    float(chained(frame_flat))  # compile + warm
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(frame_flat))
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    return times[len(times) // 2] * 1e3


def multi_stream_chain_timer(H, W, cfg, frame_flat, n_streams=4, n=32,
                             trials=3):
    """Per-TICK device time of n_streams warm-started streams advancing
    together on one chip (the per-chip unit of parallel/multistream.py's
    multi-chip program).  Returns ms per tick (= n_streams frames)."""
    import jax
    import jax.numpy as jnp
    from flowonthego_tpu.models.dis_flow import (dis_flow_from_pyramids,
                                                 upsample_flow_to_full)
    from flowonthego_tpu.ops.pyramid import build_pyramid

    n_levels = cfg.coarsest_scale + 1
    init_h, init_w = H >> (cfg.coarsest_scale + 1), W >> (cfg.coarsest_scale + 1)

    def pyramid(If):
        return build_pyramid(If.reshape(H, W, 3), n_levels, cfg.padding,
                             start_level=cfg.finest_scale)

    def one_step(pyr_prev, If, init):
        pyr_new = pyramid(If)
        flow = dis_flow_from_pyramids(pyr_prev, pyr_new, cfg, init_flow=init)
        out = upsample_flow_to_full(flow, cfg, H, W)
        nxt = jax.image.resize(
            flow / (2.0 ** (cfg.coarsest_scale + 1 - cfg.finest_scale)),
            (init_h, init_w, 2), method="linear")
        return out, pyr_new, nxt

    @jax.jit
    def chained(If):
        frames = jnp.stack([If + 0.25 * i for i in range(n_streams)])
        pyr0 = jax.vmap(pyramid)(frames)
        init0 = jnp.zeros((n_streams, init_h, init_w, 2), jnp.float32)

        def body(i, carry):
            pyr_prev, init, acc = carry
            out, pyr, nxt = jax.vmap(one_step)(
                pyr_prev, frames + acc * 1e-12, init)
            return pyr, nxt, acc + jnp.sum(out) * 1e-20
        _, _, acc = jax.lax.fori_loop(0, n, body,
                                      (pyr0, init0, jnp.float32(0.0)))
        return acc

    float(chained(frame_flat))
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(chained(frame_flat))
        times.append((time.perf_counter() - t0) / n)
    times.sort()
    return times[len(times) // 2] * 1e3


def main():
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("FOT_CACHE_DIR", "/tmp/fot_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from flowonthego_tpu.config import operating_point, pad_to_divisible
    from flowonthego_tpu.models.dis_flow import (dis_flow_padded,
                                                 upsample_flow_to_full)
    from flowonthego_tpu.io.images import load_image
    from flowonthego_tpu.io.flo import read_flo
    from flowonthego_tpu.utils.metrics import average_epe

    def make_step(H, W, cfg):
        """Step over FLAT [H, W*3] frames.

        Frames are stored packed (2D): XLA's default device layout for a
        rank-3 [H, W, 3] jit argument lane-pads the minor dim (42x memory
        bloat) the moment a non-fusible consumer materializes it; a real
        streaming deployment keeps frames packed for the same reason.
        The in-jit reshape to [H, W, 3] is a free bitcast.
        """
        def step(I0f, I1f):
            I0 = I0f.reshape(H, W, 3)
            I1 = I1f.reshape(H, W, 3)
            flow = dis_flow_padded(I0, I1, cfg)
            return upsample_flow_to_full(flow, cfg, H, W)
        return step

    results = {}
    rng = np.random.default_rng(0)

    # ---- 4K (3840x2160 padded to 3840x2176), op 2 ----
    H4, W4 = 2176, 3840
    cfg4 = operating_point(2, width=W4)
    base = rng.random((H4 + 8, W4 + 8, 3), np.float32) * 255.0
    I0 = jax.device_put(np.ascontiguousarray(base[:H4, :W4]).reshape(H4, -1))
    I1 = jax.device_put(
        np.ascontiguousarray(base[4:4 + H4, 3:3 + W4]).reshape(H4, -1))
    results["ms_4k_pair"] = chain_timer(make_step(H4, W4, cfg4), (I0, I1))
    # headline: streamed 4K video (the reference's 25 fps claim is also a
    # video-processing number) — one pyramid build per frame, warm start
    results["ms_4k"] = stream_chain_timer(H4, W4, cfg4, I0)
    results["fps_4k"] = 1000.0 / results["ms_4k"]
    del I0, I1, base

    # ---- 1024x436 Sintel (padded 1024x448), op 2 + EPE ----
    A = load_image("/root/reference/images/alley_1/frame_0001.png")
    B = load_image("/root/reference/images/alley_1/frame_0002.png")
    h, w = A.shape[:2]
    cfg1 = operating_point(2, width=w)
    pt, pb, pl, pr = pad_to_divisible(w, h, cfg1.coarsest_scale)
    Ap = np.pad(A, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    Bp = np.pad(B, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    H1, W1 = Ap.shape[:2]
    step1 = make_step(H1, W1, cfg1)
    I0s = jnp.asarray(Ap.reshape(H1, -1))
    I1s = jnp.asarray(Bp.reshape(H1, -1))
    results["ms_1024x436_pair"] = chain_timer(step1, (I0s, I1s))
    results["ms_1024x436"] = stream_chain_timer(H1, W1, cfg1, I0s)
    results["fps_1024x436"] = 1000.0 / results["ms_1024x436"]

    flow = np.asarray(jax.jit(step1)(I0s, I1s))[pt:pt + h, pl:pl + w]
    ref = read_flo("/root/reference/kroeger/flows/alley_0001.flo")
    results["epe_vs_ref_alley1"] = average_epe(flow, ref)

    # ---- benchmark breadth: operating points 1/3/4 at 1024x448 ----
    # (op 4: ps=12, 128 GD iterations; op 1: no var-ref, 16 iters — they
    # exercise the fused-GN/var-ref gates differently than op 2)
    # Soft budget: first-ever compiles over the tunnel cost minutes each;
    # if the wall budget runs out, remaining extras emit -1 rather than
    # risking the whole bench (the persistent compile cache makes later
    # runs fast).  The headline metrics above always run.
    # Extras are strictly best-effort: every headline value above is
    # already a fetched Python float, so even a TPU worker fault inside an
    # extra cannot lose the official line.  Each extra runs inside a soft
    # wall-clock budget (first-ever compiles over the tunnel cost minutes;
    # the persistent cache makes later runs fast) and any failure marks
    # the remaining extras -1 (a faulted worker poisons the client).
    deadline = (time.monotonic()
                + float(os.environ.get("FOT_BENCH_BUDGET_S", "900")))
    extras_dead = []

    def run_extra(name, thunk):
        if extras_dead or time.monotonic() >= deadline:
            results[name] = -1.0
            return
        try:
            results[name] = thunk()
        except Exception as e:              # noqa: BLE001
            results[name] = -1.0
            extras_dead.append(f"{name}: {type(e).__name__}")
            print(f"# extra {name} failed: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", file=sys.stderr)

    def op_extra(op):
        cfg_op = operating_point(op, width=w)
        ptn, pbn, pln, prn = pad_to_divisible(w, h, cfg_op.coarsest_scale)
        An = np.pad(A, ((ptn, pbn), (pln, prn), (0, 0)), mode="edge")
        Bn = np.pad(B, ((ptn, pbn), (pln, prn), (0, 0)), mode="edge")
        Hn, Wn = An.shape[:2]
        return chain_timer(
            make_step(Hn, Wn, cfg_op),
            (jnp.asarray(An.reshape(Hn, -1)), jnp.asarray(Bn.reshape(Hn, -1))),
            n=32, trials=3)

    for op in (1, 3, 4):
        run_extra(f"ms_1024x436_op{op}", lambda op=op: op_extra(op))

    # ---- road_HD 1920x1080 (the reference's bundled HD frame), op 2 ----
    def hd_extra():
        R = load_image("/root/reference/images/road_HD.jpg")
        hr, wr = R.shape[:2]
        cfg_hd = operating_point(2, width=wr)
        ptr, pbr, plr, prr = pad_to_divisible(wr, hr, cfg_hd.coarsest_scale)
        Rp = np.pad(R, ((ptr, pbr), (plr, prr), (0, 0)), mode="edge")
        Hr, Wr = Rp.shape[:2]
        return stream_chain_timer(Hr, Wr, cfg_hd,
                                  jnp.asarray(Rp.reshape(Hr, -1)),
                                  n=32, trials=3)

    run_extra("ms_1080p", hd_extra)
    results["fps_1080p"] = 1000.0 / results["ms_1080p"] if \
        results["ms_1080p"] > 0 else -1.0

    # ---- multi-stream aggregate on one chip: 4 warm-started 1024x448
    # streams batched together (the per-chip unit of the multi-chip
    # streamed-video program, parallel/multistream.py) ----
    run_extra("ms_1024x436_4streams",
              lambda: multi_stream_chain_timer(H1, W1, cfg1, I0s,
                                               n_streams=4, n=32, trials=3))
    results["fps_1024x436_agg4"] = 4000.0 / results["ms_1024x436_4streams"] \
        if results["ms_1024x436_4streams"] > 0 else -1.0

    out = {
        "metric": "fps_4k_per_chip_op2",
        "value": round(results["fps_4k"], 3),
        "unit": "frames/sec",
        "vs_baseline": round(results["fps_4k"] / 25.0, 3),
        "fps_1024x436": round(results["fps_1024x436"], 3),
        "ms_4k": round(results["ms_4k"], 3),
        "ms_1024x436": round(results["ms_1024x436"], 3),
        "ms_4k_pair": round(results["ms_4k_pair"], 3),
        "ms_1024x436_pair": round(results["ms_1024x436_pair"], 3),
        "epe_vs_ref_alley1": round(results["epe_vs_ref_alley1"], 5),
        "ms_1024x436_op1": round(results["ms_1024x436_op1"], 3),
        "ms_1024x436_op3": round(results["ms_1024x436_op3"], 3),
        "ms_1024x436_op4": round(results["ms_1024x436_op4"], 3),
        "ms_1080p": round(results["ms_1080p"], 3),
        "fps_1080p": round(results["fps_1080p"], 3),
        "ms_1024x436_4streams_tick": round(results["ms_1024x436_4streams"], 3),
        "fps_1024x436_agg4": round(results["fps_1024x436_agg4"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
