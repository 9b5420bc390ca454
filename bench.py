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


def stream_chain_timer(H, W, cfg, frame_flat, n=192, trials=3):
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


def _make_step(H, W, cfg):
    """Step over FLAT [H, W*3] frames.

    Frames are stored packed (2D): XLA's default device layout for a
    rank-3 [H, W, 3] jit argument lane-pads the minor dim (42x memory
    bloat) the moment a non-fusible consumer materializes it; a real
    streaming deployment keeps frames packed for the same reason.
    The in-jit reshape to [H, W, 3] is a free bitcast.
    """
    from flowonthego_tpu.models.dis_flow import (dis_flow_padded,
                                                 upsample_flow_to_full)

    def step(I0f, I1f):
        I0 = I0f.reshape(H, W, 3)
        I1 = I1f.reshape(H, W, 3)
        flow = dis_flow_padded(I0, I1, cfg)
        return upsample_flow_to_full(flow, cfg, H, W)
    return step


def _sintel_padded(cfg):
    import numpy as np
    from flowonthego_tpu.config import pad_to_divisible
    from flowonthego_tpu.io.images import load_image
    A = load_image("/root/reference/images/alley_1/frame_0001.png")
    B = load_image("/root/reference/images/alley_1/frame_0002.png")
    h, w = A.shape[:2]
    pt, pb, pl, pr = pad_to_divisible(w, h, cfg.coarsest_scale)
    Ap = np.pad(A, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    Bp = np.pad(B, ((pt, pb), (pl, pr), (0, 0)), mode="edge")
    return Ap, Bp, (pt, pb, pl, pr), (h, w)


def run_extra_task(name: str) -> float:
    """Compute ONE extra metric (runs in a subprocess — a kernel fault or
    a pathological compile then costs this metric alone, not the suite;
    the round-3 op-3 failure wiped op4/1080p/multistream because the
    faulted worker poisoned the shared client)."""
    import jax.numpy as jnp
    from flowonthego_tpu.utils.cache import enable_compile_cache
    from flowonthego_tpu.utils.logfilter import install_stderr_noise_filter
    install_stderr_noise_filter()
    enable_compile_cache()
    from flowonthego_tpu.config import operating_point, pad_to_divisible
    from flowonthego_tpu.io.images import load_image

    if name.startswith("op"):
        cfg_op = operating_point(int(name[2:]), width=1024)
        Ap, Bp, _, _ = _sintel_padded(cfg_op)
        Hn, Wn = Ap.shape[:2]
        return chain_timer(
            _make_step(Hn, Wn, cfg_op),
            (jnp.asarray(Ap.reshape(Hn, -1)), jnp.asarray(Bp.reshape(Hn, -1))),
            n=32, trials=3)
    if name == "1080p":
        import numpy as np
        R = load_image("/root/reference/images/road_HD.jpg")
        hr, wr = R.shape[:2]
        cfg_hd = operating_point(2, width=wr)
        ptr, pbr, plr, prr = pad_to_divisible(wr, hr, cfg_hd.coarsest_scale)
        Rp = np.pad(R, ((ptr, pbr), (plr, prr), (0, 0)), mode="edge")
        Hr, Wr = Rp.shape[:2]
        return stream_chain_timer(Hr, Wr, cfg_hd,
                                  jnp.asarray(Rp.reshape(Hr, -1)),
                                  n=192, trials=3)
    if name == "4streams":
        cfg1 = operating_point(2, width=1024)
        Ap, _, _, _ = _sintel_padded(cfg1)
        H1, W1 = Ap.shape[:2]
        return multi_stream_chain_timer(H1, W1, cfg1,
                                        jnp.asarray(Ap.reshape(H1, -1)),
                                        n_streams=4, n=96, trials=3)
    if name == "4k_u8":
        # uint8 ingest (deployment video frames; the reference converts
        # at load, run_dense.cpp:137-145): the first pool upcasts in-VMEM
        # so the dominant full-res frame read moves 1/4 the bytes.
        # Bit-exact vs float ingest (0..255 is exact in fp32) — EPE
        # unchanged by construction.
        import numpy as np
        H4, W4 = 2176, 3840
        cfg4 = operating_point(2, width=W4)
        rng = np.random.default_rng(0)
        frame = (rng.random((H4, W4, 3), np.float32) * 255.0).astype(
            np.uint8)
        return stream_chain_timer(H4, W4, cfg4,
                                  jnp.asarray(frame.reshape(H4, -1)),
                                  n=192, trials=3)
    raise ValueError(name)


def main():
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flowonthego_tpu.utils.cache import enable_compile_cache
    from flowonthego_tpu.utils.logfilter import install_stderr_noise_filter
    install_stderr_noise_filter()
    enable_compile_cache()
    from flowonthego_tpu.config import operating_point, pad_to_divisible
    from flowonthego_tpu.io.images import load_image
    from flowonthego_tpu.io.flo import read_flo
    from flowonthego_tpu.utils.metrics import average_epe

    make_step = _make_step
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

    # ---- benchmark breadth extras, each in its OWN SUBPROCESS ----
    # (op 4: ps=12, 128 GD iterations; op 1: no var-ref, 16 iters — they
    # exercise the fused-GN/var-ref gates differently than op 2; 1080p is
    # the reference's bundled road_HD frame; 4streams is the per-chip unit
    # of the multi-chip streamed-video program, parallel/multistream.py.)
    # Isolation: one faulted kernel or pathological compile costs ONE
    # metric, never the rest (round 3 lost op4/1080p/multistream to the
    # op-3 fault because a faulted worker poisons the shared client).
    # Budget: first-ever compiles over the tunnel cost minutes; the
    # persistent compile cache makes later runs fast.  A wedged TPU
    # worker also blocks LATER extras' clients, so each subprocess gets a
    # timeout and the overall deadline still applies.
    import subprocess
    deadline = (time.monotonic()
                + float(os.environ.get("FOT_BENCH_BUDGET_S", "1500")))
    per_extra = float(os.environ.get("FOT_BENCH_EXTRA_TIMEOUT_S", "540"))

    def run_extra(key, name):
        budget = min(per_extra, deadline - time.monotonic())
        if budget < 60:
            results[key] = -1.0
            print(f"# extra {name} skipped: bench budget exhausted",
                  file=sys.stderr)
            return
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run-extra", name],
                capture_output=True, text=True, timeout=budget)
            line = next((ln for ln in proc.stdout.splitlines()
                         if ln.startswith("EXTRA ")), None)
            if proc.returncode == 0 and line is not None:
                results[key] = float(line.split()[1])
                return
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-1:]
            print(f"# extra {name} failed: rc={proc.returncode} "
                  f"{tail[0][:120] if tail else ''}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# extra {name} timed out after {budget:.0f}s",
                  file=sys.stderr)
        results[key] = -1.0

    for op in (1, 3, 4):
        run_extra(f"ms_1024x436_op{op}", f"op{op}")
    run_extra("ms_1080p", "1080p")
    results["fps_1080p"] = 1000.0 / results["ms_1080p"] if \
        results["ms_1080p"] > 0 else -1.0
    run_extra("ms_1024x436_4streams", "4streams")
    results["fps_1024x436_agg4"] = 4000.0 / results["ms_1024x436_4streams"] \
        if results["ms_1024x436_4streams"] > 0 else -1.0
    run_extra("ms_4k_u8", "4k_u8")

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
        "ms_4k_u8": round(results["ms_4k_u8"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--run-extra":
        print(f"EXTRA {run_extra_task(sys.argv[2])}")
        sys.exit(0)
    sys.exit(main())
