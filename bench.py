"""Benchmark: 4K baseline-JPEG decode throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}

Headline metric (BASELINE.json): frames/s/chip on 4K baseline JPEG decode.
``vs_baseline`` is measured against single-threaded libjpeg (PIL) on the same
machine — a *stronger* baseline than the reference Rust decoder (naive O(d^4)
IDCT, linear-scan Huffman; no published numbers, see BASELINE.md).

Stages benchmarked:
- device: coefficient->RGB fused pipeline (dequant+unzigzag+IDCT matmul,
  assembly, upsample, color) on the TPU chip.
- e2e: adds host entropy decode (threaded C++ runtime) when built.

All diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compile cache — remote compiles through the axon
    tunnel take minutes; cache them across bench runs."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def median3(measure, reps=3):
    """Median of ``reps`` runs of a measurement callable returning fps.

    Host-side rates on this shared 4-core VM swing ±20-30% run-to-run
    (VERDICT r2 weak #8); the median makes BENCH_r{N} artifacts comparable
    across rounds without hiding sustained regressions the way min would.
    """
    import statistics

    return statistics.median(measure() for _ in range(reps))


def make_4k_jpeg(quality=85, restart_rows=1):
    """Synthetic 3840x2160 photo-like JPEG (restart_rows=0 -> no markers)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    h, w = 2160, 3840
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            128 + 80 * np.sin(xx / 97.0) * np.cos(yy / 71.0),
            128 + 80 * np.sin(xx / 53.0 + 1.0) * np.cos(yy / 113.0),
            128 + 80 * np.sin(xx / 151.0 + 2.0) * np.cos(yy / 41.0),
        ],
        axis=-1,
    )
    img += rng.normal(0, 6.0, img.shape)
    img = np.clip(img, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    kw = {"restart_marker_rows": restart_rows} if restart_rows else {}
    Image.fromarray(img).save(buf, "JPEG", quality=quality, **kw)
    return buf.getvalue()


def bench_libjpeg(data, iters=8):
    from PIL import Image

    # warmup
    Image.open(io.BytesIO(data)).convert("RGB")
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    dt = (time.perf_counter() - t0) / iters
    return 1.0 / dt


def bench_libjpeg_allcore(data, iters=24):
    """ALL-core libjpeg (PIL) corpus-mode decode: the multi-thread anchor
    (VERDICT r4 item 2). A single-thread calibration cannot normalize
    multi-thread contention on this shared VM — r3->r4 the 1-thread
    number halved while normalized host ratios swung 13-21x — so
    cross-round comparisons quote this denominator: the strongest thing
    libjpeg can do with the same whole host."""
    from concurrent.futures import ThreadPoolExecutor

    from PIL import Image

    n = os.cpu_count() or 1

    def one(_):
        np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))

    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(one, range(n)))  # warmup
        t0 = time.perf_counter()
        list(ex.map(one, range(iters)))
        return iters / (time.perf_counter() - t0)


def bench_cpu_work_unit():
    """Fixed synthetic single-thread CPU work unit: SHA-256 over 64 MB,
    in MB/s. A mood denominator independent of libjpeg build, PIL
    version, or this repo's own code — lets any two artifacts be
    compared even if the jpeg baselines change (VERDICT r4 item 2)."""
    import hashlib

    buf = bytes(16 << 20)
    hashlib.sha256(buf).digest()  # warm
    t0 = time.perf_counter()
    for _ in range(4):
        hashlib.sha256(buf).digest()
    return 64.0 / (time.perf_counter() - t0)


def bench_encode_4k(img, iters=4):
    """frames/s of the full 4K encoder (host C++ parallel segment pack +
    NumPy forward DCT twin) — the component existed in three tiers with
    zero perf evidence (VERDICT r4 missing item 4). Returns
    (single_fps, corpus_fps): single-image latency (threaded-BLAS GEMMs
    for color convert + forward DCT) and the all-core corpus-mode shape
    (one frame per worker — profile after the r5 GEMM/np.take rework:
    ~0.29 s transform + ~0.10 s C++ pack per 4K frame)."""
    from concurrent.futures import ThreadPoolExecutor

    from jpeg_tpu.models.encoder import encode_rgb

    def one(_=None):
        encode_rgb(img, quality=85, restart_interval_mcus=16)

    one()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one()
    single = iters / (time.perf_counter() - t0)
    n = os.cpu_count() or 1
    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(one, range(n)))  # warmup
        t0 = time.perf_counter()
        list(ex.map(one, range(2 * n)))
        corpus = 2 * n / (time.perf_counter() - t0)
    return single, corpus


def _dispatch_latency():
    """One synchronous trivial-jit round trip (tunnel/dispatch overhead)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.int32)
    int(f(x)[0])  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(5):
        int(f(x)[0])
    return (time.perf_counter() - t0) / 5



def _timed(loop, args):
    t0 = time.perf_counter()
    int(loop(*args))
    return time.perf_counter() - t0


def bench_device_pipeline(plan, planes, iters=32):
    """Steady-state frames/s of the fused Pallas plane-decode kernel.

    Runs ``iters`` dependency-chained kernel invocations inside ONE device
    dispatch (lax.fori_loop) and ends with a full reduction, so async dispatch
    and the axon tunnel latency cannot fake throughput; the single dispatch
    round trip is measured separately and subtracted.
    """
    import jax
    import jax.numpy as jnp

    from jpeg_tpu.models.decoder import PipelineGeometry
    from jpeg_tpu.ops.pallas_kernels import (
        fused_plane_decoder,
        plan_quant_patterns,
    )

    geom = PipelineGeometry.of(plan)
    fn = fused_plane_decoder(geom, "truncate")
    args = [jnp.asarray(p) for p in planes] + [
        jnp.asarray(q) for q in plan_quant_patterns(plan, geom)
    ]

    def make_loop(n):
        @jax.jit
        def loop(p0, *rest):
            def body(i, acc):
                # acc feedback makes every iteration data-dependent.
                out = fn(p0 + (acc % 2).astype(jnp.int16), *rest)
                return acc + out.astype(jnp.int32)[0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    # Differential timing: the tunnel round-trip latency varies by tens of
    # ms between dispatches, which swamps a ~16ms compute when subtracted
    # directly. Timing loops of N and 3N iterations cancels the latency.
    short, long_ = make_loop(iters), make_loop(3 * iters)
    int(short(*args))
    int(long_(*args))  # compile + warmup both
    t1 = min(_timed(short, args) for _ in range(2))
    t3 = min(_timed(long_, args) for _ in range(2))
    dt = max(t3 - t1, 1e-9) / (2 * iters) * iters
    frames_per_s = iters / dt
    blocks_per_s = frames_per_s * geom.total_blocks

    # Speed-of-light fraction: the kernel's minimum HBM traffic per frame is
    # one read of the int16 coefficient planes + one write of the padded
    # planar u8 output (v5e HBM ~819 GB/s).
    from jpeg_tpu.ops.pallas_kernels import padded_plane_shapes

    shapes = padded_plane_shapes(geom)
    bytes_in = sum(r * c * 2 for r, c in shapes)
    bytes_out = 3 * shapes[0][0] * shapes[0][1]
    sol_fps = 819e9 / (bytes_in + bytes_out)
    return frames_per_s, blocks_per_s, frames_per_s / sol_fps


def bench_idct_roofline(iters=64):
    """Pure dequant+IDCT blocks/s vs HBM speed of light (north-star metric).

    A [4096, 3840] int16 coefficient plane (368640 8x8 blocks) through the
    bare IDCT kernel; SOL = HBM_BW / (2B in + 4B out per pixel).
    """
    import jax
    import jax.numpy as jnp

    from jpeg_tpu.ops.pallas_kernels import idct_only_kernel, quant_pattern

    rows, cols = 4096, 3840
    fn = idct_only_kernel(rows, cols)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-512, 512, (rows, cols)).astype(np.int16))
    qp = jnp.asarray(quant_pattern(np.arange(1, 65), 128, 256))

    def make_loop(n):
        @jax.jit
        def loop(x, qp):
            def body(i, acc):
                out = fn(x + (acc % 2).astype(jnp.int16), qp)
                return acc + out.astype(jnp.int32)[0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    short, long_ = make_loop(iters), make_loop(3 * iters)
    int(short(x, qp))
    int(long_(x, qp))
    t1 = min(_timed(short, (x, qp)) for _ in range(2))
    t3 = min(_timed(long_, (x, qp)) for _ in range(2))
    dt = max(t3 - t1, 1e-9) / 2
    n_blocks = rows * cols // 64
    blocks_per_s = n_blocks * iters / dt
    sol_blocks = 819e9 / (64 * 6)  # 6 bytes/pixel minimum traffic
    return blocks_per_s, blocks_per_s / sol_blocks


def bench_host_entropy(plan, iters=10):
    """frames/s of the threaded C++ plane-entropy decoder (None if absent)."""
    try:
        from jpeg_tpu.runtime import native_decode_planes
    except (ImportError, OSError):
        return None
    native_decode_planes(plan)  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        native_decode_planes(plan)
    return iters / (time.perf_counter() - t0)


def bench_host_entropy_corpus(plan, iters=24):
    """Corpus-mode entropy rate: one single-threaded decode per worker, all
    cores busy on different frames (the pipelined-corpus deployment shape —
    scales with host cores, which on real TPU hosts outnumber this VM's 4).

    Workers keep per-thread plane buffers (reuse_buffer=True; keyed by
    thread ident) with the C++ bulk prezero: fresh 25MB np.zeros per frame
    costs 4-10x the decode itself in mmap/page-fault/TLB churn across
    threads (measured 16-50 fps vs ~220 fps on this VM)."""
    from concurrent.futures import ThreadPoolExecutor

    from jpeg_tpu.runtime import native_decode_planes

    n = os.cpu_count() or 1

    def one(_):
        native_decode_planes(plan, n_threads=1)

    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(one, range(2 * n)))  # warmup incl. buffer allocation
        t0 = time.perf_counter()
        list(ex.map(one, range(iters)))
        return iters / (time.perf_counter() - t0)


def bench_corpus_1080p(n_images=8, iters=2):
    """BASELINE config 4: batched 1080p corpus with restart-parallel Huffman.

    Host entropy via corpus-mode workers; device via the batched (vmap)
    fused kernel, dependency-chained. Reports the stage rates; steady-state
    corpus fps = min(stages) with the stages overlapped in production.
    """
    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.io.corpus import synthetic_jpeg
    from jpeg_tpu.models.decoder import PipelineGeometry
    from jpeg_tpu.ops.pallas_kernels import (
        fused_plane_decoder,
        plan_quant_patterns,
    )
    from jpeg_tpu.runtime import native_decode_planes

    datas = [synthetic_jpeg(1920, 1080, seed=i) for i in range(n_images)]
    plans = [parse_jpeg(d) for d in datas]
    geom = PipelineGeometry.of(plans[0])

    # Host entropy, one worker per image (per-thread reused buffers: all
    # plans share one geometry, so the thread-keyed buffer cache hits).
    def one(p):
        native_decode_planes(p, n_threads=1)

    with ThreadPoolExecutor(max_workers=os.cpu_count() or 1) as ex:
        list(ex.map(one, plans))  # warmup
        list(ex.map(one, plans))
        t0 = time.perf_counter()
        for _ in range(iters):
            list(ex.map(one, plans))
        entropy_fps = n_images * iters / (time.perf_counter() - t0)

    # Device: batched fused kernel.
    planes = [np.asarray(p) for p in native_decode_planes(plans[0])]
    qpats = plan_quant_patterns(plans[0], geom)
    bp = [jnp.asarray(np.broadcast_to(p, (n_images,) + p.shape).copy())
          for p in planes]
    bq = [jnp.asarray(np.broadcast_to(q, (n_images,) + q.shape).copy())
          for q in qpats]
    fn = jax.vmap(fused_plane_decoder(geom, "truncate"))
    reps = 8

    def mk(n):
        @jax.jit
        def loop(p0, *rest):
            def body(i, acc):
                out = fn(p0 + (acc % 2).astype(jnp.int16), *rest)
                return acc + out.astype(jnp.int32)[0, 0, 0, 0]
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    short, long_ = mk(reps), mk(3 * reps)
    args = (*bp, *bq)
    int(short(*args))
    int(long_(*args))
    t1 = min(_timed(short, args) for _ in range(2))
    t3 = min(_timed(long_, args) for _ in range(2))
    dev_fps = n_images * 2 * reps / max(t3 - t1, 1e-9)
    return entropy_fps, dev_fps



def bench_e2e_overlapped(plan, planes, n_frames=48):
    """MEASURED steady-state overlap (VERDICT r1 item 1b): host entropy
    workers and the device pipeline decode the same number of frames
    CONCURRENTLY; e2e = frames / wall-clock of the slower side, including
    all host<->device contention (GIL, dispatch thread, memory bandwidth).

    Transfers are excluded by necessity of this environment: the axon
    tunnel moves H2D at ~20-50 MB/s (measured), which would measure the
    tunnel, not the design. On a real TPU host PCIe adds ~1 ms per 4K
    frame of int16 planes — below the entropy stage time at 4 cores.
    """
    import threading

    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    from jpeg_tpu.models.decoder import PipelineGeometry
    from jpeg_tpu.ops.pallas_kernels import (
        fused_plane_decoder,
        plan_quant_patterns,
    )
    from jpeg_tpu.runtime import native_decode_planes

    geom = PipelineGeometry.of(plan)
    fn = fused_plane_decoder(geom, "truncate")
    args = [jnp.asarray(p) for p in planes] + [
        jnp.asarray(q) for q in plan_quant_patterns(plan, geom)
    ]

    @jax.jit
    def loop(p0, *rest):
        def body(i, acc):
            out = fn(p0 + (acc % 2).astype(jnp.int16), *rest)
            return acc + out.astype(jnp.int32)[0, 0, 0]
        return jax.lax.fori_loop(0, n_frames, body, jnp.int32(0))

    int(loop(*args))  # compile + warmup
    n_workers = os.cpu_count() or 1

    def host_side():
        def one(_):
            native_decode_planes(plan, n_threads=1)
        with ThreadPoolExecutor(max_workers=n_workers) as ex:
            list(ex.map(one, range(n_frames)))

    t0 = time.perf_counter()
    dev_thread = threading.Thread(target=lambda: int(loop(*args)))
    dev_thread.start()
    host_side()
    dev_thread.join()
    wall = time.perf_counter() - t0
    return n_frames / wall


def bench_e2e_hybrid(plan, planes, n_frames=192, dev_batch=None,
                     idct_mode="exact"):
    """Cooperative host+device entropy (round-4 ladder rung, round-5
    windowed tier): host workers and the v5 WINDOWED in-kernel batch
    tier (entropy/device_window.py — 2.5x the v4 resident-word kernel at
    equal batch and no VMEM wall) claim DISJOINT frames from one shared
    counter while the device pixel pipeline covers every frame — the
    ~85-90% of chip time that e2e_overlapped leaves idle becomes entropy
    throughput instead of sitting dark. Device claims whole batches (one
    dispatch each: the K-launch chain is one jit) and stops claiming
    near the tail so a straggling chain cannot extend the wall past the
    host side. Same transfer-exclusion contract as bench_e2e_overlapped.
    dev_batch=None auto-sizes the device claim to the VMEM budget from
    the plan geometry (suggest_window_batch). Host workers = all cores:
    an r5 A/B of 3 vs 4 workers on the 4-core VM measured 4 winning
    every pair (318/328 vs 245/305 fps) — the GIL-released C++ decode
    outweighs contention with the dispatch/device threads. Returns
    (fps, device_frames, dev_batch)."""
    import threading

    import jax
    import jax.numpy as jnp
    from concurrent.futures import ThreadPoolExecutor

    from jpeg_tpu.entropy.device_window import (
        suggest_window_batch,
        window_runner_batch,
    )
    from jpeg_tpu.models.decoder import PipelineGeometry
    from jpeg_tpu.ops.pallas_kernels import (
        fused_plane_decoder,
        plan_quant_patterns,
    )
    from jpeg_tpu.runtime import native_decode_planes

    geom = PipelineGeometry.of(plan)
    fn = fused_plane_decoder(geom, "truncate", False, idct_mode)
    args = [jnp.asarray(p) for p in planes] + [
        jnp.asarray(q) for q in plan_quant_patterns(plan, geom)
    ]

    @jax.jit
    def loop(p0, *rest):
        def body(i, acc):
            out = fn(p0 + (acc % 2).astype(jnp.int16), *rest)
            return acc + out.astype(jnp.int32)[0, 0, 0]
        return jax.lax.fori_loop(0, n_frames, body, jnp.int32(0))

    if dev_batch is None:
        dev_batch = suggest_window_batch(plan)
    kernel, kargs, _meta = window_runner_batch(
        [plan] * dev_batch, gather="mxu")

    @jax.jit
    def dev_entropy(*a):
        out, st = kernel(*a)
        return out.astype(jnp.float32).sum(), st.sum()

    int(loop(*args))  # compile + warmup (pipeline)
    s, _ = dev_entropy(*kargs)
    float(s)  # compile + warmup (entropy batch)

    lock = threading.Lock()
    state = {"left": n_frames, "dev": 0}

    def claim(k, guard=0):
        with lock:
            if state["left"] >= k + guard:
                state["left"] -= k
                return True
            return False

    def host_worker():
        while claim(1):
            native_decode_planes(plan, n_threads=1)

    def dev_side():
        # Keep ONE launch in flight (jax async dispatch): the tunnel's
        # dispatch+sync gap is ~27 ms/launch — pipelining measured +36%
        # device entropy (tools/probe_launch_pipelining.py: 4K batch-6
        # 59.5 -> 80.8 fps). Tail guard grows by one batch to cover the
        # in-flight launch: up to two straggler launches must not
        # outlive the host side's remaining guard frames.
        infl = None

        def retire(handle):
            float(handle)
            with lock:
                state["dev"] += dev_batch

        while claim(dev_batch, guard=3 * dev_batch):
            nxt = dev_entropy(*kargs)[0]
            if infl is not None:
                retire(infl)
            infl = nxt
        if infl is not None:
            retire(infl)

    n_workers = os.cpu_count() or 1
    t0 = time.perf_counter()
    pipe_thread = threading.Thread(target=lambda: int(loop(*args)))
    ent_thread = threading.Thread(target=dev_side)
    pipe_thread.start()
    ent_thread.start()
    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        for _ in range(n_workers):
            ex.submit(host_worker)
    ent_thread.join()
    pipe_thread.join()
    wall = time.perf_counter() - t0
    return n_frames / wall, state["dev"], dev_batch


def bench_device_entropy_batched(n_images=32, width=1920, height=1080):
    """Lane-batched device entropy decode of a homogeneous corpus
    (VERDICT r1 item 1a): all images' restart segments on the lane axis.
    Returns (fps, n_lanes) — the measured basis for the
    device_path_profitable gate."""
    import jax

    from jpeg_tpu.entropy.device_decode import (
        decode_coefficients_device_batch,
    )
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.io.corpus import synthetic_jpeg

    from jpeg_tpu.entropy.device_decode2 import (
        decode_coefficients_device2_batch,
    )

    plans = [parse_jpeg(synthetic_jpeg(width, height, seed=i))
             for i in range(n_images)]
    n_lanes = sum(len(p.segments) for p in plans)
    best = 0.0
    for fn in (decode_coefficients_device_batch,
               decode_coefficients_device2_batch):
        outs, err = fn(plans)  # compile + warmup
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        outs, err = fn(plans)
        # Force real completion through the tunnel: tiny D2H reduction.
        checksum = int(sum(
            jax.numpy.sum(o.astype(jax.numpy.float64)) for o in outs))
        wall = time.perf_counter() - t0
        del checksum
        best = max(best, n_images / wall)
    return best, n_lanes


def bench_device_entropy_window(n_images=None, width=3840, height=2160,
                                gather="mxu", w_chunk=512, iters=3):
    """The v5 WINDOWED in-kernel entropy decoder on a homogeneous corpus
    batch (entropy/device_window.py): lane words streamed from HBM in
    per-lane-re-based windows, the whole K-launch chain one jit. Batch
    auto-sized to the VMEM budget (past the v4 resident-word wall).
    Dependency-chained differential timing. Returns (fps, batch, lanes,
    K, G)."""
    import jax
    import jax.numpy as jnp

    from jpeg_tpu.entropy.device_window import (
        suggest_window_batch,
        window_runner_batch,
    )
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.io.corpus import synthetic_jpeg

    p0 = parse_jpeg(synthetic_jpeg(width, height, restart_rows=1, seed=0))
    if n_images is None:
        n_images = suggest_window_batch(p0, w_chunk=w_chunk)
    plans = [p0] + [
        parse_jpeg(synthetic_jpeg(width, height, restart_rows=1, seed=i))
        for i in range(1, n_images)]
    run, args, (mm, S, lb, be, K, G) = window_runner_batch(
        plans, gather=gather, w_chunk=w_chunk)
    args = [jnp.asarray(a) for a in args]

    def mk(n):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                out, st = run(a[0], a[1], a[2], a[3] + (acc % 2))
                return acc + st.astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    short, long_ = mk(iters), mk(3 * iters)
    int(short(*args))
    int(long_(*args))
    t1 = min(_timed(short, args) for _ in range(2))
    t3 = min(_timed(long_, args) for _ in range(2))
    dt = max(t3 - t1, 1e-9) / (2 * iters)
    return n_images / dt, n_images, S, K, G


def bench_device_entropy_inkernel(plan, gather="mxu", reps=3):
    """The v4 IN-KERNEL entropy decoder (entropy/device_kernel.py): the
    whole lockstep MCU loop inside ONE Pallas kernel, so the ~25-40 us
    per-XLA-step dispatch tax is paid once per frame (VERDICT r3 missing
    item 1 asked for this measured number). Kernel-only timing with a
    scalar-reduction D2H (the full [blocks, 64] output is ~50 MB, which
    would measure the tunnel)."""
    import jax
    import jax.numpy as jnp

    from jpeg_tpu.entropy.device_kernel import kernel_runner

    kernel, args, max_mcus, S = kernel_runner(plan, gather=gather)

    @jax.jit
    def run(*a):
        out, err = kernel(*a)
        return out.astype(jnp.float32).sum(), err.sum()

    s, e = run(*args)
    float(s)  # compile + warm; forces real completion through the tunnel
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, _ = run(*args)
        float(s)
        times.append(time.perf_counter() - t0)
    return 1.0 / min(times), S, int(e)


def device_stage(plan_bytes_file, planes_ready):
    """Child-process entry: all TPU-touching benches. Emits one JSON dict
    on stdout. Isolated in a subprocess because the axon tunnel can hang a
    compile indefinitely — the parent kills us on timeout and still emits
    the host-side metrics."""
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.runtime import native_decode_planes

    with open(plan_bytes_file, "rb") as f:
        data = f.read()
    plan = parse_jpeg(data)
    planes = native_decode_planes(plan)
    out = {}
    # Measured tunnel H2D rate: documents WHY transfers are excluded from
    # the e2e overlap (BASELINE.md honesty note) with a number instead of
    # an assertion. Real PCIe hosts move the same planes in ~1 ms.
    try:
        import jax.numpy as _jnph
        import numpy as _nph
        import time as _th

        # block_until_ready lies through the tunnel; force completion
        # with a D2H checksum and subtract the resident-array baseline.
        _buf = _nph.zeros((4 << 20,), _nph.uint8)
        _res = _jnph.asarray(_buf)
        float(_jnph.sum(_res.astype(_jnph.int32)))  # warm both paths
        _t0 = _th.perf_counter()
        float(_jnph.sum(_res.astype(_jnph.int32)))
        _base = _th.perf_counter() - _t0
        _t0 = _th.perf_counter()
        float(_jnph.sum(_jnph.asarray(_buf).astype(_jnph.int32)))
        _dt = max(_th.perf_counter() - _t0 - _base, 1e-6)
        out["tunnel_h2d_mb_s"] = round(4.0 / _dt, 1)
        log(f"tunnel H2D: {out['tunnel_h2d_mb_s']} MB/s (4MB probe) — "
            "why e2e excludes transfers; real PCIe ~1ms/4K frame")
    except Exception:  # noqa: BLE001 — diagnostic only
        pass
    dev_fps, blocks_per_s, sol_frac = bench_device_pipeline(plan, planes)
    out["device_pipeline_fps"] = round(dev_fps, 2)
    out["idct_blocks_per_s"] = round(blocks_per_s)
    out["device_sol_fraction"] = round(sol_frac, 4)
    log(f"device pipeline: {dev_fps:.1f} frames/s, "
        f"{blocks_per_s/1e9:.2f} Gblocks/s, {sol_frac:.1%} of HBM SOL")
    idct_bps, idct_sol = bench_idct_roofline()
    out["idct_only_blocks_per_s"] = round(idct_bps)
    out["idct_only_sol_fraction"] = round(idct_sol, 4)
    log(f"bare IDCT: {idct_bps/1e9:.2f} Gblocks/s, {idct_sol:.1%} of SOL")
    e2e = bench_e2e_overlapped(plan, planes)
    out["e2e_overlapped_fps"] = round(e2e, 2)
    log(f"e2e overlapped (measured): {e2e:.1f} frames/s")
    try:
        # 384 frames: with batch-18 device claims and a 3-batch tail
        # guard, 192 frames quantizes the device share coarsely (the
        # guard alone is 28% of the run); the longer run measures the
        # steady state (same rationale as the 1080p rung's 512).
        hyb, dev_frames, hyb_batch = bench_e2e_hybrid(plan, planes,
                                                      n_frames=384)
        out["e2e_hybrid_fps"] = round(hyb, 2)
        out["e2e_hybrid_device_frames"] = dev_frames
        out["e2e_hybrid_device_batch"] = hyb_batch
        log(f"e2e hybrid host+device entropy: {hyb:.1f} frames/s "
            f"(device decoded {dev_frames} frames' entropy, "
            f"auto batch {hyb_batch})")
    except Exception as e:  # noqa: BLE001 — diagnostic rung, never fatal
        log(f"e2e hybrid: failed ({type(e).__name__}: {e})")
    # Approx-IDCT tier (JDCT_IFAST analogue, idct_mode="approx").
    try:
        import jax as _jax
        import jax.numpy as _jnp

        from jpeg_tpu.models.decoder import PipelineGeometry as _PG
        from jpeg_tpu.ops.pallas_kernels import (
            fused_plane_decoder as _fpd,
            plan_quant_patterns as _pqp,
        )

        _geom = _PG.of(plan)
        _fn = _fpd(_geom, "truncate", False, "approx")
        _args = [_jnp.asarray(p) for p in planes] + [
            _jnp.asarray(q) for q in _pqp(plan, _geom)]
        _iters = 32

        def _mk(n):
            @_jax.jit
            def _loop(p0, *rest):
                def body(i, acc):
                    o = _fn(p0 + (acc % 2).astype(_jnp.int16), *rest)
                    return acc + o.astype(_jnp.int32)[0, 0, 0]
                return _jax.lax.fori_loop(0, n, body, _jnp.int32(0))
            return _loop

        _s, _l = _mk(_iters), _mk(3 * _iters)
        int(_s(*_args))
        int(_l(*_args))
        _t1 = min(_timed(_s, _args) for _ in range(2))
        _t3 = min(_timed(_l, _args) for _ in range(2))
        _fps = 2 * _iters / max(_t3 - _t1, 1e-9)
        out["device_pipeline_approx_fps"] = round(_fps, 2)
        log(f"device pipeline (approx IDCT): {_fps:.1f} frames/s")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"approx pipeline: failed ({type(e).__name__}: {e})")
    # Device forward (encode) kernel: color+downsample+FDCT+quant fused
    # Pallas kernel, dependency-chained (VERDICT r4 missing item 4 —
    # encoder perf evidence). Kernel-only: the C++ pack half is timed
    # host-side as encode_4k_fps.
    try:
        import jax as _jaxe
        import jax.numpy as _jnpe

        from jpeg_tpu.models.decoder import PipelineGeometry as _PGe
        from jpeg_tpu.ops.pallas_kernels import (
            fused_plane_encoder as _fpe,
            padded_plane_shapes as _ppse,
            plan_inv_quant_patterns as _piqe,
        )

        _geome = _PGe.of(plan)
        _h, _w = _ppse(_geome)[0]
        _rng = np.random.default_rng(1)
        _rgbp = _jnpe.asarray(
            _rng.integers(0, 256, (3, _h, _w), dtype=np.uint8))
        _cq = [plan.quant_tables[c.quant_id].astype(np.int32)
               for c in plan.components]
        _iq = [_jnpe.asarray(q) for q in _piqe(_cq, _geome)]
        _efn = _fpe(_geome)
        _eiters = 32

        def _mke(n):
            @_jaxe.jit
            def _loop(x, *rest):
                def body(i, acc):
                    o = _efn(x + (acc % 2).astype(_jnpe.uint8), *rest)
                    return acc + o[0].astype(_jnpe.int32)[0, 0]
                return _jaxe.lax.fori_loop(0, n, body, _jnpe.int32(0))
            return _loop

        _se, _le = _mke(_eiters), _mke(3 * _eiters)
        _ea = (_rgbp, *_iq)
        int(_se(*_ea))
        int(_le(*_ea))
        _t1 = min(_timed(_se, _ea) for _ in range(2))
        _t3 = min(_timed(_le, _ea) for _ in range(2))
        _efps = 2 * _eiters / max(_t3 - _t1, 1e-9)
        out["encode_4k_device_kernel_fps"] = round(_efps, 2)
        log(f"device encode kernel (fwd DCT+quant): {_efps:.1f} frames/s")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"device encode kernel: failed ({type(e).__name__}: {e})")
    c1080_entropy, c1080_dev = bench_corpus_1080p()
    out["corpus_1080p_entropy_fps"] = round(c1080_entropy, 2)
    out["corpus_1080p_device_fps"] = round(c1080_dev, 2)
    log(f"1080p corpus: entropy {c1080_entropy:.1f} fps, "
        f"batched device {c1080_dev:.1f} fps")
    # 1080p hybrid corpus (ROADMAP r4 lever): at 1080p the in-kernel
    # device tier is ~30-50% of the 4-core host rate by itself, so the
    # cooperative split matters even more than at 4K. Same contract as
    # the 4K e2e hybrid (pipeline covers every frame, host + device
    # claim disjoint frames' entropy).
    try:
        from jpeg_tpu.io.corpus import synthetic_jpeg as _sj

        _p1080 = parse_jpeg(_sj(1920, 1080, seed=0))
        _pl1080 = [np.asarray(p) for p in native_decode_planes(_p1080)]
        # 512 frames ~ 0.5 s wall: at 1080p a device claim is only ~41 ms,
        # so a short run is tail-guard-dominated (256 frames gave the
        # device 3 claims); steady state needs the longer run.
        hyb1080, dev1080, b1080 = bench_e2e_hybrid(
            _p1080, _pl1080, n_frames=512)
        out["corpus_1080p_hybrid_fps"] = round(hyb1080, 2)
        out["corpus_1080p_hybrid_device_frames"] = dev1080
        out["corpus_1080p_hybrid_device_batch"] = b1080
        log(f"1080p hybrid host+device entropy: {hyb1080:.1f} frames/s "
            f"(device decoded {dev1080} frames' entropy, "
            f"auto batch {b1080})")
        # Approx-IDCT tier of the same route (opt-in production config:
        # corpus --idct approx). Quality gate measured on-chip in
        # docs/APPROX_QUALITY.md (VERDICT r4 item 4).
        hyb1080a, dev1080a, _ = bench_e2e_hybrid(
            _p1080, _pl1080, n_frames=512, idct_mode="approx")
        out["corpus_1080p_hybrid_approx_fps"] = round(hyb1080a, 2)
        log(f"1080p hybrid (approx IDCT): {hyb1080a:.1f} frames/s "
            f"(device decoded {dev1080a} frames' entropy)")
    except Exception as e:  # noqa: BLE001 — diagnostic rung, never fatal
        log(f"1080p hybrid: failed ({type(e).__name__}: {e})")
    # Sharded-Mosaic smoke (VERDICT r1 weak #7): run the batched fused
    # kernel under an explicit NamedSharding on a real-device mesh (1 chip
    # here; the same code path the 8-device CPU dryrun compiles). Proves
    # the sharding machinery + Mosaic lowering execute together on TPU.
    try:
        import jax as _jax
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        from jpeg_tpu.models.decoder import PipelineGeometry as _PG2
        from jpeg_tpu.ops.pallas_kernels import plan_quant_patterns as _pqp2
        from jpeg_tpu.parallel.batch import decode_batch_fast as _dbf

        _geom2 = _PG2.of(plan)
        _mesh = _Mesh(_np.array(_jax.devices()[:1]), ("data",))
        _bp = [_np.broadcast_to(_np.asarray(p), (1,) + _np.asarray(p).shape)
               for p in planes]
        _bq = [_np.broadcast_to(q, (1,) + q.shape)
               for q in _pqp2(plan, _geom2)]
        _out = _dbf(_bp, _bq, _geom2, mesh=_mesh, interpret=False)
        _jax.block_until_ready(_out)
        out["sharded_mosaic_smoke"] = "ok"
        log("sharded Mosaic smoke (NamedSharding on TPU mesh): ok")
    except Exception as e:  # noqa: BLE001 — diagnostic
        out["sharded_mosaic_smoke"] = f"{type(e).__name__}: {e}"[:120]
        log(f"sharded Mosaic smoke FAILED: {type(e).__name__}: {e}")
    try:
        dev_ent_fps, dev_ent_lanes = bench_device_entropy_batched()
        out["device_entropy_batched_fps"] = round(dev_ent_fps, 2)
        out["device_entropy_batched_lanes"] = dev_ent_lanes
        log(f"device entropy batched: {dev_ent_fps:.2f} fps "
            f"({dev_ent_lanes} lanes, 1080p x32 — lane count swept: "
            f"544 lanes 31.7, 1088 31.3, 2176 43.7 fps)")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"device entropy batched: failed ({type(e).__name__}: {e})")
        out["device_entropy_batched_fps"] = 0.0
        out["device_entropy_batched_lanes"] = 0
    # Windowed in-kernel tier (v5): the 4K corpus batch number past the
    # v4 VMEM wall. The r4 rungs this replaces, with their conclusions
    # (VERDICT r4 item 9 — keep the ladder in prose, stop re-timing dead
    # tiers every run): single-image v4 in-kernel was lane-starved at
    # S=135 (17-19 fps vs 156 host — a 4K image has too few restart
    # segments for the lockstep design); the speculative chunk-lane
    # device tier measured 1.4-2.8 fps across r3/r4 (gate says never).
    try:
        w5_fps, w5_batch, w5_lanes, w5_k, w5_g = bench_device_entropy_window()
        out["device_entropy_window_4k_fps"] = round(w5_fps, 2)
        out["device_entropy_window_4k_batch"] = w5_batch
        out["device_entropy_window_4k_lanes"] = w5_lanes
        log(f"device entropy WINDOWED (v5, mxu): {w5_fps:.2f} fps "
            f"(4K batch {w5_batch}, {w5_lanes} lanes, K={w5_k} launches "
            f"x G={w5_g} MCUs, one jit)")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"device entropy windowed: failed ({type(e).__name__}: {e})")
        out["device_entropy_window_4k_fps"] = 0.0
    print(json.dumps(out), flush=True)


def _run_device_stage(data, timeout_s=560):
    """Spawn the device benches in a killable child (tunnel hangs happen);
    returns the metrics dict, or {} on timeout/failure."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(data)
        path = f.name
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-stage",
             path],
            capture_output=True, text=True, timeout=timeout_s)
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            log(f"device stage failed rc={proc.returncode}")
            return {}
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        log(f"device stage timed out after {timeout_s}s (tunnel hang?)")
        return {}
    finally:
        os.unlink(path)


def main():
    data = make_4k_jpeg()
    log(f"4K jpeg: {len(data)/1e6:.2f} MB")

    from jpeg_tpu.io.container import parse_jpeg

    plan = parse_jpeg(data)
    log(f"plan: {plan.width}x{plan.height}, {len(plan.segments)} segments, "
        f"{plan.total_blocks} blocks")
    from PIL import Image as _ImgM

    img4k = np.asarray(_ImgM.open(io.BytesIO(data)).convert("RGB"))

    lib_fps = median3(lambda: bench_libjpeg(data))
    lib_all_fps = median3(lambda: bench_libjpeg_allcore(data))
    cpu_unit = median3(bench_cpu_work_unit)
    log(f"libjpeg single-thread: {lib_fps:.1f} frames/s; "
        f"all-core corpus-mode: {lib_all_fps:.1f} frames/s; "
        f"CPU work unit (sha256): {cpu_unit:.0f} MB/s")

    if bench_host_entropy(plan) is None:
        raise SystemExit("native runtime required for bench")
    entropy_fps = median3(lambda: bench_host_entropy(plan))

    from jpeg_tpu.runtime import native_decode_planes

    corpus_entropy_fps = median3(lambda: bench_host_entropy_corpus(plan))
    # No-restart stream: speculative self-synchronizing parallel decode.
    plan_nr = parse_jpeg(make_4k_jpeg(restart_rows=0))
    native_decode_planes(plan_nr)  # warmup

    def _spec_once():
        t0 = time.perf_counter()
        for _ in range(8):
            native_decode_planes(plan_nr)
        return 8 / (time.perf_counter() - t0)

    spec_fps = median3(_spec_once)
    # Adjudication detail (VERDICT r3 item 1): the chunk count the
    # auto-tuner locked in (possibly loaded from build/spec_tuner.json,
    # persisted across processes) + each candidate's best trial, and
    # whether the loaded .so is the profile-guided build.
    from jpeg_tpu.runtime import pgo_status, spec_tuner_snapshot

    tuner = spec_tuner_snapshot()
    spec_chunks = next(
        (st["chosen"] for st in tuner.values() if st["chosen"]), None)
    log(f"entropy: single-image {entropy_fps:.1f} fps, "
        f"corpus-mode {corpus_entropy_fps:.1f} fps, "
        f"no-restart speculative {spec_fps:.1f} fps "
        f"(chunks={spec_chunks}, pgo={pgo_status()})")
    # Lossless (SOF3, r4) 1080p: segment-parallel C++ diff decode +
    # sequential prediction (host path; predictor-1/2 device cumsum is
    # exercised by tests, not timed here).
    try:
        from jpeg_tpu.entropy.lossless import encode_lossless as _encl
        from jpeg_tpu.runtime import native_decode_lossless as _ndl

        _rngl = np.random.default_rng(3)
        _imgl = _rngl.integers(0, 256, (1080, 1920, 3), dtype=np.uint8)
        _lplan = parse_jpeg(_encl(_imgl, predictor=4,
                                  restart_interval=1920))
        _ndl(_lplan)  # warmup

        def _lossless_once():
            t0 = time.perf_counter()
            for _ in range(6):
                _ndl(_lplan)
            return 6 / (time.perf_counter() - t0)

        lossless_fps = median3(_lossless_once)
        log(f"lossless 1080p decode: {lossless_fps:.1f} fps "
            f"({len(_lplan.segments)} segments)")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"lossless bench failed: {type(e).__name__}: {e}")
        lossless_fps = 0.0
    # Arithmetic (SOF9) 4K: QM-coded entropy, restart-parallel C++.
    try:
        from jpeg_tpu.models.encoder import encode_rgb as _enc
        from jpeg_tpu.runtime import native_decode_arith_planes as _nda

        _ad = _enc(img4k, quality=85, arithmetic=True,
                   restart_interval_mcus=16)
        _aplan = parse_jpeg(_ad)
        _nda(_aplan)  # warmup

        def _arith_once():
            t0 = time.perf_counter()
            for _ in range(8):
                _nda(_aplan)
            return 8 / (time.perf_counter() - t0)

        arith_fps = median3(_arith_once)
        log(f"arithmetic 4K entropy: {arith_fps:.1f} fps "
            f"({len(_aplan.segments)} segments, {len(_ad)/1e6:.2f} MB)")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"arithmetic bench failed: {type(e).__name__}: {e}")
        arith_fps = 0.0
    # Progressive 4K (SOF2): host entropy rate (chain-parallel C++).
    import io as _io

    from PIL import Image as _Image

    from jpeg_tpu.runtime import native_decode_progressive as _ndprog

    # Same image content as the baseline 4K metric, progressive-encoded.
    _img = _Image.open(_io.BytesIO(data)).convert("RGB")
    _pb = _io.BytesIO()
    _img.save(_pb, "JPEG", quality=85, progressive=True)
    plan_prog = parse_jpeg(_pb.getvalue())
    _ndprog(plan_prog, reuse_buffer=True)  # warmup

    def _prog_once():
        t0 = time.perf_counter()
        for _ in range(4):
            _ndprog(plan_prog, reuse_buffer=True)
        return 4 / (time.perf_counter() - t0)

    prog_fps = median3(_prog_once)
    log(f"progressive 4K entropy: {prog_fps:.1f} fps "
        f"({len(plan_prog.prog_scans)} scans)")
    # Corpus-mode twins (the pipelined-corpus deployment shape): one
    # frame per worker. The single-image numbers above are latency-bound
    # by each format's critical path (progressive: the Y refinement
    # scan; arithmetic: per-segment QM chains / 4 threads); corpus mode
    # shows the throughput the same host sustains when frames overlap.
    from concurrent.futures import ThreadPoolExecutor as _TPE

    def _corpus_mode(fn, iters=12):
        n = os.cpu_count() or 1
        with _TPE(max_workers=n) as ex:
            list(ex.map(fn, range(n)))  # warmup incl. per-thread buffers
            t0 = time.perf_counter()
            list(ex.map(fn, range(iters)))
            return iters / (time.perf_counter() - t0)

    try:
        prog_corpus_fps = median3(lambda: _corpus_mode(
            lambda _i: _ndprog(plan_prog, reuse_buffer=True, n_threads=1)))
        log(f"progressive 4K corpus-mode: {prog_corpus_fps:.1f} fps")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"progressive corpus-mode failed: {type(e).__name__}: {e}")
        prog_corpus_fps = 0.0
    try:
        arith_corpus_fps = median3(lambda: _corpus_mode(
            lambda _i: _nda(_aplan, n_threads=1)))
        log(f"arithmetic 4K corpus-mode: {arith_corpus_fps:.1f} fps")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"arithmetic corpus-mode failed: {type(e).__name__}: {e}")
        arith_corpus_fps = 0.0
    # Encoder throughput (host tier; the device forward kernel is timed
    # in the device stage).
    try:
        encode_fps, encode_corpus_fps = bench_encode_4k(img4k)
        log(f"encode 4K host: single {encode_fps:.2f} fps, "
            f"corpus-mode {encode_corpus_fps:.2f} fps")
    except Exception as e:  # noqa: BLE001 — diagnostic metric only
        log(f"encode bench failed: {type(e).__name__}: {e}")
        encode_fps = encode_corpus_fps = 0.0
    # TPU benches in a killable child (tunnel hangs must not lose the
    # host metrics); measured host+device overlap is the headline when
    # available, host corpus rate otherwise.
    dev = _run_device_stage(data)
    if not dev:
        # Tunnel hangs are transient (r5 local: two clean runs, then one
        # 560 s hang, then clean again) — one retry saves the round's
        # hybrid headline instead of falling back to host-only numbers.
        log("device stage empty — retrying once (transient tunnel hang?)")
        dev = _run_device_stage(data)
    # Headline = the PRODUCTION route: hybrid host+device entropy (what
    # BatchedCorpusDecoder(hybrid_device=True) runs). No max() over
    # configs — hybrid won every r4 measurement and taking the best of
    # two rungs invites a cherry-pick reading (VERDICT r4 item 10).
    # Fallbacks only cover rungs that failed to run at all.
    e2e_fps = (dev.get("e2e_hybrid_fps")
               or dev.get("e2e_overlapped_fps") or corpus_entropy_fps)
    detail = {
        "entropy_host_fps": round(entropy_fps, 2),
        "entropy_corpus_fps": round(corpus_entropy_fps, 2),
        "entropy_speculative_norestart_fps": round(spec_fps, 2),
        "progressive_4k_entropy_fps": round(prog_fps, 2),
        "progressive_4k_corpus_fps": round(prog_corpus_fps, 2),
        "arithmetic_4k_corpus_fps": round(arith_corpus_fps, 2),
        "arithmetic_4k_entropy_fps": round(arith_fps, 2),
        "libjpeg_1thread_fps": round(lib_fps, 2),
        "libjpeg_allcore_fps": round(lib_all_fps, 2),
        "cpu_work_unit_mb_s": round(cpu_unit, 1),
        "host_cores": os.cpu_count(),
        "lossless_1080p_fps": round(lossless_fps, 2),
        "encode_4k_fps": round(encode_fps, 2),
        "encode_4k_corpus_fps": round(encode_corpus_fps, 2),
        "spec_chunks": spec_chunks,
        "spec_tuner": tuner,
        "pgo": pgo_status(),
    }
    detail.update(dev)
    result = {
        "metric": "frames_per_s_per_chip_4k_decode",
        "value": round(e2e_fps, 2),
        "unit": "frames/s",
        # vs_baseline keeps the 1-thread libjpeg denominator for
        # cross-round continuity; vs_libjpeg_allcore is the honest
        # multi-thread anchor (what cross-round claims should quote).
        "vs_baseline": round(e2e_fps / lib_fps, 2),
        "vs_libjpeg_allcore": round(e2e_fps / lib_all_fps, 2),
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--device-stage":
        device_stage(sys.argv[2], None)
    else:
        main()
