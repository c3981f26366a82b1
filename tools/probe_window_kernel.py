"""On-chip validation + A/B of the windowed in-kernel decoder (v5) vs the
resident-word v4 kernel.

Stages (each gated so a Mosaic failure reports cleanly):
  1. compile + bit-exactness of the v5 chain on a small 4K batch
  2. timed A/B v4 vs v5 at the v4 batch ceiling (4K batch 6, 1080p 22)
  3. v5 batch/W_chunk sweep past the old VMEM wall

Usage: python tools/probe_window_kernel.py [stage...]  (default: all)
Timing is differential (two chained loop lengths) like bench.py, so the
tunnel's per-dispatch latency cancels.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.io.corpus import synthetic_jpeg


def plans_4k(n, restart_rows=1):
    return [parse_jpeg(synthetic_jpeg(3840, 2160, restart_rows=restart_rows,
                                      seed=i)) for i in range(n)]


def plans_1080(n):
    return [parse_jpeg(synthetic_jpeg(1920, 1080, seed=i))
            for i in range(n)]


def time_chain(run, args, iters=3):
    """Seconds per run(*args), measured as dependency-chained fori_loops
    of N and 3N full decodes inside single dispatches (differential, so
    the tunnel's per-dispatch latency cancels — same scheme as bench.py).
    The loop-carried acc perturbs nblk by (acc % 2), which makes every
    iteration data-dependent without changing the work meaningfully."""
    import jax
    import jax.numpy as jnp

    args = [jnp.asarray(a) for a in args]

    def mk(n):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                res = run(a[0], a[1], a[2], a[3] + (acc % 2), *a[4:])
                return acc + res[1].astype(jnp.int32).sum()
            return jax.lax.fori_loop(0, n, body, jnp.int32(0))
        return loop

    def timed(loop):
        t0 = time.perf_counter()
        int(loop(*args))
        return time.perf_counter() - t0

    short, long_ = mk(iters), mk(3 * iters)
    int(short(*args))
    int(long_(*args))  # compile + warm both
    t1 = min(timed(short) for _ in range(2))
    t3 = min(timed(long_) for _ in range(2))
    return max(t3 - t1, 1e-9) / (2 * iters)


def stage_exact():
    from jpeg_tpu.entropy.device_window import (
        decode_coefficients_device5_batch,
    )
    from jpeg_tpu.entropy.oracle import decode_coefficients

    plans = plans_4k(2)
    t0 = time.perf_counter()
    got, err = decode_coefficients_device5_batch(plans)
    print(f"v5 4K batch-2 compile+run: {time.perf_counter()-t0:.1f}s, "
          f"err lanes {int(err.sum())}/{len(err)}")
    assert not err.any()
    for p, g in zip(plans, got):
        np.testing.assert_array_equal(np.asarray(g), decode_coefficients(p))
    print("stage_exact: BIT-EXACT on chip")


def _ab(plans, label, v4_ok=True, gathers=("select", "mxu"),
        wcs=(256, 512, 1024)):
    import jax

    from jpeg_tpu.entropy.device_kernel import kernel_runner_batch
    from jpeg_tpu.entropy.device_window import window_runner_batch

    n = len(plans)
    if v4_ok:
        from jpeg_tpu.entropy.device_kernel import fit_batch_plans

        try:
            fit = fit_batch_plans(plans)[0]  # largest budget-fitting prefix
            k4, a4, mm, S, _lb = kernel_runner_batch(fit)
            t4 = time_chain(k4, a4)
            print(f"  {label} v4 batch-{len(fit)}: {len(fit) / t4:7.1f} fps "
                  f" (S={S})", flush=True)
        except Exception as e:  # noqa: BLE001 — rung isolation
            print(f"  {label} v4: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
    for g in gathers:
        for wc in wcs:
            try:
                run, args, (mm, S, lb, be, K, G) = window_runner_batch(
                    plans, gather=g, w_chunk=wc)
                t5 = time_chain(run, args)
                print(f"  {label} v5 batch-{n} {g:6s} wc={wc:4d} "
                      f"(K={K:3d},G={G:3d}): {n / t5:7.1f} fps", flush=True)
            except Exception as e:  # noqa: BLE001 — rung isolation
                print(f"  {label} v5 {g}/wc{wc}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


def stage_ab():
    print("4K (v4 ceiling batch 6):", flush=True)
    _ab(plans_4k(6), "4K", gathers=("mxu",))
    print("1080p (v4 budget-fit batch):", flush=True)
    _ab(plans_1080(22), "1080p", gathers=("mxu",), wcs=(256, 512))


def stage_sweep():
    print("v5 past the old VMEM wall (4K):")
    p12 = plans_4k(12)
    _ab(p12, "4K", v4_ok=False, gathers=("mxu",))
    _ab(plans_4k(18), "4K", v4_ok=False, gathers=("mxu",), wcs=(256, 512))
    print("1080p big batch:")
    _ab(plans_1080(44), "1080p", v4_ok=False, gathers=("mxu",),
        wcs=(256, 512))


if __name__ == "__main__":
    stages = sys.argv[1:] or ["exact", "ab", "sweep"]
    for s in stages:
        globals()[f"stage_{s}"]()
