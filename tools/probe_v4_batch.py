"""Measure the v4 in-kernel BATCH tier on the real chip: frames/s of
corpus entropy decode vs lane count, for the hybrid host+device gate.
Usage: python tools/probe_v4_batch.py [4k|1080p] [batch ...]"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import make_4k_jpeg  # noqa: E402
from jpeg_tpu.entropy.device_kernel import kernel_runner_batch  # noqa: E402
from jpeg_tpu.io.container import parse_jpeg  # noqa: E402
from jpeg_tpu.io.corpus import synthetic_jpeg  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "4k"
    batches = [int(a) for a in sys.argv[2:]] or [2, 4, 8]
    if mode == "4k":
        data = make_4k_jpeg(restart_rows=1)
    else:
        data = synthetic_jpeg(1920, 1080, seed=0)
    plan = parse_jpeg(data)
    print(f"{mode}: {len(plan.segments)} segments/frame, "
          f"{plan.total_blocks} blocks", flush=True)
    for b in batches:
        plans = [plan] * b
        kernel, args, max_mcus, S, _ = kernel_runner_batch(
            plans, gather="mxu")

        @jax.jit
        def run(*a):
            out, err = kernel(*a)
            return out.astype(jnp.float32).sum(), err.sum()

        s, e = run(*args)
        float(s)  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, _ = run(*args)
            float(s)
            times.append(time.perf_counter() - t0)
        wall = min(times)
        print(f"batch={b:2d} S={S:5d} max_mcus={max_mcus:4d} "
              f"wall={wall*1e3:8.1f} ms  -> {b/wall:6.2f} frames/s "
              f"err={int(e)}", flush=True)


if __name__ == "__main__":
    main()
