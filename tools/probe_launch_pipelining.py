"""Measure whether keeping in-kernel batch launches in flight hides the
tunnel dispatch/sync gap: N sequential synced launches vs N launches
issued back-to-back with one sync at the end (jax async dispatch).
Decides whether the hybrid dev_side should double-buffer.
Usage: python tools/probe_launch_pipelining.py [4k|1080p] [n]"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import make_4k_jpeg  # noqa: E402
from jpeg_tpu.entropy.device_kernel import (  # noqa: E402
    kernel_runner_batch,
    suggest_device_batch,
)
from jpeg_tpu.io.container import parse_jpeg  # noqa: E402
from jpeg_tpu.io.corpus import synthetic_jpeg  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "4k"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    data = make_4k_jpeg(restart_rows=1) if mode == "4k" else \
        synthetic_jpeg(1920, 1080, seed=0)
    plan = parse_jpeg(data)
    b = suggest_device_batch(plan)
    kernel, args, _, S, _ = kernel_runner_batch([plan] * b, gather="mxu")

    @jax.jit
    def run(*a):
        out, err = kernel(*a)
        return out.astype(jnp.float32).sum(), err.sum()

    s, _ = run(*args)
    float(s)  # compile + warm

    for label in ("synced", "pipelined"):
        t0 = time.perf_counter()
        if label == "synced":
            for _ in range(n):
                s, _ = run(*args)
                float(s)
        else:
            pend = [run(*args)[0] for _ in range(n)]
            for s in pend:
                float(s)
        wall = time.perf_counter() - t0
        print(f"{mode} batch={b} {label:9s}: {n} launches "
              f"{wall*1e3:8.1f} ms -> {n*b/wall:7.2f} frames/s", flush=True)


if __name__ == "__main__":
    main()
