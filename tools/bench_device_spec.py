"""A/B ladder for the speculative chunk-lane device entropy decoder.

Measures decode_coefficients_device_spec on a real 4K plan (with and
without restart markers) across lane-count x overlap configs, on the
real TPU through the axon tunnel. One JSON line per config. Follows the
tunnel rules (memory: TPU tunnel benchmarking): D2H checksum forces
completion; interleaved repeats after mutual warmup; run this under
`timeout` as the only TPU process.

Usage: python tools/bench_device_spec.py [configs...]
  config = LANES:OVERLAP, default ladder if none given.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import make_4k_jpeg  # noqa: E402
from jpeg_tpu.entropy.device_spec import (  # noqa: E402
    decode_coefficients_device_spec,
)
from jpeg_tpu.io.container import parse_jpeg  # noqa: E402


def run(plan, lanes, overlap, repeats=3):
    import jax
    import jax.numpy as jnp

    got, stats = decode_coefficients_device_spec(
        plan, target_lanes=lanes, overlap_mcus=overlap)
    if got is None:
        return None, stats
    jax.block_until_ready(got)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        got, stats = decode_coefficients_device_spec(
            plan, target_lanes=lanes, overlap_mcus=overlap)
        cs = float(jnp.sum(got.astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    del cs
    return sorted(times)[len(times) // 2], stats


def main():
    configs = []
    for a in sys.argv[1:]:
        l, o = a.split(":")
        configs.append((int(l), int(o)))
    if not configs:
        configs = [(512, 8), (1024, 8), (2048, 8), (1024, 16), (2048, 4)]

    from jpeg_tpu.entropy.oracle import decode_coefficients

    for tag, restart_rows in [("rst", 1), ("norst", 0)]:
        data = make_4k_jpeg(restart_rows=restart_rows)
        plan = parse_jpeg(data)
        ref = decode_coefficients(plan)
        for lanes, overlap in configs:
            t, stats = run(plan, lanes, overlap)
            if t is None:
                print(json.dumps({"tag": tag, "lanes": lanes,
                                  "overlap": overlap, "fps": 0.0,
                                  "stats": stats}), flush=True)
                continue
            got, _ = decode_coefficients_device_spec(
                plan, target_lanes=lanes, overlap_mcus=overlap)
            exact = bool(np.array_equal(np.asarray(got), ref))
            print(json.dumps({"tag": tag, "lanes": stats["lanes"],
                              "overlap": overlap, "cap": stats["cap"],
                              "fps": round(1.0 / t, 2),
                              "gap_mcus": stats["gap_mcus"],
                              "exact": exact}), flush=True)


if __name__ == "__main__":
    main()
