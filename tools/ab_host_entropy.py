"""Interleaved same-process A/B for native-runtime build variants.

The shared VM drifts +-20-30% minute to minute, so sequential
before/after timing cannot resolve a 5-15% kernel change. This harness
builds N variants of libjpegtpu.so (distinct defines), loads them all,
and alternates measurement rounds variant-by-variant; medians across
rounds cancel the drift.

Usage: python tools/ab_host_entropy.py NAME=DEFS [NAME=DEFS...]
  e.g.  python tools/ab_host_entropy.py base="" nopf="-DJT_NO_PREFETCH"
"""

import ctypes
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

NATIVE = os.path.join(os.path.dirname(__file__), "..",
                      "jpeg_tpu", "runtime", "native")


def build(name, defs):
    out = os.path.join(NATIVE, "build", f"libjpegtpu_{name}.so")
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
           "-pthread", "-shared", "-o", out,
           os.path.join(NATIVE, "jpegtpu.cpp")] + [d for d in defs.split()
                                                   if d]
    subprocess.run(cmd, check=True)
    return out


def main():
    variants = []
    for a in sys.argv[1:]:
        name, _, defs = a.partition("=")
        variants.append((name, build(name, defs)))

    import jpeg_tpu.runtime as rt
    from bench import (
        bench_host_entropy,
        bench_host_entropy_corpus,
        make_4k_jpeg,
    )
    from jpeg_tpu.io.container import parse_jpeg

    plan = parse_jpeg(make_4k_jpeg())
    rt._load()  # configure argtypes template on the default lib
    libs = {}
    for name, path in variants:
        lib = ctypes.CDLL(path)
        # Clone the configured signatures from the default lib.
        for fn in ("jt_decode_scan", "jt_decode_scan_planes",
                   "jt_decode_scan_planes_spec", "jt_decode_gap"):
            src = getattr(rt._lib, fn)
            dst = getattr(lib, fn)
            dst.restype = src.restype
            dst.argtypes = src.argtypes
        libs[name] = lib

    results = {name: {"single": [], "corpus": []} for name, _ in variants}
    rounds = 5
    for r in range(rounds):
        for name, _ in variants:
            rt._lib = libs[name]
            bench_host_entropy(plan, iters=2)  # touch
            results[name]["single"].append(bench_host_entropy(plan))
            results[name]["corpus"].append(
                bench_host_entropy_corpus(plan))
        print(f"round {r}: " + "  ".join(
            f"{n} s={results[n]['single'][-1]:.0f} "
            f"c={results[n]['corpus'][-1]:.0f}"
            for n, _ in variants), flush=True)
    print("\nmedians over %d interleaved rounds:" % rounds)
    for name, _ in variants:
        s = sorted(results[name]["single"])[rounds // 2]
        c = sorted(results[name]["corpus"])[rounds // 2]
        print(f"  {name:10s} single {s:6.1f} fps   corpus {c:6.1f} fps")


if __name__ == "__main__":
    main()
