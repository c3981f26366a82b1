"""Quick A/B harness for host entropy perf work (not part of bench.py).

Usage: python tools/abench.py [what ...]
  seq     single-thread 4K segmented decode (the corpus-mode per-core rate)
  corpus  4-worker corpus-mode rate (matches bench_host_entropy_corpus)
  spec    no-restart speculative decode, all threads
  arith   arithmetic (SOF9) 4K decode, all threads
  prog    progressive 4K decode, all threads
Writes the synthetic 4K jpegs to /tmp/abench_*.jpg once and reuses them.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_jpeg(name, **kw):
    path = f"/tmp/abench_{name}.jpg"
    if not os.path.exists(path):
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from bench import make_4k_jpeg

        with open(path, "wb") as f:
            f.write(make_4k_jpeg(**kw))
    with open(path, "rb") as f:
        return f.read()


def timeit(fn, iters, reps=5):
    fn()  # warmup
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        best.append(iters / (time.perf_counter() - t0))
    return statistics.median(best), max(best)


def main():
    what = sys.argv[1:] or ["seq"]
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.runtime import native_decode_planes

    if "seq" in what:
        plan = parse_jpeg(get_jpeg("4k"))
        med, best = timeit(lambda: native_decode_planes(plan, n_threads=1), 6)
        print(f"seq 1-thread: {med:.1f} fps median, {best:.1f} best")
    if "corpus" in what:
        from concurrent.futures import ThreadPoolExecutor

        plan = parse_jpeg(get_jpeg("4k"))
        n = os.cpu_count() or 1
        ex = ThreadPoolExecutor(max_workers=n)

        def one():
            list(ex.map(
                lambda _: native_decode_planes(plan, n_threads=1), range(n)))

        med, best = timeit(one, 6)
        print(f"corpus {n}-worker: {med*n:.1f} fps median, {best*n:.1f} best")
        ex.shutdown()
    if "spec" in what:
        plan = parse_jpeg(get_jpeg("4k_nr", restart_rows=0))
        med, best = timeit(lambda: native_decode_planes(plan), 6)
        print(f"spec no-restart: {med:.1f} fps median, {best:.1f} best")
    if "arith" in what:
        import io

        import numpy as np
        from PIL import Image

        from jpeg_tpu.models.encoder import encode_rgb
        from jpeg_tpu.runtime import native_decode_arith_planes

        path = "/tmp/abench_4k_arith.jpg"
        if not os.path.exists(path):
            img = np.asarray(
                Image.open(io.BytesIO(get_jpeg("4k"))).convert("RGB"))
            with open(path, "wb") as f:
                f.write(encode_rgb(img, quality=85, arithmetic=True,
                                   restart_interval_mcus=16))
        with open(path, "rb") as f:
            aplan = parse_jpeg(f.read())
        med, best = timeit(lambda: native_decode_arith_planes(aplan), 6)
        print(f"arith 4K: {med:.1f} fps median, {best:.1f} best")
    if "prog" in what:
        import io

        from PIL import Image

        from jpeg_tpu.runtime import native_decode_progressive

        path = "/tmp/abench_4k_prog.jpg"
        if not os.path.exists(path):
            img = Image.open(io.BytesIO(get_jpeg("4k"))).convert("RGB")
            buf = io.BytesIO()
            img.save(buf, "JPEG", quality=85, progressive=True)
            with open(path, "wb") as f:
                f.write(buf.getvalue())
        with open(path, "rb") as f:
            pplan = parse_jpeg(f.read())
        med, best = timeit(
            lambda: native_decode_progressive(pplan, reuse_buffer=True), 4)
        print(f"prog 4K: {med:.1f} fps median, {best:.1f} best")


if __name__ == "__main__":
    main()
