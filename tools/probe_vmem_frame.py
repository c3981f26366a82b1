"""Measure the EXACT Mosaic scoped-VMEM frame of the in-kernel entropy
decoders across a design matrix, replacing the empirical "+25-28%" fudge
(VERDICT r4 item 6).

Instrument: compile with compiler_options={"xla_tpu_scoped_vmem_limit_kib":
just under the analytic model} so the compile fails with "Scoped
allocation with size X.XXM" — X is the exact total frame (verified: the
same value the organic 16 MB OOM reports; a far-too-small limit instead
reports a partial allocation). The compiler is the measuring instrument;
the chip is never touched. (The client-side XLA_FLAGS parser rejects this
backend flag, but per-compile compiler options are forwarded through the
remote compile helper.)

Matrix: v4 resident-word kernel and v5 windowed kernel x {select, mxu}
gather x lane counts x word-block heights x bpm. Output: one line per
config with the analytic model term sizes and the measured frame, for
regression in device_kernel's sizing model.

Usage: python tools/probe_vmem_frame.py [v4|v5] > /tmp/vmem_frame.txt
"""

import re
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: F401

from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.io.corpus import synthetic_jpeg


def _mb(s):
    m = re.search(r"Scoped allocation with size ([0-9.]+)([MK])", s)
    if not m:
        return None
    v = float(m.group(1))
    return v if m.group(2) == "M" else v / 1024.0


def measure(jitted, args, model_mb):
    """Compile at limit just under the analytic model: the failure
    message reports the TRUE total frame (verified monotone; a limit in
    [~1M, real) reports the same total the organic 16 MB OOM did). If it
    compiles, the real frame is under the probe limit — bisect down."""
    lo_kib = 768
    kib = max(lo_kib, int(model_mb * 1024 * 0.9))
    for _ in range(8):
        try:
            jitted.lower(*args).compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": kib})
            if kib <= lo_kib:
                return kib / 1024.0
            kib = kib // 2  # compiled: frame < limit; probe lower
        except Exception as e:  # noqa: BLE001 — the error IS the reading
            return _mb(str(e))
    return None


def corpus(width, height, n, restart_rows=1, gray=False):
    if gray:
        import io

        from PIL import Image

        from jpeg_tpu.io.corpus import synthetic_image

        datas = []
        for i in range(n):
            buf = io.BytesIO()
            Image.fromarray(synthetic_image(width, height, seed=i)).convert(
                "L").save(buf, "JPEG", quality=85,
                          restart_marker_rows=restart_rows)
            datas.append(buf.getvalue())
        return [parse_jpeg(d) for d in datas]
    return [parse_jpeg(synthetic_jpeg(width, height, seed=i,
                                      restart_rows=restart_rows))
            for i in range(n)]


def probe_v4():
    from jpeg_tpu.entropy.device_kernel import kernel_runner_batch

    cases = [
        ("360p x2", corpus(640, 360, 2)),
        ("360p x8", corpus(640, 360, 8)),
        ("1080p x2", corpus(1920, 1080, 2)),
        ("1080p x8", corpus(1920, 1080, 8)),
        ("1080p x20", corpus(1920, 1080, 20)),
        ("4K x1", corpus(3840, 2160, 1)),
        ("4K x4", corpus(3840, 2160, 4)),
        ("gray 1080p x8", corpus(1920, 1080, 8, gray=True)),
    ]
    print("kind name gather S S_pad W bpm words_mb out_mb model_mb real_mb")
    for name, plans in cases:
        for gather in ("select", "mxu"):
            k, a, mm, S, lb = kernel_runner_batch(plans, gather=gather)
            W = a[0].shape[0]
            bpm = plans[0].blocks_per_mcu
            s_pad = -(-S // 128) * 128
            words = W * s_pad * 4 / 2**20
            outb = 2 * bpm * 64 * s_pad * 4 / 2**20
            real = measure(k, a, words + outb)
            print(f"v4 {name.replace(' ', '_')} {gather} {S} {s_pad} {W} "
                  f"{bpm} {words:.2f} {outb:.2f} {words + outb:.2f} "
                  f"{real}", flush=True)


def probe_v5():
    from jpeg_tpu.entropy.device_window import window_runner_batch

    cases = [
        ("1080p x8", corpus(1920, 1080, 8)),
        ("1080p x20", corpus(1920, 1080, 20)),
        ("1080p x44", corpus(1920, 1080, 44)),
        ("4K x4", corpus(3840, 2160, 4)),
        ("4K x12", corpus(3840, 2160, 12)),
        ("4K x18", corpus(3840, 2160, 18)),
    ]
    print("kind name gather S S_pad Wc bpm words_mb out_mb model_mb real_mb")
    for name, plans in cases:
        for gather in ("select", "mxu"):
            for wc in (256, 512):
                run, args, (mm, S, lb, be, K, G) = window_runner_batch(
                    plans, gather=gather, w_chunk=wc)
                bpm = plans[0].blocks_per_mcu
                s_pad = -(-S // 128) * 128
                words = wc * s_pad * 4 / 2**20
                outb = 2 * bpm * 64 * s_pad * 4 / 2**20
                real = measure(run, args, words + outb)
                print(f"v5 {name.replace(' ', '_')} {gather}/wc{wc} {S} "
                      f"{s_pad} {wc} {bpm} {words:.2f} {outb:.2f} "
                      f"{words + outb:.2f} {real}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["v4", "v5"]
    if "v4" in which:
        probe_v4()
    if "v5" in which:
        probe_v5()
