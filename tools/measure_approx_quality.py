"""Measure the approx-IDCT tier's quality gate on the real chip.

idct_mode="approx" runs the fused pixel kernel's IDCT matmuls at DEFAULT
precision (bf16 MXU passes) instead of HIGHEST — on CPU the two are both
f32, so this table is only meaningful on TPU. For every corpus-matrix
entry we decode with the fast path exact AND approx on the chip and
report max |diff| (u8) and PSNR between them. The production gate
(docs/APPROX_QUALITY.md, VERDICT r4 item 4): max |diff| <= 2, PSNR
>= 50 dB. 12-bit, lossless and CMYK streams never reach the fused
kernel (decode_plan_fast routes them to the exact compat pipeline), so
the gate covers them trivially; they are listed for completeness.

Usage: python tools/measure_approx_quality.py   (TPU; writes markdown
rows to stdout)
"""

import io
import sys

sys.path.insert(0, ".")

import numpy as np


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


_enable_compile_cache()

from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.io.corpus import synthetic_jpeg
from jpeg_tpu.models.decoder import decode_plan_fast


def one(name, data):
    plan = parse_jpeg(data)
    exact = np.asarray(decode_plan_fast(plan, idct_mode="exact",
                                        interpret=False))
    approx = np.asarray(decode_plan_fast(plan, idct_mode="approx",
                                         interpret=False))
    d = np.abs(exact.astype(np.int32) - approx.astype(np.int32))
    mse = float((d.astype(np.float64) ** 2).mean())
    psnr = 10 * np.log10(255**2 / mse) if mse > 0 else float("inf")
    print(f"| {name} | {plan.width}x{plan.height} | {int(d.max())} | "
          f"{psnr:.1f} |", flush=True)
    return int(d.max()), psnr


def main():
    cases = []
    for p in ("/root/reference/working-jpegs/huff_simple0.jpg",
              "/root/reference/working-jpegs/lena-bw.jpeg",
              "/root/reference/lena.jpeg",
              "/root/reference/2x2-chroma.jpeg"):
        with open(p, "rb") as f:
            cases.append((p.rsplit("/", 1)[-1], f.read()))
    for q in (70, 85, 95):
        cases.append((f"synthetic 4K q{q}",
                      synthetic_jpeg(3840, 2160, seed=0, quality=q)))
    cases.append(("synthetic 1080p q85", synthetic_jpeg(1920, 1080, seed=1)))
    # grayscale + 4:4:4 via PIL re-encode of the 1080p content
    from PIL import Image

    img = Image.open(io.BytesIO(cases[-1][1]))
    buf = io.BytesIO()
    img.convert("L").save(buf, "JPEG", quality=90)
    cases.append(("grayscale 1080p q90", buf.getvalue()))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=92, subsampling=0)
    cases.append(("4:4:4 1080p q92", buf.getvalue()))

    print("| stream | size | max diff (u8) | PSNR vs exact (dB) |")
    print("|---|---|---|---|")
    worst_d, worst_p = 0, float("inf")
    for name, data in cases:
        d, p = one(name, data)
        worst_d, worst_p = max(worst_d, d), min(worst_p, p)
    print(f"\nworst-case: max diff {worst_d}, PSNR {worst_p:.1f} dB "
          f"(gate: diff <= 2, PSNR >= 50)", flush=True)
    assert worst_d <= 2 and worst_p >= 50.0, "approx tier FAILS the gate"


if __name__ == "__main__":
    main()
