"""Deterministic corruption fuzz for the decode stack.

Usage: python tools/fuzz.py [LO HI]   (seed range, default 0 40)

For each of 16 stream variants (our encoder x baseline/restart/optimized/
progressive/CMYK/arithmetic, plus Pillow/libjpeg baseline/optimized/
progressive/CMYK)
and each seed, applies 1-5 bit flips plus optionally truncation or a 16-byte
insertion, then decodes with BOTH the NumPy oracle and the C++ native engine.

Failure conditions (any -> nonzero problem count):
- any exception other than ValueError escaping a decode
- the engines producing different pixels
- one engine decoding while the other raises

Seeds derive from zlib.crc32 (PYTHONHASHSEED-independent), so every case is
reproducible. tests/test_robustness.py pins the regressions this harness has
found; run this for wider sweeps.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jpeg_tpu
from jpeg_tpu.io.corpus import synthetic_image

img = synthetic_image(144, 96, seed=1)
gray = img[..., :1].repeat(3, axis=2)
import io
from PIL import Image
def _pil(progressive, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=80, progressive=progressive, **kw)
    return buf.getvalue()
def _pil_cmyk():
    buf = io.BytesIO()
    Image.fromarray(img).convert("CMYK").save(buf, "JPEG", quality=80)
    return buf.getvalue()
def _pil_cmyk_prog():
    buf = io.BytesIO()
    Image.fromarray(img).convert("CMYK").save(buf, "JPEG", quality=80, progressive=True)
    return buf.getvalue()
variants = {
    "ycck_ours": jpeg_tpu.encode_cmyk(
        __import__("numpy").asarray(Image.fromarray(img).convert("CMYK")),
        quality=80, ycck=True),
    "cmyk_ours": jpeg_tpu.encode_cmyk(
        __import__("numpy").asarray(Image.fromarray(img).convert("CMYK")),
        quality=80, restart_interval_mcus=3),
    "pil_cmyk_prog": _pil_cmyk_prog(),
    "pil_cmyk": _pil_cmyk(),
    "pil": _pil(False),
    "pil_opt": _pil(False, optimize=True),
    "pil_prog": _pil(True),
    "base": jpeg_tpu.encode_rgb(img, quality=80),
    "rst": jpeg_tpu.encode_rgb(img, quality=80, restart_interval_mcus=3),
    "gray420": jpeg_tpu.encode_rgb(img, quality=80, subsampling=(2, 2)),
    "opt": jpeg_tpu.encode_rgb(img, quality=80, optimize=True),
    "prog": jpeg_tpu.encode_rgb_progressive(img, quality=80),
    "prog_rst": jpeg_tpu.encode_rgb_progressive(img, quality=80, restart_interval=4),
    "arith": jpeg_tpu.encode_rgb(img, quality=80, arithmetic=True),
    "arith_rst": jpeg_tpu.encode_rgb(img, quality=80, arithmetic=True,
                                     restart_interval_mcus=3),
    "prog_arith": jpeg_tpu.encode_rgb_progressive(img, quality=80,
                                                  arithmetic=True),
    # 12-bit extended/progressive (SOF1/SOF9/SOF2/SOF10 @ precision 12)
    "p12": jpeg_tpu.encode_rgb(
        (img.astype(np.uint16) << 4), quality=80, precision=12,
        engine="python"),
    "p12_arith": jpeg_tpu.encode_rgb(
        (img.astype(np.uint16) << 4), quality=80, precision=12,
        arithmetic=True, engine="python"),
    "p12_prog": jpeg_tpu.encode_rgb_progressive(
        (img.astype(np.uint16) << 4), quality=80, precision=12),
    # lossless (SOF3, r4): both engines route to the same python
    # entropy layer, so the cross-check here is error-clean decode
    # or typed rejection — never a crash.
    "lossless": __import__(
        "jpeg_tpu.entropy.lossless", fromlist=["encode_lossless"]
    ).encode_lossless(img, predictor=4, restart_interval=11),
}
lo, hi = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (0, 40)
bad = 0
for vname, data in variants.items():
    for s in range(lo, hi):
        import zlib
        rng = np.random.default_rng(zlib.crc32(vname.encode()) * 1000 + s)
        d = bytearray(data)
        nflips = int(rng.integers(1, 6))
        for _ in range(nflips):
            i = int(rng.integers(2, len(d)))
            d[i] ^= int(rng.integers(1, 256))
        mode = int(rng.integers(0, 3))
        if mode == 1:
            d = d[: int(rng.integers(4, len(d)))]
        elif mode == 2:
            j = int(rng.integers(2, len(d)))
            d = d[:j] + bytes(rng.integers(0, 256, 16, dtype=np.uint8)) + d[j:]
        res = {}
        for eng in ("oracle", "native"):
            try:
                res[eng] = jpeg_tpu.decode_bytes(bytes(d), engine=eng)
            except ValueError as e:
                res[eng] = "V"
            except Exception as e:
                print(f"UNEXPECTED {vname}:{s}:{eng}: {type(e).__name__}: {str(e)[:100]}")
                traceback.print_exc(limit=5)
                bad += 1
                res[eng] = "X"
        a, b = res["oracle"], res["native"]
        if isinstance(a, np.ndarray) and isinstance(b, np.ndarray):
            if not np.array_equal(a, b):
                print(f"DIVERGE {vname}:{s}")
                bad += 1
        elif isinstance(a, np.ndarray) or isinstance(b, np.ndarray) or a != b:
            print(f"ERRDIFF {vname}:{s}: {a if isinstance(a,str) else 'ok'} vs {b if isinstance(b,str) else 'ok'}")
            bad += 1
print(f"fuzz [{lo},{hi}) x {len(variants)} variants: {bad} problems")
sys.exit(1 if bad else 0)
