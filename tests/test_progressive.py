"""Progressive (SOF2) decode — beyond the reference (which panics on SOF2).

The strongest possible oracle: libjpeg encodes the SAME image as baseline
and as progressive with the same quality, so the quantized coefficients are
identical — our progressive decode must produce exactly the same pixels as
our baseline decode.
"""

import io

import numpy as np
import pytest
from PIL import Image

from conftest import psnr
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.io.corpus import synthetic_image
from jpeg_tpu.models.decoder import decode_bytes


def _pair(img, subsampling, quality=85, **kw):
    base = io.BytesIO()
    Image.fromarray(img).save(base, "JPEG", quality=quality,
                              subsampling=subsampling, **kw)
    prog = io.BytesIO()
    Image.fromarray(img).save(prog, "JPEG", quality=quality,
                              subsampling=subsampling, progressive=True, **kw)
    return base.getvalue(), prog.getvalue()


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_matches_baseline_encode(subsampling):
    img = synthetic_image(144, 112, seed=31)
    base, prog = _pair(img, subsampling)
    plan = parse_jpeg(prog)
    assert plan.progressive and len(plan.prog_scans) >= 6
    np.testing.assert_array_equal(
        decode_bytes(prog, rounding="round"), decode_bytes(base, rounding="round")
    )


def test_matches_pil_decode():
    img = synthetic_image(200, 152, seed=32)
    _, prog = _pair(img, 2, quality=92)
    ours = decode_bytes(prog, rounding="round")
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    assert psnr(ours, pil) > 35.0


def test_grayscale_progressive():
    img = synthetic_image(96, 80, seed=33)[..., 0]
    base = io.BytesIO()
    Image.fromarray(img, mode="L").save(base, "JPEG", quality=88)
    prog = io.BytesIO()
    Image.fromarray(img, mode="L").save(prog, "JPEG", quality=88,
                                        progressive=True)
    np.testing.assert_array_equal(
        decode_bytes(prog.getvalue()), decode_bytes(base.getvalue())
    )


def test_fast_path_progressive():
    img = synthetic_image(128, 96, seed=34)
    base, prog = _pair(img, 2)
    fast = decode_bytes(prog, rounding="truncate", path="fast")
    compat = decode_bytes(prog, rounding="truncate")
    assert np.abs(fast.astype(int) - compat.astype(int)).max() <= 1


def test_low_quality_many_refinements():
    img = (synthetic_image(104, 88, seed=35) // 2 + 40).astype(np.uint8)
    base, prog = _pair(img, 2, quality=25)
    np.testing.assert_array_equal(decode_bytes(prog), decode_bytes(base))


def test_random_noise_progressive():
    rng = np.random.default_rng(36)
    img = rng.integers(0, 256, (80, 64, 3), dtype=np.uint8)
    base, prog = _pair(img, 0, quality=95)
    np.testing.assert_array_equal(decode_bytes(prog), decode_bytes(base))


def test_odd_dims_progressive():
    img = synthetic_image(77, 53, seed=37)
    base, prog = _pair(img, 2)
    np.testing.assert_array_equal(decode_bytes(prog), decode_bytes(base))


@pytest.mark.parametrize("subsampling", [0, 2])
def test_native_progressive_matches_python(subsampling):
    from jpeg_tpu.entropy.progressive import decode_progressive_coefficients
    from jpeg_tpu.runtime import native_available, native_decode_progressive

    if not native_available():
        pytest.skip("native runtime not built")
    img = synthetic_image(120, 88, seed=50 + subsampling)
    _, prog = _pair(img, subsampling, quality=80)
    plan = parse_jpeg(prog)
    np.testing.assert_array_equal(
        native_decode_progressive(plan),
        decode_progressive_coefficients(plan),
    )


def test_native_progressive_results_do_not_alias():
    """Two decodes with equal total_blocks must return independent arrays
    (regression: the per-thread output cache aliased successive results)."""
    from jpeg_tpu.runtime import native_available, native_decode_progressive

    if not native_available():
        pytest.skip("native runtime not built")
    img_a = synthetic_image(120, 88, seed=90)
    img_b = synthetic_image(120, 88, seed=91)
    _, prog_a = _pair(img_a, 2, quality=80)
    _, prog_b = _pair(img_b, 2, quality=80)
    out_a = native_decode_progressive(parse_jpeg(prog_a))
    snapshot = out_a.copy()
    native_decode_progressive(parse_jpeg(prog_b))
    np.testing.assert_array_equal(out_a, snapshot)


@pytest.mark.parametrize("subsampling", [(1, 1), (2, 1), (2, 2)])
def test_progressive_encoder_roundtrip(subsampling):
    """Our progressive encoder: same pixels as our baseline encoder, and
    conformant (PIL decodes it)."""
    from jpeg_tpu.models.encoder import encode_rgb, encode_rgb_progressive

    img = synthetic_image(120, 104, seed=71)
    base = encode_rgb(img, quality=85, subsampling=subsampling)
    prog = encode_rgb_progressive(img, quality=85, subsampling=subsampling)
    np.testing.assert_array_equal(decode_bytes(base), decode_bytes(prog))
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    assert psnr(pil, decode_bytes(prog, rounding="round")) > 35.0


def test_progressive_encoder_grayscale_and_noise():
    from jpeg_tpu.models.encoder import encode_rgb, encode_rgb_progressive

    g = synthetic_image(88, 72, seed=72)[..., 0]
    np.testing.assert_array_equal(
        decode_bytes(encode_rgb_progressive(g, quality=90)),
        decode_bytes(encode_rgb(g, quality=90)),
    )
    rng = np.random.default_rng(73)
    noise = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_bytes(encode_rgb_progressive(noise, quality=95, subsampling=(1, 1))),
        decode_bytes(encode_rgb(noise, quality=95, subsampling=(1, 1))),
    )


def test_progressive_encoder_smaller():
    from jpeg_tpu.models.encoder import encode_rgb, encode_rgb_progressive

    img = synthetic_image(160, 128, seed=74)
    base = encode_rgb(img, quality=85)
    prog = encode_rgb_progressive(img, quality=85)
    assert len(prog) < len(base)


def test_custom_scan_script():
    from jpeg_tpu.models.encoder import encode_rgb, encode_rgb_progressive

    img = synthetic_image(96, 80, seed=75)
    # Simple 2-stage script: DC full precision, then whole AC band at once.
    script = [((0, 1, 2), 0, 0, 0, 0),
              ((0,), 1, 63, 0, 0),
              ((1,), 1, 63, 0, 0),
              ((2,), 1, 63, 0, 0)]
    prog = encode_rgb_progressive(img, quality=88, scan_script=script)
    np.testing.assert_array_equal(
        decode_bytes(prog), decode_bytes(encode_rgb(img, quality=88)))
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    assert psnr(pil, decode_bytes(prog, rounding="round")) > 35.0


@pytest.mark.parametrize("sub,gray", [((1, 1), False), ((2, 2), False),
                                      ((1, 1), True)])
def test_native_progressive_encoder_identical(sub, gray):
    from jpeg_tpu.entropy.progressive_encode import encode_progressive_scans
    from jpeg_tpu.models.encoder import _forward_transform
    from jpeg_tpu.runtime import (
        native_available,
        native_encode_progressive_scans,
    )

    if not native_available():
        pytest.skip("native runtime not built")
    img = synthetic_image(112, 96, seed=82)
    if gray:
        img = img[..., 0]
    blocks, samplings, _, h, w, mx, my, _ = _forward_transform(
        img, 85, sub, gray)
    py = encode_progressive_scans(blocks, samplings, mx, my, w, h)
    cc = native_encode_progressive_scans(blocks, samplings, mx, my, w, h)
    assert len(py) == len(cc)
    for a, b in zip(py, cc):
        assert a["data"] == b["data"]
        for ta, tb in zip(a["tables"], b["tables"]):
            np.testing.assert_array_equal(ta[2].bits, tb[2].bits)
            np.testing.assert_array_equal(ta[2].values, tb[2].values)


@pytest.mark.parametrize("ri", [1, 5])
def test_progressive_restart_intervals(ri):
    """Progressive encode with restart markers: exercises the restart reset
    paths in BOTH progressive decoders; conformant per libjpeg."""
    from jpeg_tpu.entropy.progressive import decode_progressive_coefficients
    from jpeg_tpu.models.encoder import encode_rgb, encode_rgb_progressive
    from jpeg_tpu.runtime import native_available, native_decode_progressive

    img = synthetic_image(104, 88, seed=96)
    base = encode_rgb(img, quality=85)
    prog = encode_rgb_progressive(img, quality=85, restart_interval=ri)
    plan = parse_jpeg(prog)
    assert all(len(s.bounds) > 1 for s in plan.prog_scans)
    np.testing.assert_array_equal(decode_bytes(prog), decode_bytes(base))
    if native_available():
        np.testing.assert_array_equal(
            native_decode_progressive(plan),
            decode_progressive_coefficients(plan),
        )
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    assert psnr(pil, decode_bytes(prog, rounding="round")) > 35.0


def test_native_progressive_encoder_restart_identical():
    from jpeg_tpu.entropy.progressive_encode import encode_progressive_scans
    from jpeg_tpu.models.encoder import _forward_transform
    from jpeg_tpu.runtime import (
        native_available,
        native_encode_progressive_scans,
    )

    if not native_available():
        pytest.skip("native runtime not built")
    img = synthetic_image(112, 88, seed=98)
    blocks, samplings, _, h, w, mx, my, _ = _forward_transform(
        img, 85, (2, 2), False)
    for ri in [1, 3]:
        py = encode_progressive_scans(blocks, samplings, mx, my, w, h,
                                      restart_interval=ri)
        cc = native_encode_progressive_scans(blocks, samplings, mx, my, w, h,
                                             restart_interval=ri)
        assert all(a["data"] == b["data"] for a, b in zip(py, cc))
