"""12-bit extended sequential (SOF1 Huffman / SOF9 arithmetic): the
last cell of the extended T.81 DCT matrix. Beyond the reference (8-bit
SOF0 only, src/jpeg/mod.rs:262-298) AND this environment's libjpeg
(8-bit build, no j12 entry points — so cross-validation is round-trip +
cross-tier equivalence instead of a libjpeg diff)."""

import io
import os

import numpy as np
import pytest

from jpeg_tpu.io.container import JPEGError, parse_jpeg
from jpeg_tpu.io.ppm import read_ppm, write_ppm
from jpeg_tpu.models.decoder import decode_plan
from jpeg_tpu.models.encoder import encode_rgb


def _noise12(shape, seed=0):
    return np.random.default_rng(seed).integers(
        0, 4096, shape, dtype=np.uint16)


def _smooth12(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (yy * 9 + xx * 5) % 3500 + 300
    g = (xx * 7) % 3000 + 500
    b = (yy * 6) % 3200 + 400
    return np.stack([r, g, b], -1).astype(np.uint16)


def test_sof1_roundtrip_tiers_bit_exact():
    """Noisy content maxes the magnitude categories (AC size ~14, DC
    ~15); oracle, C++ runtime, and the device v2 kernel must agree."""
    from jpeg_tpu.entropy.device_decode2 import decode_coefficients_device2
    from jpeg_tpu.entropy.oracle import decode_coefficients
    from jpeg_tpu.runtime import native_decode_coefficients

    img = _noise12((96, 112, 3), seed=1)
    data = encode_rgb(img, quality=97, subsampling=(1, 1), precision=12,
                      engine="python", restart_interval_mcus=3)
    plan = parse_jpeg(data)
    assert plan.precision == 12
    assert b"\xff\xc1" in data  # SOF1 marker
    ref = decode_coefficients(plan)
    assert int(np.abs(ref).max()) > 2047  # actually exercises >11-bit
    nat = native_decode_coefficients(plan, reuse_buffer=False)
    np.testing.assert_array_equal(nat, ref)
    got, err = decode_coefficients_device2(plan)
    assert not np.asarray(err).any()
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_sof1_pixels_u16_quality():
    img = _smooth12(120, 136)
    data = encode_rgb(img, quality=95, subsampling=(2, 2), precision=12,
                      engine="python")
    out = np.asarray(decode_plan(parse_jpeg(data)))
    assert out.dtype == np.uint16 and out.shape == img.shape
    assert int(out.max()) <= 4095
    mse = ((out.astype(np.float64) - img) ** 2).mean()
    assert 10 * np.log10(4095 ** 2 / mse) > 40.0


def test_sof9_arithmetic_12bit_cross_tier():
    from jpeg_tpu.entropy.arith import decode_coefficients_arith
    from jpeg_tpu.models.decoder import decode_coefficients_host

    img = _noise12((48, 64, 3), seed=2)
    data = encode_rgb(img, quality=95, subsampling=(2, 2), precision=12,
                      arithmetic=True, engine="python",
                      restart_interval_mcus=2)
    plan = parse_jpeg(data)
    assert plan.precision == 12 and plan.arith_code
    py = decode_coefficients_arith(plan)
    nat = decode_coefficients_host(plan, engine="native")
    np.testing.assert_array_equal(np.asarray(nat), py)
    out = np.asarray(decode_plan(plan))
    assert out.dtype == np.uint16


def test_grayscale_12bit():
    img = _noise12((40, 40), seed=3)
    data = encode_rgb(img, quality=96, precision=12, engine="python")
    out = np.asarray(decode_plan(parse_jpeg(data)))
    assert out.dtype == np.uint16 and out.shape == (40, 40, 3)


def test_ppm_16bit_roundtrip(tmp_path):
    img = _smooth12(16, 24)
    for binary in (True, False):
        p = os.path.join(tmp_path, f"x{binary}.ppm")
        write_ppm(p, img, binary=binary)
        back = read_ppm(p)
        assert back.dtype == np.uint16
        np.testing.assert_array_equal(back, img)


def test_baseline_sof0_12bit_rejected():
    """SOF0 is 8-bit by definition; a 12-bit P field there must raise."""
    img = _noise12((16, 16, 3), seed=4)
    data = bytearray(encode_rgb(img, quality=90, subsampling=(1, 1),
                                precision=12, engine="python"))
    sof = data.find(b"\xff\xc1")
    assert sof >= 0
    data[sof + 1] = 0xC0  # masquerade as baseline
    with pytest.raises(JPEGError):
        parse_jpeg(bytes(data))


def test_native_encoder_rejected_or_correct_for_12bit():
    """The native entropy encoder path must not silently emit wrong
    bits for 12-bit; either it matches the python packer or encode_rgb
    routes around it."""
    from jpeg_tpu.entropy.oracle import decode_coefficients

    img = _noise12((32, 32, 3), seed=5)
    d_py = encode_rgb(img, quality=95, subsampling=(1, 1), precision=12,
                      engine="python")
    d_nat = encode_rgb(img, quality=95, subsampling=(1, 1), precision=12,
                       engine="native")
    c_py = decode_coefficients(parse_jpeg(d_py))
    c_nat = decode_coefficients(parse_jpeg(d_nat))
    np.testing.assert_array_equal(c_nat, c_py)


def test_progressive_12bit_huffman_and_arith():
    """12-bit progressive (SOF2/SOF10): C++ == python coefficient state,
    pixels identical to the baseline 12-bit encode of the same image —
    the full T.81 DCT matrix now covers both precisions."""
    from jpeg_tpu.entropy.progressive import decode_progressive_coefficients
    from jpeg_tpu.models.decoder import decode_coefficients_host
    from jpeg_tpu.models.encoder import encode_rgb_progressive

    img = _noise12((64, 80, 3), seed=7)
    base = np.asarray(decode_plan(parse_jpeg(encode_rgb(
        img, quality=95, subsampling=(2, 2), precision=12,
        engine="python"))))
    for arith in (False, True):
        data = encode_rgb_progressive(img, quality=95, subsampling=(2, 2),
                                      precision=12, arithmetic=arith)
        plan = parse_jpeg(data)
        assert plan.precision == 12 and plan.progressive
        if arith:
            from jpeg_tpu.entropy.arith import (
                decode_progressive_coefficients_arith as pyd,
            )
        else:
            pyd = decode_progressive_coefficients
        py = np.asarray(pyd(plan))
        nat = np.asarray(decode_coefficients_host(plan, engine="native"))
        np.testing.assert_array_equal(nat, py)
        assert int(np.abs(py).max()) > 2047
        prog = np.asarray(decode_plan(plan))
        np.testing.assert_array_equal(prog, base)


def test_spec_chunk_lanes_12bit():
    """Speculative chunk-lane device decoder on a 12-bit stream: the
    raised register gates (27->31 bits) and the native gap decoder's
    wide-magnitude path both get exercised (gap recovery fires on the
    dense 12-bit noise)."""
    from jpeg_tpu.entropy.device_spec import decode_coefficients_device_spec
    from jpeg_tpu.entropy.oracle import decode_coefficients

    img = _noise12((96, 112, 3), seed=31)
    data = encode_rgb(img, quality=96, subsampling=(1, 1), precision=12,
                      engine="python")
    plan = parse_jpeg(data)
    got, stats = decode_coefficients_device_spec(
        plan, target_lanes=16, overlap_mcus=6)
    assert got is not None, stats
    np.testing.assert_array_equal(
        np.asarray(got), decode_coefficients(plan))
