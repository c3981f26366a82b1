"""Lossless JPEG (SOF3, T.81 Annex H). No lossless-capable ground-truth
decoder exists in this image (libjpeg-turbo 2.1.5 predates lossless), so
the contract is anchored three ways: a HAND-DERIVED spec vector (stream
bytes assembled from the Annex H algebra by hand, no encoder involved),
encoder/decoder round-trip exactness across the predictor x precision x
restart matrix, and device-scan (cumsum) vs oracle equality."""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.entropy.lossless import (decode_lossless, encode_lossless,
                                       reconstruct_device)
from jpeg_tpu.io.container import JPEGError, parse_jpeg


def _bits_to_bytes(bits: str) -> bytes:
    bits += "1" * (-len(bits) % 8)  # F.1.2.3 pad with 1s
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = int(bits[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)  # B.1.1.5 byte stuffing
    return bytes(out)


def test_hand_derived_spec_vector():
    """2x2 grayscale, predictor 1, Pt=0, derived by hand from H.1/H.2:

    samples [[100, 50], [25, 200]]; default prediction 128 (H.1.2.2).
      (0,0): pred 128 -> diff -28  (SSSS 5,  bits -28+31  = 00011)
      (0,1): first line, Ra=100 -> diff -50  (SSSS 6, -50+63 = 001101)
      (1,0): row start,  Rb=100 -> diff -75  (SSSS 7, -75+127= 0110100)
      (1,1): pred 1,     Ra=25  -> diff 175  (SSSS 8,  175   = 10101111)
    Table: SSSS {5,6,7,8} as 2-bit codes 00,01,10,11 (BITS=[0,4,0...]).
    """
    sof = bytes([8, 0, 2, 0, 2, 1, 1, 0x11, 0])
    dht = bytes([0x00]) + bytes([0, 4] + [0] * 14) + bytes([5, 6, 7, 8])
    sos = bytes([1, 1, 0x00, 1, 0, 0])  # Ss=1 (predictor), Se=0, AhAl=0
    scan = _bits_to_bytes(
        "00" "00011" "01" "001101" "10" "0110100" "11" "10101111")
    data = (b"\xff\xd8"
            + b"\xff\xc3" + (len(sof) + 2).to_bytes(2, "big") + sof
            + b"\xff\xc4" + (len(dht) + 2).to_bytes(2, "big") + dht
            + b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
            + scan + b"\xff\xd9")
    plan = parse_jpeg(data)
    assert plan.lossless and plan.predictor == 1
    out = decode_lossless(plan)
    np.testing.assert_array_equal(
        out[:, :, 0], np.array([[100, 50], [25, 200]], np.uint16))


@pytest.mark.parametrize("predictor", range(1, 8))
@pytest.mark.parametrize("restart", [0, 13])
def test_roundtrip_predictors(predictor, restart):
    rng = np.random.default_rng(predictor * 31 + restart)
    img = rng.integers(0, 256, (21, 26, 3), dtype=np.uint8)
    data = encode_lossless(img, predictor=predictor,
                           restart_interval=restart)
    out = decode_lossless(parse_jpeg(data))
    np.testing.assert_array_equal(out, img.astype(np.uint16))


@pytest.mark.parametrize("precision,pt", [(8, 0), (12, 0), (16, 0),
                                          (12, 3), (16, 2)])
def test_roundtrip_precisions_point_transform(precision, pt):
    rng = np.random.default_rng(precision + pt)
    img = rng.integers(0, 1 << precision, (18, 17), dtype=np.uint16)
    data = encode_lossless(img, predictor=4, point_transform=pt,
                           precision=precision)
    plan = parse_jpeg(data)
    assert plan.precision == precision and plan.point_transform == pt
    out = decode_lossless(plan)[:, :, 0]
    np.testing.assert_array_equal(out, (img >> pt).astype(np.uint16) << pt)


@pytest.mark.parametrize("predictor", [1, 2])
def test_device_scan_reconstruction(predictor):
    """Predictors 1/2 reconstruct as jnp.cumsum prefix scans — must be
    bit-identical to the sequential oracle, including mod-2^16 wraps."""
    rng = np.random.default_rng(40 + predictor)
    img = rng.integers(0, 1 << 16, (23, 19, 3), dtype=np.uint16)
    data = encode_lossless(img, predictor=predictor, precision=16)
    plan = parse_jpeg(data)
    oracle = decode_lossless(plan)
    from jpeg_tpu.entropy.lossless import decode_diffs

    dev = reconstruct_device(plan, decode_diffs(plan))
    assert dev is not None
    np.testing.assert_array_equal(np.asarray(dev), oracle)
    # restart plans must decline the scan path
    data_r = encode_lossless(img, predictor=predictor, precision=16,
                             restart_interval=7)
    plan_r = parse_jpeg(data_r)
    assert reconstruct_device(plan_r, decode_diffs(plan_r)) is None
    np.testing.assert_array_equal(decode_lossless(plan_r), oracle)


def test_category_16_diff():
    """A +32768 wrap (SSSS=16, NO extra bits — H.2 Table H.2) survives
    the round trip; exercised by extreme-alternating 16-bit samples."""
    img = np.zeros((4, 4), np.uint16)
    img[::2, ::2] = 0x8000
    img[1::2, 1::2] = 0x8000
    data = encode_lossless(img, predictor=1, precision=16)
    out = decode_lossless(parse_jpeg(data))[:, :, 0]
    np.testing.assert_array_equal(out, img)


def test_public_decode_api_and_errors():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    data = encode_lossless(img, predictor=7)
    rgb = np.asarray(jpeg_tpu.decode_bytes(data))
    assert rgb.dtype == np.uint8
    np.testing.assert_array_equal(rgb, img)
    gray = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    g = np.asarray(jpeg_tpu.decode_bytes(encode_lossless(gray)))
    assert g.shape == (8, 9, 3)
    np.testing.assert_array_equal(g[:, :, 0], gray)
    # malformed headers raise typed errors
    bad = bytearray(data)
    sos = bad.find(b"\xff\xda")
    bad[sos + 2 + 2 + 1 + 2 * 3] = 0  # Ss (predictor) = 0
    with pytest.raises(JPEGError):
        parse_jpeg(bytes(bad))


def test_native_tier_matches_oracle():
    """C++ jt_decode_lossless (segment-parallel diffs + sequential
    prediction) must be bit-identical to the python oracle across
    predictors, precisions, restarts, and the point transform."""
    from jpeg_tpu.entropy.lossless import decode_diffs, reconstruct
    from jpeg_tpu.runtime import native_decode_lossless

    rng = np.random.default_rng(77)
    for pred in (1, 3, 4, 6, 7):
        for prec, ri, pt in ((8, 0, 0), (16, 13, 0), (12, 7, 2)):
            img = rng.integers(0, 1 << prec, (19, 23, 3)).astype(np.uint16)
            data = encode_lossless(img, predictor=pred, precision=prec,
                                   restart_interval=ri, point_transform=pt)
            plan = parse_jpeg(data)
            oracle = reconstruct(plan, decode_diffs(plan))
            np.testing.assert_array_equal(native_decode_lossless(plan),
                                          oracle)


def test_native_tier_corrupt_stream_raises():
    from jpeg_tpu.runtime import native_decode_lossless

    rng = np.random.default_rng(78)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_lossless(img, predictor=2))
    sos = bytes(data).find(b"\xff\xda")
    for off in range(20, 40):
        d = bytearray(data)
        d[sos + off] ^= 0xFF
        try:
            plan = parse_jpeg(bytes(d))
        except JPEGError:
            continue
        try:
            a = native_decode_lossless(plan)
            ok_native = True
        except ValueError:
            ok_native = False
        try:
            b = decode_lossless(plan, engine="oracle")
            ok_oracle = True
        except ValueError:
            ok_oracle = False
        assert ok_native == ok_oracle
        if ok_native:
            np.testing.assert_array_equal(a, b)


def test_16bit_ppm_roundtrip(tmp_path):
    """16-bit lossless decodes write maxval-65535 PPMs (the writer used
    to hardcode 4095, silently corrupting >12-bit samples)."""
    import os

    from jpeg_tpu.io.ppm import read_ppm, write_ppm

    rng = np.random.default_rng(9)
    img = rng.integers(0, 1 << 16, (10, 11, 3), dtype=np.uint16)
    out = decode_lossless(parse_jpeg(encode_lossless(img, precision=16)))
    p = os.path.join(tmp_path, "x.ppm")
    write_ppm(p, out)
    back, maxval = read_ppm(p, return_maxval=True)
    assert maxval == 65535
    np.testing.assert_array_equal(back, img)


def test_auto_predictor_beats_or_matches_fixed_worst():
    """predictor="auto" picks per image from an entropy estimate; on a
    smooth gradient it must not lose to the worst fixed predictor and
    must still round-trip exactly."""
    yy, xx = np.mgrid[0:40, 0:48]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    auto = encode_lossless(img, predictor="auto")
    out = decode_lossless(parse_jpeg(auto))[:, :, 0]
    np.testing.assert_array_equal(out, img)
    worst = max(len(encode_lossless(img, predictor=p))
                for p in range(1, 8))
    assert len(auto) <= worst


def test_four_component_lossless():
    """4-component lossless streams decode component-direct (no color
    transform in Annex H); the public API returns [H, W, 4]."""
    rng = np.random.default_rng(90)
    img = rng.integers(0, 256, (10, 12, 4), dtype=np.uint8)
    out = np.asarray(jpeg_tpu.decode_bytes(
        encode_lossless(img, predictor=2)))
    assert out.shape == (10, 12, 4)
    np.testing.assert_array_equal(out, img)
