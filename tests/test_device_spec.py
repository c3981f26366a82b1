"""Speculative chunk-lane device entropy decoder: equivalence vs the
oracle (SURVEY.md §7 layer 4), including forced gap recovery (tiny
overlap budgets) and corrupt-stream garbage-in-garbage-out parity with
the reference semantics (``src/jpeg/huffman.rs:109-268``)."""

import numpy as np
import pytest

from jpeg_tpu.entropy.device_spec import decode_coefficients_device_spec
from jpeg_tpu.entropy.oracle import decode_coefficients
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.models.encoder import encode_rgb


def _roundtrip(img, lanes, overlap, **enc):
    data = encode_rgb(img, quality=enc.pop("quality", 80), **enc)
    plan = parse_jpeg(data)
    got, stats = decode_coefficients_device_spec(
        plan, target_lanes=lanes, overlap_mcus=overlap)
    assert got is not None, stats
    np.testing.assert_array_equal(
        np.asarray(got), decode_coefficients(plan))
    return stats


@pytest.mark.parametrize(
    "sub,size,lanes",
    [
        ((1, 1), (128, 128), 16),
        ((2, 1), (192, 256), 24),
        ((2, 2), (256, 256), 32),
        ((1, 2), (160, 160), 16),
    ],
)
def test_matches_oracle_no_restarts(sub, size, lanes):
    rng = np.random.default_rng(hash((sub, size)) % 2**31)
    img = rng.integers(0, 256, size + (3,), dtype=np.uint8)
    _roundtrip(img, lanes, 24, subsampling=sub)


def test_gap_recovery_forced_by_tiny_overlap():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    stats = _roundtrip(img, 48, 2, subsampling=(2, 2))
    # With a 2-MCU overlap many links break; the merge must bridge them
    # on the host and stay bit-exact.
    assert stats["gap_mcus"] > 0


def test_restart_segments_with_gap_recovery():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (256, 320, 3), dtype=np.uint8)
    stats = _roundtrip(img, 64, 4, subsampling=(2, 2),
                       restart_interval_mcus=20)
    assert stats["merged"] > 1


def test_grayscale_heavy_gaps():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (200, 200), dtype=np.uint8)
    stats = _roundtrip(img, 32, 3)
    assert stats["gap_mcus"] > 0


def test_corrupt_stream_matches_oracle_or_falls_back():
    """Corruption must yield either the oracle's exact garbage (the
    speculative chain verified against the true — corrupt — parse) or a
    None fallback; never silently-different output."""
    for seed in range(6):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
        data = bytearray(encode_rgb(img, quality=80, subsampling=(1, 1)))
        data[len(data) // 2 + seed] ^= 0xFF
        plan = parse_jpeg(bytes(data))
        try:
            ref = decode_coefficients(plan)
        except ValueError:
            ref = None
        got, _stats = decode_coefficients_device_spec(
            plan, target_lanes=16, overlap_mcus=4)
        if got is None:
            continue
        assert ref is not None
        np.testing.assert_array_equal(np.asarray(got), ref)


def test_pair_kernel_12bit_large_magnitudes():
    """12-bit streams carry magnitudes of up to 14 (AC) / 15 (DC) bits,
    which do not fit the pair entry's 13-bit two's-complement value
    field; such symbols must route through MODE_SLOW (advisor r3
    finding: value 5000 wrapped to -3191). Per-image optimal tables
    give the large size categories short codes, hitting the
    len+size<=16 window that previously classified them SINGLE/PAIR."""
    from jpeg_tpu.entropy.device_decode2 import decode_coefficients_device3

    rng = np.random.default_rng(31)
    img = rng.integers(0, 4096, (96, 96, 3), dtype=np.uint16)
    # Alternating flat-extreme 8x8 blocks (DC deltas ~ +-32k: size 15)
    # and pixel checkerboards (single huge AC coefficient: size >= 13).
    yy, xx = np.mgrid[0:96, 0:96]
    flat = np.where(((yy // 8 + xx // 8) % 2) == 0, 0, 4095)
    checker = np.where(((yy + xx) % 2) == 0, 0, 4095)
    big = np.where(((yy // 8) % 2) == 0, flat, checker)
    img[..., 0] = big
    data = encode_rgb(img, quality=100, subsampling=(1, 1), precision=12,
                      engine="python", optimize=True)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    assert int(np.abs(ref).max()) >= 4096  # stream has >=13-bit values
    got, err = decode_coefficients_device3(plan)
    assert not np.asarray(err).any()
    np.testing.assert_array_equal(np.asarray(got), ref)
    got2, stats = decode_coefficients_device_spec(
        plan, target_lanes=16, overlap_mcus=8, pair=True)
    assert got2 is not None, stats
    np.testing.assert_array_equal(np.asarray(got2), ref)


def test_pair_table_routes_large_sizes_slow():
    """Unit check of the table builder: a short code bound to a >=13-bit
    size category must be MODE_SLOW, and never symbol 2 of a pair."""
    from jpeg_tpu.entropy.device_pair import (
        MODE_PAIR, MODE_SLOW, build_pair_table)
    from jpeg_tpu.entropy.tables import HuffmanTable

    bits = np.zeros(16, np.uint8)
    bits[0] = 1  # 1-bit code '0' -> size 13
    bits[1] = 2  # 2-bit codes '10', '11' -> sizes 1, 2
    table = HuffmanTable.from_bits_values(bits, np.array([13, 1, 2],
                                                         np.uint8))
    pt = build_pair_table(table, table, True)
    a = pt[:, 0].astype(np.int64)
    mode = a & 3
    # peek starting with bit 0 -> the size-13 code: must be slow.
    assert (mode[: 1 << 15] == MODE_SLOW).all()
    # pairs whose SECOND symbol would be the size-13 code are rejected:
    # every pair entry's consumed-bit split must leave sym2 a size < 13.
    b = pt[:, 1].astype(np.int64)
    is_pair = mode == MODE_PAIR
    v2 = (b >> 9) & 0x1FFF
    v2 = v2 - ((v2 >> 12) << 13)
    assert is_pair.any()
    assert (np.abs(v2[is_pair]) < (1 << 12)).all()


def test_pair_kernel_spec_path():
    """pair=True routes through the pair-symbol lean decoder
    (device_pair tables + 64-bit refills); kept correct even though the
    v2 single-symbol kernel is the measured default."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (160, 192, 3), dtype=np.uint8)
    data = encode_rgb(img, quality=80, subsampling=(2, 2))
    plan = parse_jpeg(data)
    got, stats = decode_coefficients_device_spec(
        plan, target_lanes=24, overlap_mcus=8, pair=True)
    assert got is not None, stats
    np.testing.assert_array_equal(
        np.asarray(got), decode_coefficients(plan))
