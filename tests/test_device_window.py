"""Windowed in-kernel entropy decoder (entropy/device_window.py): oracle
equivalence in interpret mode — multi-launch chains, per-lane window
re-basing, overflow flagging — plus the VMEM-model sizing helpers.
Reference contract: ``src/jpeg/huffman.rs:109-268``; the real-TPU compile
and throughput ladder live in tools/probe_window_kernel.py."""

import numpy as np
import pytest

from jpeg_tpu.entropy.device_window import (
    decode_coefficients_device5,
    decode_coefficients_device5_batch,
    fit_window_plans,
    suggest_window_batch,
)
from jpeg_tpu.entropy.oracle import decode_coefficients
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.models.encoder import encode_rgb


def _check(img, w_chunk=256, **enc):
    data = encode_rgb(img, **enc)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    got, err = decode_coefficients_device5(plan, interpret=True,
                                           w_chunk=w_chunk)
    assert not err.any()
    np.testing.assert_array_equal(got, ref)
    return plan


@pytest.mark.parametrize(
    "sub,quality,ri",
    [((1, 1), 95, 10), ((2, 1), 70, 4), ((2, 2), 85, 6), ((1, 2), 80, 5)],
)
def test_matches_oracle_samplings(sub, quality, ri):
    rng = np.random.default_rng(hash((sub, quality)) % 2**31)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    _check(img, quality=quality, subsampling=sub, restart_interval_mcus=ri)


def test_multi_launch_chain_matches_single():
    """Decodes must be identical however the MCU stream is cut into
    launches: w_chunk 128 (many launches, G=1 for dense noise) vs 1024
    (one launch) vs the oracle."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    data = encode_rgb(img, quality=85, subsampling=(2, 2),
                      restart_interval_mcus=6)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    for wc in (128, 256, 1024):
        got, err = decode_coefficients_device5(plan, interpret=True,
                                               w_chunk=wc)
        assert not err.any()
        np.testing.assert_array_equal(got, ref)


def test_grayscale_and_single_lane():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    _check(gray, quality=85, restart_interval_mcus=8)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    plan = _check(img, quality=85, subsampling=(2, 2))  # no restarts
    assert len(plan.segments) == 1


def test_optimal_tables_long_codes():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (80, 80, 3), dtype=np.uint8)
    _check(img, quality=92, subsampling=(2, 2), restart_interval_mcus=5,
           optimize=True)


def test_12bit_magnitudes():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, (48, 64, 3), dtype=np.uint16)
    plan = _check(img, quality=97, subsampling=(1, 1), precision=12,
                  engine="python", restart_interval_mcus=3)
    ref = decode_coefficients(plan)
    assert int(np.abs(ref).max()) > 2047


def test_corrupt_stream_parity():
    """Corruption must yield the oracle's exact garbage or a raised err
    flag — never silently-different output (same contract as v4)."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    for seed in range(4):
        data = bytearray(encode_rgb(img, quality=85, subsampling=(1, 1),
                                    restart_interval_mcus=6))
        data[len(data) // 2 + 11 * seed] ^= 0xFF
        plan = parse_jpeg(bytes(data))
        try:
            ref = decode_coefficients(plan)
        except ValueError:
            ref = None
        got, err = decode_coefficients_device5(plan, interpret=True,
                                               w_chunk=256)
        if ref is None:
            assert err.any()
        else:
            assert not err.any()
            np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("gather", ["select", "mxu"])
def test_gather_variants_match_oracle(gather):
    rng = np.random.default_rng(50)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    data = encode_rgb(img, quality=88, subsampling=(2, 2),
                      restart_interval_mcus=5, optimize=True)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    got, err = decode_coefficients_device5(plan, interpret=True,
                                           gather=gather, w_chunk=256)
    assert not err.any()
    np.testing.assert_array_equal(got, ref)


def test_batch_matches_oracle_mixed_segments():
    rng = np.random.default_rng(60)
    plans = []
    for i, (shape, ri) in enumerate(
            [((48, 64), 4), ((80, 96), 8), ((64, 48), 2)]):
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        data = encode_rgb(img, quality=85, subsampling=(2, 2),
                          restart_interval_mcus=ri)
        plans.append(parse_jpeg(data))
    got, err = decode_coefficients_device5_batch(plans, interpret=True,
                                                 w_chunk=256)
    assert not err.any()
    assert len(got) == len(plans)
    for p, g in zip(plans, got):
        np.testing.assert_array_equal(g, decode_coefficients(p))


def test_batch_rejects_heterogeneous_tables():
    from jpeg_tpu.entropy.device_window import window_runner_batch

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    a = parse_jpeg(encode_rgb(img, quality=85, restart_interval_mcus=4))
    b = parse_jpeg(encode_rgb(img, quality=85, restart_interval_mcus=4,
                              optimize=True))
    with pytest.raises(ValueError, match="identical slot structure"):
        window_runner_batch([a, b])


def test_window_overflow_flags_not_corrupts():
    """A window too small for the stream's rate must FLAG the lane
    (error bit 1 -> host fallback), never return unflagged garbage."""
    rng = np.random.default_rng(62)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    plan = parse_jpeg(encode_rgb(img, quality=85, subsampling=(2, 2),
                                 restart_interval_mcus=6))
    got, err = decode_coefficients_device5(plan, interpret=True,
                                           w_chunk=16, safety=0.01)
    assert err.all()  # every lane overflows a 16-word window


def test_suggest_window_batch_beats_v4_ceiling():
    """The windowed VMEM model must lift the batch ceiling well past the
    v4 resident-word model on long-segment (4K-like) geometry."""
    from types import SimpleNamespace

    from jpeg_tpu.entropy.device_kernel import suggest_device_batch

    segs = [SimpleNamespace(byte_start=i * 8000, byte_end=(i + 1) * 8000,
                            mcu_count=240) for i in range(135)]
    plan = SimpleNamespace(segments=segs, blocks_per_mcu=6)
    b4 = suggest_device_batch(plan)
    b5 = suggest_window_batch(plan)
    assert b5 >= 2 * b4
    # fit_window_plans splits consistently with the same model
    chunks = fit_window_plans([plan] * (b5 + 1))
    assert len(chunks) == 2 and len(chunks[0]) == b5
