"""In-single-Pallas-kernel entropy decoder (entropy/device_kernel.py):
oracle equivalence in interpret mode across the sampling/precision/table
matrix, incl. corrupt-stream parity (reference semantics,
``src/jpeg/huffman.rs:109-268``). The real-TPU compile status is tracked
separately (tools/probe_kernel_stages.py + the device_path_profitable
ladder) — interpret mode pins the SEMANTICS."""

import numpy as np
import pytest

from jpeg_tpu.entropy.device_kernel import decode_coefficients_device4
from jpeg_tpu.entropy.oracle import decode_coefficients
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.models.encoder import encode_rgb


def _check(img, **enc):
    data = encode_rgb(img, **enc)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    got, err = decode_coefficients_device4(plan, interpret=True)
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


def test_grayscale_and_single_lane():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    _check(gray, quality=85, restart_interval_mcus=8)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    plan = _check(img, quality=85, subsampling=(2, 2))  # no restarts
    assert len(plan.segments) == 1


def test_optimal_tables_long_codes():
    """Per-image optimal tables produce 12-16 bit codes exercising the
    canonical fallback walk (the 11-bit LUT misses)."""
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
    assert int(np.abs(ref).max()) > 2047  # actually exercises >11-bit


def test_corrupt_stream_parity():
    """Corruption must yield the oracle's exact garbage or a raised err
    flag — never silently-different output."""
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
        got, err = decode_coefficients_device4(plan, interpret=True)
        if ref is None:
            assert err.any()
        else:
            assert not err.any()
            np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("gather", ["select", "mxu"])
def test_gather_variants_match_oracle(gather):
    """Both in-kernel gather formulations — [T, S] select-reduce sweep
    and the Kronecker one-hot MXU split (32+64 compares + an exact
    HIGHEST dot) — must be bit-identical to the oracle; the A/B between
    them runs on a healthy tunnel (see the device gate ladder)."""
    rng = np.random.default_rng(50)
    img = rng.integers(0, 256, (80, 96, 3), dtype=np.uint8)
    data = encode_rgb(img, quality=88, subsampling=(2, 2),
                      restart_interval_mcus=5, optimize=True)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    got, err = decode_coefficients_device4(plan, interpret=True,
                                           gather=gather)
    assert not err.any()
    np.testing.assert_array_equal(got, ref)


def test_batch_matches_oracle_mixed_segments():
    """Corpus batch: three images with DIFFERENT restart intervals (so
    per-image segment lengths differ from the batch-wide max) must each
    match their own oracle decode, lanes stacked in one kernel launch."""
    from jpeg_tpu.entropy.device_kernel import (
        decode_coefficients_device4_batch,
    )
    rng = np.random.default_rng(60)
    plans = []
    for i, (shape, ri) in enumerate(
            [((48, 64), 4), ((80, 96), 8), ((64, 48), 2)]):
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        data = encode_rgb(img, quality=85, subsampling=(2, 2),
                          restart_interval_mcus=ri)
        plans.append(parse_jpeg(data))
    got, err = decode_coefficients_device4_batch(plans, interpret=True)
    assert not err.any()
    assert len(got) == len(plans)
    for p, g in zip(plans, got):
        np.testing.assert_array_equal(g, decode_coefficients(p))


def test_batch_rejects_heterogeneous_tables():
    from jpeg_tpu.entropy.device_kernel import kernel_runner_batch

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    a = parse_jpeg(encode_rgb(img, quality=85, restart_interval_mcus=4))
    b = parse_jpeg(encode_rgb(img, quality=85, restart_interval_mcus=4,
                              optimize=True))  # per-image tables differ
    with pytest.raises(ValueError, match="identical slot structure"):
        kernel_runner_batch([a, b])


def test_suggest_device_batch_calibration():
    """The VMEM-model auto-sizer (suggest_device_batch) stays inside the
    measured on-chip walls: 4K row-restart batch 7 OOMs at 16.63 MB
    scoped (16 MB limit) so the pick must be <= 6; 1080p batch 24 runs
    and 32 OOMs so the pick must land in [16, 31]. Monotone in budget,
    >= 1 always."""
    from jpeg_tpu.entropy.device_kernel import suggest_device_batch
    from jpeg_tpu.io.corpus import synthetic_jpeg

    p4k = parse_jpeg(synthetic_jpeg(3840, 2160, restart_rows=1, seed=0))
    p1080 = parse_jpeg(synthetic_jpeg(1920, 1080, seed=0))
    b4k = suggest_device_batch(p4k)
    b1080 = suggest_device_batch(p1080)
    assert 1 <= b4k <= 6
    assert 16 <= b1080 <= 31
    assert b1080 > b4k
    # Monotone in budget; floor of 1 even under an absurdly small budget.
    assert suggest_device_batch(p4k, vmem_budget=1) == 1
    assert (suggest_device_batch(p1080, vmem_budget=24 << 20)
            >= b1080)


def test_hybrid_auto_batch_smoke(monkeypatch):
    """BatchedCorpusDecoder(hybrid_device=True) with device_batch=None
    resolves the batch from the corpus geometry and still decodes
    bit-exactly (interpret mode on CPU). The small explicit VMEM budget
    forces a small auto-batch so the device thread genuinely claims work
    — asserted via a launch counter, so this can't silently pass on the
    host route alone (advisor r4)."""
    import jpeg_tpu.entropy.device_window as dw
    from jpeg_tpu.io.corpus import synthetic_image
    from jpeg_tpu.models.decoder import decode_bytes
    from jpeg_tpu.parallel.pipeline import BatchedCorpusDecoder

    launches = []
    real = dw.decode_coefficients_device5_batch

    def counting(plans, **kw):
        launches.append(len(plans))
        return real(plans, **kw)

    monkeypatch.setattr(dw, "decode_coefficients_device5_batch", counting)

    items = [
        encode_rgb(synthetic_image(128, 128, seed=i), quality=85,
                   subsampling=(2, 2), restart_interval_mcus=1)
        for i in range(24)
    ]
    # 64 segments/image: under a 400 KB budget the measured-frame model
    # (0.55x the analytic 0.5 MB) fits 2 images (128 lanes = one pad
    # tile, ~288 KB) but not 3 (192 -> 256-lane tile, ~577 KB), so the
    # auto-batch resolves to 2 and claims genuinely happen.
    dec = BatchedCorpusDecoder(workers=1, hybrid_device=True,
                               device_vmem_budget=400 << 10,
                               _device_interpret=True)
    results = dec.decode_all(items)
    assert launches, "device thread never claimed a batch"
    assert all(n <= 2 for n in launches)
    assert all(r.ok for r in results)
    for data, r in zip(items, results):
        np.testing.assert_array_equal(r.rgb, decode_bytes(data, path="fast"))


def test_fit_batch_plans_refits_to_claimed_geometry():
    """A claim whose LATER images have longer restart segments than the
    probe image must be split so each launch's VMEM model fits the
    budget (advisor r4: auto-batch sized from items[-1] only)."""
    from types import SimpleNamespace

    from jpeg_tpu.entropy.device_kernel import (
        _launch_model_bytes,
        _plan_w,
        fit_batch_plans,
    )

    def fake_plan(n_segs, seg_bytes):
        segs = [SimpleNamespace(byte_start=i * seg_bytes,
                                byte_end=(i + 1) * seg_bytes)
                for i in range(n_segs)]
        return SimpleNamespace(segments=segs, blocks_per_mcu=6)

    small = fake_plan(128, 400)    # w bucket 256
    big = fake_plan(128, 4000)     # w bucket 1024
    assert _plan_w(small) == 256 and _plan_w(big) == 1024
    plans = [small, small, big, big]
    # Budget = exactly one launch of [big, big]: [small, small, big]
    # (384 lanes at big's W) exceeds it, so the claim must split.
    budget = _launch_model_bytes(1024, 256, 6)
    chunks = fit_batch_plans(plans, vmem_budget=budget)
    assert [len(c) for c in chunks] == [2, 2]
    assert chunks[0] == [small, small] and chunks[1] == [big, big]
    for c in chunks:
        w = max(_plan_w(p) for p in c)
        s = sum(len(p.segments) for p in c)
        assert _launch_model_bytes(w, s, 6) <= budget
    # A single plan over budget still forms its own chunk.
    assert fit_batch_plans([big], vmem_budget=1) == [[big]]


def test_hybrid_finalize_error_falls_back(monkeypatch):
    """An exception surfacing at the deferred sync point (finalize) must
    fall back to the exact host route, not kill the device thread
    (advisor r4 medium: async XLA errors land in finalize, outside the
    dispatch-side try/except)."""
    import jpeg_tpu.entropy.device_window as dw
    from jpeg_tpu.io.corpus import synthetic_image
    from jpeg_tpu.models.decoder import decode_bytes
    from jpeg_tpu.parallel.pipeline import BatchedCorpusDecoder

    real = dw.decode_coefficients_device5_batch

    class Boom:
        """Array-like whose materialization raises, like a deferred
        XLA runtime error under to_host=False."""

        def __array__(self, dtype=None):
            raise RuntimeError("async device error")

        def __getitem__(self, k):
            raise RuntimeError("async device error")

    def poisoned(plans, **kw):
        coeffs, _err = real(plans, **kw)
        return coeffs, Boom()

    monkeypatch.setattr(dw, "decode_coefficients_device5_batch", poisoned)
    items = [
        encode_rgb(synthetic_image(64, 48, seed=i), quality=85,
                   subsampling=(2, 2), restart_interval_mcus=2)
        for i in range(12)
    ]
    dec = BatchedCorpusDecoder(workers=2, hybrid_device=True,
                               device_batch=2, _device_interpret=True)
    results = dec.decode_all(items)
    assert all(r.ok for r in results)
    for data, r in zip(items, results):
        np.testing.assert_array_equal(r.rgb, decode_bytes(data, path="fast"))


def test_hybrid_window_overflow_falls_back(monkeypatch):
    """Per-lane window overflow (error bit 1) must route the whole image
    through the exact host path — forced here by shrinking every claim's
    window to 16 words so all lanes overflow."""
    import jpeg_tpu.entropy.device_window as dw
    from jpeg_tpu.io.corpus import synthetic_image
    from jpeg_tpu.models.decoder import decode_bytes
    from jpeg_tpu.parallel.pipeline import BatchedCorpusDecoder

    real = dw.decode_coefficients_device5_batch
    overflowed = []

    def tiny_window(plans, **kw):
        kw["w_chunk"], kw["safety"] = 16, 0.01
        res, err = real(plans, **kw)
        import numpy as _np

        overflowed.append(bool(_np.asarray(err).any()))
        return res, err

    monkeypatch.setattr(dw, "decode_coefficients_device5_batch",
                        tiny_window)
    items = [
        encode_rgb(synthetic_image(96, 64, seed=i), quality=85,
                   subsampling=(2, 2), restart_interval_mcus=3)
        for i in range(10)
    ]
    dec = BatchedCorpusDecoder(workers=2, hybrid_device=True,
                               device_batch=2, _device_interpret=True)
    results = dec.decode_all(items)
    assert overflowed and all(overflowed), "no claim actually overflowed"
    assert all(r.ok for r in results)
    for data, r in zip(items, results):
        np.testing.assert_array_equal(r.rgb, decode_bytes(data, path="fast"))
