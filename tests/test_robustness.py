"""Corrupt-input robustness: truncated and bit-flipped streams must never
crash, leak uninitialized memory, or diverge between engines.

The reference has known OOB-on-malformed-input bugs (SURVEY.md §2); a
production decoder instead recovers like libjpeg: decode what is there,
zero-fill the missing tail, keep all engines bit-identical so parallel and
sequential paths stay interchangeable even on garbage.
"""

import numpy as np
import pytest

import jpeg_tpu
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.io.corpus import synthetic_jpeg

BASE = synthetic_jpeg(160, 112, seed=5)


def _decode_all_engines(data):
    """Decode with every engine/path; all must agree (or all must raise)."""
    outs, errs = {}, {}
    for name, kw in (
        ("oracle", dict(engine="oracle")),
        ("native", dict(engine="native")),
        ("fast", dict(path="fast")),
    ):
        try:
            outs[name] = jpeg_tpu.decode_bytes(data, **kw)
        except Exception as e:  # noqa: BLE001 - recording, not hiding
            errs[name] = type(e).__name__
    return outs, errs


@pytest.mark.parametrize("pct", [10, 30, 50, 70, 90, 99])
def test_truncated_stream_no_crash_engines_agree(pct):
    data = BASE[: len(BASE) * pct // 100]
    outs, errs = _decode_all_engines(data)
    # Either everything raised (header too damaged) or everything decoded.
    assert not (outs and errs), (list(outs), errs)
    if outs:
        ref = outs["oracle"]
        assert ref.shape == (112, 160, 3)
        for name, arr in outs.items():
            np.testing.assert_array_equal(arr, ref, err_msg=name)


@pytest.mark.parametrize("seed", range(12))
def test_bitflips_no_crash_engines_agree(seed):
    rng = np.random.default_rng(seed)
    d = bytearray(BASE)
    for _ in range(3):
        i = int(rng.integers(2, len(d)))
        d[i] ^= int(rng.integers(1, 256))
    outs, errs = _decode_all_engines(bytes(d))
    assert not (outs and errs), (list(outs), errs)
    if outs:
        ref = outs["oracle"]
        for name, arr in outs.items():
            np.testing.assert_array_equal(arr, ref, err_msg=name)
    else:
        # identical error classes across engines
        assert len(set(errs.values())) == 1, errs


def test_truncated_tail_is_neutral_not_heap():
    """Missing restart segments must decode to neutral gray (zero
    coefficients), not uninitialized/stale buffer contents — for BOTH a
    fresh buffer and a reused one primed with a different image."""
    from jpeg_tpu.runtime import native_decode_coefficients

    # Prime the thread's reuse buffer with a full decode of another image.
    other = synthetic_jpeg(160, 112, seed=9)
    jpeg_tpu.decode_bytes(other, engine="native")
    jpeg_tpu.decode_bytes(other, path="fast")

    trunc = BASE[: len(BASE) * 40 // 100]
    plan = parse_jpeg(trunc)
    covered = sum(s.mcu_count for s in plan.segments)
    assert covered < plan.n_mcus  # the premise: segments lost to truncation
    coeffs = np.asarray(native_decode_coefficients(plan))
    tail = coeffs[covered * plan.blocks_per_mcu:]
    assert tail.size and (tail == 0).all()
    # Pixel-level: the uncovered MCU rows are flat gray in every path.
    for kw in (dict(engine="native"), dict(path="fast")):
        rgb = jpeg_tpu.decode_bytes(trunc, **kw)
        rows_done = (covered // plan.mcus_x) * 8 * plan.v_max
        assert (rgb[rows_done + 8:] == rgb[rows_done + 8, 0, 0]).all(), kw


def test_garbage_and_empty_inputs_raise_cleanly():
    for bad in (b"", b"\xff", b"\xff\xd8", b"PNG\r\n", bytes(1000)):
        with pytest.raises(ValueError):
            jpeg_tpu.decode_bytes(bad)


def _prog_bytes():
    from jpeg_tpu.io.corpus import synthetic_image
    from jpeg_tpu.models.encoder import encode_rgb_progressive

    return encode_rgb_progressive(synthetic_image(160, 112, seed=5), quality=85)


@pytest.mark.parametrize("pct", [10, 40, 70, 97])
def test_progressive_truncation_engines_agree(pct):
    """Truncated progressive streams render the scans that arrived (the
    point of progressive) and stay bit-identical across engines."""
    data = _prog_bytes()
    d = data[: len(data) * pct // 100]
    a = jpeg_tpu.decode_bytes(d, engine="oracle")
    b = jpeg_tpu.decode_bytes(d, engine="native")
    assert a.shape == (112, 160, 3)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", range(8))
def test_progressive_bitflips_engines_agree(seed):
    data = _prog_bytes()
    rng = np.random.default_rng(seed)
    d = bytearray(data)
    for _ in range(3):
        i = int(rng.integers(2, len(d)))
        d[i] ^= int(rng.integers(1, 256))
    res = {}
    for eng in ("oracle", "native"):
        try:
            res[eng] = jpeg_tpu.decode_bytes(bytes(d), engine=eng)
        except ValueError as e:
            res[eng] = type(e).__name__
    a, b = res["oracle"], res["native"]
    if isinstance(a, np.ndarray):
        np.testing.assert_array_equal(a, b)
    else:
        assert a == b


def test_container_validation_rejects_malformed_headers():
    """Spec-level header validation raises JPEGError (shared by all engines):
    DC Huffman symbols are size categories 0..16, table/quant destinations
    are 0..3, and marker segments must not run past the stream."""
    from jpeg_tpu.io.container import JPEGError

    data = bytearray(BASE)

    def patched(fn):
        d = bytearray(data)
        fn(d)
        return bytes(d)

    # DC Huffman symbol > 16: first DHT is the luma DC table.
    i = bytes(data).find(b"\xff\xc4")
    assert i > 0 and data[i + 4] & 0xF0 == 0  # class 0 = DC
    bad_dc = patched(lambda d: d.__setitem__(i + 4 + 17, 0xFF))
    # DHT destination > 3
    bad_dest = patched(lambda d: d.__setitem__(i + 4, 0x0B))
    # SOF component quant id > 3 (first component's Tq byte)
    j = bytes(data).find(b"\xff\xc0")
    bad_tq = patched(lambda d: d.__setitem__(j + 12, 0xE4))
    for name, b in (("dc_sym", bad_dc), ("dest", bad_dest), ("tq", bad_tq)):
        for eng in ("oracle", "native"):
            with pytest.raises(JPEGError):
                jpeg_tpu.decode_bytes(b, engine=eng)
    # Truncation mid-marker-header (right after a marker byte pair)
    with pytest.raises(JPEGError):
        parse_jpeg(bytes(data[: i + 3]))


def test_encoder_rejects_empty_and_bad_shapes():
    from jpeg_tpu.io.corpus import synthetic_image
    from jpeg_tpu.models.encoder import encode_rgb, encode_rgb_progressive

    for bad in (np.zeros((0, 0, 3), np.uint8), np.zeros((4, 0, 3), np.uint8),
                np.zeros((4, 4, 2), np.uint8), np.zeros((8,), np.uint8)):
        with pytest.raises(ValueError):
            encode_rgb(bad)
        with pytest.raises(ValueError):
            encode_rgb_progressive(bad)
    # 1x1 stays valid.
    img = synthetic_image(1, 1, seed=0)
    assert jpeg_tpu.decode_bytes(encode_rgb(img)).shape == (1, 1, 3)


def test_invalid_progression_parameters_rejected():
    """A refinement scan must peel exactly one bit (Ah == Al+1, libjpeg
    jdphuff start_pass); corrupt Ah/Al previously decoded divergent garbage."""
    from jpeg_tpu.io.container import JPEGError

    data = bytearray(_prog_bytes())
    # Find a single-component AC scan header: SOS with ncomp==1, patch Ah/Al.
    i = 0
    patched = None
    while True:
        i = bytes(data).find(b"\xff\xda", i + 1)
        if i < 0:
            break
        if data[i + 4] == 1 and data[i + 7] > 0:  # ncomp=1, ss>0
            patched = i + 9  # the Ah<<4|Al byte
            break
    assert patched is not None
    data[patched] = 0x34  # Ah=3, Al=4: not a one-bit refinement
    for eng in ("oracle", "native"):
        with pytest.raises(JPEGError):
            jpeg_tpu.decode_bytes(bytes(data), engine=eng)


def test_dqt_destination_out_of_range_rejected():
    """DQT table destinations are 0..3 (fuzz pil_opt:80 regression)."""
    from jpeg_tpu.io.container import JPEGError

    data = bytearray(BASE)
    i = bytes(data).find(b"\xff\xdb")
    data[i + 4] = (data[i + 4] & 0xF0) | 0x0D  # dest 13
    for eng in ("oracle", "native"):
        with pytest.raises(JPEGError):
            jpeg_tpu.decode_bytes(bytes(data), engine=eng)
