"""Fuzz/robustness: malformed streams must fail cleanly, never hang/crash.

SURVEY.md §5 fault injection: truncated-bitstream fuzzing. The reference
panics on anything unexpected (17 panic sites); this engine's contract is:
raise ValueError (JPEGError and NativeDecodeError are subclasses), or decode
to *some* image (reference-parity 0xAA tail fill for truncation inside
entropy data). No other exception type may escape.
"""

import numpy as np
import pytest

from jpeg_tpu.io.container import JPEGError, parse_jpeg
from jpeg_tpu.models.decoder import decode_bytes
from jpeg_tpu.models.encoder import encode_rgb

ACCEPTABLE = (ValueError,)


def _base_jpeg():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    return encode_rgb(img, quality=85, subsampling=(2, 1), restart_interval_mcus=2)


@pytest.mark.parametrize("frac", [0.1, 0.3, 0.5, 0.7, 0.9, 0.99])
def test_truncation(frac):
    data = _base_jpeg()
    cut = data[: int(len(data) * frac)]
    try:
        rgb = decode_bytes(cut)
        assert rgb.dtype == np.uint8  # decoded with tail fill: acceptable
    except ACCEPTABLE:
        pass


def test_bit_flips():
    data = bytearray(_base_jpeg())
    rng = np.random.default_rng(0)
    for trial in range(30):
        mutated = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(2, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            rgb = decode_bytes(bytes(mutated))
            assert rgb.dtype == np.uint8
        except ACCEPTABLE:
            pass


def test_random_garbage():
    rng = np.random.default_rng(1)
    for trial in range(20):
        blob = b"\xff\xd8" + bytes(rng.integers(0, 256, 200, dtype=np.uint8))
        with pytest.raises(ACCEPTABLE):
            decode_bytes(blob)


def test_empty_and_tiny():
    for blob in [b"", b"\xff", b"\xff\xd8", b"\xff\xd8\xff\xd9"]:
        with pytest.raises(ACCEPTABLE):
            decode_bytes(blob)


def test_zero_dimensions_rejected():
    # SOF with 0 width: patch our encoder output.
    data = bytearray(_base_jpeg())
    idx = bytes(data).find(b"\xff\xc0")
    # samples_per_line at offset idx+7..9
    data[idx + 7 : idx + 9] = (0).to_bytes(2, "big")
    with pytest.raises(ACCEPTABLE):
        decode_bytes(bytes(data))


def test_sixteen_bit_quant_tables():
    """Rewrite the 8-bit DQT segments as 16-bit precision; decode must be
    identical (parity: reference src/jpeg/mod.rs:245-255)."""
    data = _base_jpeg()
    want = decode_bytes(data)
    out = bytearray()
    i = 0
    data_b = bytes(data)
    while i < len(data_b):
        if data_b[i] == 0xFF and data_b[i + 1] == 0xDB:
            seg_len = int.from_bytes(data_b[i + 2 : i + 4], "big")
            body = data_b[i + 4 : i + 2 + seg_len]
            # body = [pq<<4|tq][64 bytes] (our encoder emits one table/segment)
            assert body[0] & 0xF0 == 0
            entries = b"".join(v.to_bytes(2, "big") for v in body[1:65])
            new_body = bytes([0x10 | (body[0] & 0x0F)]) + entries
            out += b"\xff\xdb" + (len(new_body) + 2).to_bytes(2, "big") + new_body
            i += 2 + seg_len
        else:
            out.append(data_b[i])
            i += 1
    got = decode_bytes(bytes(out))
    np.testing.assert_array_equal(got, want)


def _progressive_jpeg():
    import io

    from PIL import Image

    from jpeg_tpu.io.corpus import synthetic_image

    buf = io.BytesIO()
    Image.fromarray(synthetic_image(80, 64, seed=60)).save(
        buf, "JPEG", quality=85, progressive=True)
    return buf.getvalue()


@pytest.mark.parametrize("frac", [0.2, 0.5, 0.8, 0.95])
def test_progressive_truncation(frac):
    data = _progressive_jpeg()
    cut = data[: int(len(data) * frac)]
    try:
        rgb = decode_bytes(cut)
        assert rgb.dtype == np.uint8
    except ACCEPTABLE:
        pass


def test_progressive_bit_flips():
    data = bytearray(_progressive_jpeg())
    rng = np.random.default_rng(7)
    for trial in range(25):
        mutated = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(2, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            rgb = decode_bytes(bytes(mutated))
            assert rgb.dtype == np.uint8
        except ACCEPTABLE:
            pass
