"""Unit tests for canonical Huffman table construction (JPEG Annex C)."""

import numpy as np
import pytest

from jpeg_tpu.entropy.tables import (
    HuffmanTable,
    make_code_table,
    value_correction,
    value_correction_np,
)

# JPEG spec Table K.3: typical luminance DC table (BITS, HUFFVAL).
K3_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K3_VALS = list(range(12))


def test_make_code_table_spec_example():
    # Annex C Fig C.2 example: lengths 2,3,3,3,3,3,4,5,... produce canonical
    # codes 00, 010, 011, 100, 101, 110, 1110, 11110, ...
    lengths = np.repeat(np.arange(1, 17, dtype=np.uint8), K3_BITS)
    codes = make_code_table(lengths)
    expected = [0b00, 0b010, 0b011, 0b100, 0b101, 0b110,
                0b1110, 0b11110, 0b111110, 0b1111110, 0b11111110, 0b111111110]
    assert codes.tolist() == expected


def test_lut_roundtrip_spec_table():
    t = HuffmanTable.from_bits_values(K3_BITS, K3_VALS)
    for code, length, value in zip(t.codes, t.lengths, t.values):
        peek = int(code) << (16 - int(length))
        v, l = t.decode16(peek)
        assert (v, l) == (int(value), int(length))
        # Any trailing garbage bits must not change the decode.
        v2, l2 = t.decode16(peek | ((1 << (16 - int(length))) - 1))
        assert (v2, l2) == (int(value), int(length))


def test_lut_invalid_prefix():
    t = HuffmanTable.from_bits_values(K3_BITS, K3_VALS)
    # 0xFFFF... all-ones of max length+1 is not a valid code in this table.
    v, l = t.decode16(0xFFFF)
    assert l == 0


def test_random_tables_prefix_free():
    rng = np.random.default_rng(0)
    for _ in range(20):
        # Generate a valid BITS list (Kraft inequality satisfied greedily).
        bits = np.zeros(16, dtype=np.int64)
        budget = 1.0
        total = 0
        for l in range(1, 17):
            max_here = int(budget * (1 << l)) - (1 if l < 16 else 0)
            n = int(rng.integers(0, min(max_here, 20) + 1))
            bits[l - 1] = n
            budget -= n / (1 << l)
            total += n
        if total == 0:
            continue
        vals = rng.integers(0, 256, total, dtype=np.uint8)
        t = HuffmanTable.from_bits_values(bits, vals)
        # LUT covers exactly sum(2^(16-l)) entries.
        covered = int((t.lut_length > 0).sum())
        expected = sum(int(2 ** (16 - l)) for l in t.lengths.tolist())
        assert covered == expected


@pytest.mark.parametrize(
    "val,nbits,expected",
    [
        (0, 0, 0),
        # Table F.2: nbits=1 -> {-1, 1}
        (0, 1, -1), (1, 1, 1),
        # nbits=2 -> {-3,-2,2,3}
        (0, 2, -3), (1, 2, -2), (2, 2, 2), (3, 2, 3),
        # nbits=3 -> {-7..-4, 4..7}
        (0, 3, -7), (3, 3, -4), (4, 3, 4), (7, 3, 7),
        (0, 10, -1023), (1023, 10, 1023),
    ],
)
def test_value_correction_table_f2(val, nbits, expected):
    assert value_correction(val, nbits) == expected


def test_value_correction_np_matches_scalar():
    rng = np.random.default_rng(1)
    nbits = rng.integers(0, 16, 1000)
    vals = np.array([rng.integers(0, 1 << max(n, 1)) for n in nbits])
    got = value_correction_np(vals, nbits)
    want = np.array([value_correction(int(v), int(n)) for v, n in zip(vals, nbits)])
    np.testing.assert_array_equal(got, want)
