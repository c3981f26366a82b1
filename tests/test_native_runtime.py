"""C++ runtime equivalence tests vs the NumPy oracle."""

import numpy as np
import pytest

from jpeg_tpu.entropy.oracle import decode_coefficients
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.runtime import (
    NativeDecodeError,
    native_available,
    native_decode_coefficients,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built"
)


@pytest.mark.parametrize(
    "name", ["huff_simple0", "lena-bw", "lena", "2x2-chroma"]
)
def test_native_matches_oracle_corpus(name, corpus):
    plan = parse_jpeg(corpus[name])
    np.testing.assert_array_equal(
        native_decode_coefficients(plan), decode_coefficients(plan)
    )


def test_native_matches_oracle_restart_streams():
    """Random restart-interval streams from our encoder."""
    from jpeg_tpu.models.encoder import encode_rgb

    rng = np.random.default_rng(0)
    for trial, (size, ri) in enumerate([((48, 80), 1), ((64, 64), 3), ((40, 56), 7)]):
        img = rng.integers(0, 256, size + (3,), dtype=np.uint8)
        data = encode_rgb(img, quality=75, subsampling=(2, 1),
                          restart_interval_mcus=ri)
        plan = parse_jpeg(data)
        assert len(plan.segments) > 1
        np.testing.assert_array_equal(
            native_decode_coefficients(plan), decode_coefficients(plan)
        )


def test_native_single_thread_matches_multi(corpus):
    plan = parse_jpeg(corpus["2x2-chroma"])
    np.testing.assert_array_equal(
        native_decode_coefficients(plan, n_threads=1),
        native_decode_coefficients(plan, n_threads=4),
    )


def test_native_error_isolation(corpus):
    """Corrupt entropy data raises NativeDecodeError with segment index."""
    plan = parse_jpeg(corpus["lena-bw"])
    # Build a table set where every prefix is invalid by zeroing the LUTs.
    bad = parse_jpeg(corpus["lena-bw"])
    for t in bad.dc_tables:
        t.lut_length = np.zeros_like(t.lut_length)
    with pytest.raises(NativeDecodeError) as ei:
        native_decode_coefficients(bad)
    assert ei.value.segment == 0
    # Original plan still decodes fine (no shared state).
    native_decode_coefficients(plan)
