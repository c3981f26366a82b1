"""Direct unit tests for small public helpers that the integration suite only
exercises indirectly: plane assembly/upsampling primitives, the zigzag
permutation matrix, and PPM round-trips."""

import numpy as np

from jpeg_tpu.io.ppm import read_ppm, write_ppm
from jpeg_tpu.ops.upsample import (
    assemble_plane,
    component_plane,
    upsample_fancy,
    upsample_replicate,
)
from jpeg_tpu.ops.zigzag import permutation_matrix, unzigzag, zigzag


def test_assemble_plane_stream_order():
    """MCU-interleaved stream (JPEG A.2.3: MCUs row-major, v*h blocks
    row-major within each MCU) lands each 8x8 block at its grid slot."""
    mcus_y, mcus_x, v, h = 2, 3, 2, 2
    n = mcus_y * mcus_x * v * h
    # Block k is constant-valued k, so placement is directly readable.
    blocks = np.arange(n, dtype=np.float32)[:, None, None] * np.ones((8, 8), np.float32)
    plane = np.asarray(assemble_plane(blocks, mcus_y, mcus_x, v, h))
    assert plane.shape == (mcus_y * v * 8, mcus_x * h * 8)
    k = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(v):
                for bx in range(h):
                    tile = plane[(my * v + by) * 8:(my * v + by) * 8 + 8,
                                 (mx * h + bx) * 8:(mx * h + bx) * 8 + 8]
                    assert (tile == k).all(), (my, mx, by, bx)
                    k += 1


def test_upsample_replicate_factors():
    p = np.array([[1, 2], [3, 4]], np.float32)
    up = np.asarray(upsample_replicate(p, 2, 2))
    np.testing.assert_array_equal(
        up,
        [[1, 1, 2, 2], [1, 1, 2, 2], [3, 3, 4, 4], [3, 3, 4, 4]],
    )
    # factor 1 is the identity, and axes are independent
    np.testing.assert_array_equal(np.asarray(upsample_replicate(p, 1, 1)), p)
    wide = np.asarray(upsample_replicate(p, 1, 4))
    assert wide.shape == (2, 8)
    np.testing.assert_array_equal(wide[0], [1] * 4 + [2] * 4)


def test_upsample_fancy_constant_and_gradient():
    # Constant planes are fixed points of the triangular filter.
    c = np.full((4, 4), 7.0, np.float32)
    np.testing.assert_allclose(np.asarray(upsample_fancy(c, 2, 2)), 7.0)
    # On a linear ramp, interior fancy samples interleave at 1/4 offsets:
    # out[2i]=(3c[i]+c[i-1])/4, out[2i+1]=(3c[i]+c[i+1])/4.
    r = np.arange(4, dtype=np.float32)[None, :].repeat(2, 0)
    out = np.asarray(upsample_fancy(r, 1, 2))
    np.testing.assert_allclose(out[0, 2:6], [0.75, 1.25, 1.75, 2.25])
    # Edge replication at both ends.
    assert out[0, 0] == 0.0 and out[0, -1] == 3.0


def test_component_plane_crop_and_modes():
    blocks = np.random.default_rng(3).normal(size=(4, 8, 8)).astype(np.float32)
    for mode in ("replicate", "fancy"):
        out = np.asarray(component_plane(
            blocks, 2, 2, 1, 1, 2, 2, height=25, width=29, upsample=mode))
        assert out.shape == (25, 29)


def test_permutation_matrix_is_unzigzag():
    """``zz @ P`` == natural order, and P is a true permutation matrix."""
    P = permutation_matrix()
    assert P.shape == (64, 64)
    assert ((P == 0) | (P == 1)).all()
    assert (P.sum(0) == 1).all() and (P.sum(1) == 1).all()
    rng = np.random.default_rng(7)
    zz = rng.normal(size=64)
    np.testing.assert_array_equal(zz @ P, unzigzag(zz))
    # zigzag/unzigzag are inverses
    rng = np.random.default_rng(0)
    b = rng.integers(-100, 100, 64).astype(np.int32)
    np.testing.assert_array_equal(zigzag(unzigzag(b)), b)


def test_ppm_roundtrip_p6_and_p3(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    p6, p3 = tmp_path / "a.ppm", tmp_path / "b.ppm"
    write_ppm(p6, img, binary=True)
    write_ppm(p3, img, binary=False)
    np.testing.assert_array_equal(read_ppm(p6), img)
    np.testing.assert_array_equal(read_ppm(p3), img)
    # P6 edge: pixel bytes that look like whitespace must survive.
    tricky = np.full((2, 2, 3), ord("\n"), np.uint8)
    tricky[0, 0] = [ord(" "), ord("\t"), 255]
    write_ppm(p6, tricky, binary=True)
    np.testing.assert_array_equal(read_ppm(p6), tricky)


def test_ppm_rejects_non_ppm(tmp_path):
    import pytest

    bad = tmp_path / "x.ppm"
    bad.write_bytes(b"BM not a ppm")
    with pytest.raises(ValueError):
        read_ppm(bad)
