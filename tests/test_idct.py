"""IDCT/DCT math tests: fused matrix vs naive formula vs scipy."""

import numpy as np
import scipy.fft

from jpeg_tpu.ops.idct import (
    dct_basis_1d,
    dct_block_naive,
    forward_dct_matrix,
    fused_idct_matrix,
    idct_block_naive,
)
from jpeg_tpu.ops.zigzag import ZIGZAG_INDICES, NATURAL_TO_ZIGZAG, unzigzag, zigzag


def test_zigzag_involution():
    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, (10, 64))
    np.testing.assert_array_equal(unzigzag(zigzag(x)), x)
    np.testing.assert_array_equal(zigzag(unzigzag(x)), x)
    # NATURAL_TO_ZIGZAG really is the inverse permutation.
    np.testing.assert_array_equal(ZIGZAG_INDICES[NATURAL_TO_ZIGZAG], np.arange(64))


def test_dct_basis_orthonormal():
    # A[u,x] = alpha(u)/2 * cos(...) IS the orthonormal DCT-II basis
    # (sqrt(2/8) = 1/2), so A @ A.T = I and the IDCT is just A.T on each axis.
    a = dct_basis_1d()
    np.testing.assert_allclose(a @ a.T, np.eye(8), atol=1e-12)


def test_fused_matrix_equals_naive_pipeline():
    """coeffs_zz @ fused == naive(dequant -> unzigzag -> idct) per block.

    The naive side mirrors reference decode() step 2
    (src/jpeg/decoder.rs:227-235)."""
    rng = np.random.default_rng(1)
    quant = rng.integers(1, 100, 64).astype(np.uint16)
    coeffs_zz = rng.integers(-500, 500, (16, 64)).astype(np.float32)
    m = fused_idct_matrix(quant)
    got = coeffs_zz @ m
    for i in range(16):
        dequant = coeffs_zz[i] * quant.astype(np.float32)
        natural = unzigzag(dequant)
        want = idct_block_naive(natural)
        np.testing.assert_allclose(got[i], want, atol=2e-2)


def test_idct_matches_scipy():
    rng = np.random.default_rng(2)
    block = rng.normal(0, 100, (8, 8)).astype(np.float64)
    want = scipy.fft.idctn(block, norm="ortho")
    got = idct_block_naive(block.astype(np.float32).reshape(64)).reshape(8, 8)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_forward_matches_scipy_and_roundtrips():
    rng = np.random.default_rng(3)
    pix = rng.integers(-128, 128, (8, 8)).astype(np.float64)
    want = scipy.fft.dctn(pix, norm="ortho")
    got = dct_block_naive(pix.reshape(64)).reshape(8, 8)
    np.testing.assert_allclose(got, want, atol=1e-3)
    # forward matrix -> inverse via fused matrix with unit quant table.
    fwd = pix.reshape(1, 64).astype(np.float32) @ forward_dct_matrix()
    inv = zigzag(fwd) @ fused_idct_matrix(np.ones(64))
    np.testing.assert_allclose(inv.reshape(8, 8), pix, atol=1e-2)
