"""Direct unit tests for colorspace ops (parity: src/jpeg/decoder.rs:382-402)."""

import numpy as np

import jax.numpy as jnp

from jpeg_tpu.ops.color import (
    grayscale_to_rgb,
    quantize_u8,
    ycbcr_to_rgb,
    ycbcr_to_rgb_matrix,
)


def test_matrix_matches_elementwise_formula():
    """The [3,3] matrix form equals the reference-order elementwise math."""
    rng = np.random.default_rng(0)
    y = rng.uniform(-128, 127, (16, 16)).astype(np.float32)
    cb = rng.uniform(-128, 127, (16, 16)).astype(np.float32)
    cr = rng.uniform(-128, 127, (16, 16)).astype(np.float32)
    m = ycbcr_to_rgb_matrix(np.float64)
    stacked = np.stack([y, cb, cr]).reshape(3, -1).astype(np.float64)
    want = (m @ stacked + 128.0).reshape(3, 16, 16)
    got = np.asarray(ycbcr_to_rgb(jnp.asarray(y), jnp.asarray(cb),
                                  jnp.asarray(cr), rounding="round"))
    ref = np.clip(np.floor(want + 0.5), 0, 255).astype(np.uint8)
    # got is [H, W, 3] = (r, g, b); want rows are r, g, b.
    for c in range(3):
        diff = np.abs(got[..., c].astype(int) - ref[c].astype(int))
        assert diff.max() <= 1  # f32 vs f64 rounding at half-points only


def test_quantize_u8_truncate_vs_round():
    x = jnp.asarray(np.array([-5.0, -0.4, 0.0, 0.49, 0.51, 1.99, 254.6,
                              255.0, 300.0], np.float32))
    t = np.asarray(quantize_u8(x, "truncate"))
    r = np.asarray(quantize_u8(x, "round"))
    # truncate: clamp then toward-zero (Rust `as u8` semantics)
    np.testing.assert_array_equal(t, [0, 0, 0, 0, 0, 1, 254, 255, 255])
    np.testing.assert_array_equal(r, [0, 0, 0, 0, 1, 2, 255, 255, 255])


def test_grayscale_replicates():
    y = jnp.asarray(np.array([[-128.0, 0.0, 127.0]], np.float32))
    rgb = np.asarray(grayscale_to_rgb(y))
    assert rgb.shape == (1, 3, 3)
    np.testing.assert_array_equal(rgb[..., 0], rgb[..., 1])
    np.testing.assert_array_equal(rgb[..., 0], rgb[..., 2])
    np.testing.assert_array_equal(rgb[0, :, 0], [0, 128, 255])
