"""Colorspace conversion and sample quantization, as fused elementwise ops.

Parity: reference ``y_cb_cr_to_rgb`` + ``f32_to_u8``
(``src/jpeg/decoder.rs:382-402``) and the grayscale replicate path
(``src/jpeg/decoder.rs:317-324``). The reference derives G from the already
computed R and B; algebraically that IS the standard JFIF inverse of
Y = 0.299R + 0.587G + 0.114B — so a single matrix covers both modes, and the
only behavioral difference is final rounding:

- ``rounding="truncate"``: Rust ``as u8`` truncation after clamping (bit-exact
  reference compatibility).
- ``rounding="round"``: round-half-away like libjpeg (higher PSNR vs PIL).

These run inside the jitted decode pipeline; XLA fuses them with the
surrounding reshapes so they are HBM-bandwidth-bound, not launch-bound.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

C_RED = 0.299
C_GREEN = 0.587
C_BLUE = 0.114


def ycbcr_to_rgb_matrix(dtype=np.float32) -> np.ndarray:
    """[3, 3] M with rgb = M @ (y, cb, cr) for *centered* (un-level-shifted)
    planes; add 128 afterwards. Mirrors the reference's exact algebra:
    r = (2-2*cr_w)*cr + y; b = (2-2*cb_w)*cb + y; g = (y - cb_w*b - cr_w*r)/g_w.
    """
    r_cr = 2.0 - 2.0 * C_RED
    b_cb = 2.0 - 2.0 * C_BLUE
    # g = (y - C_BLUE*b - C_RED*r)/C_GREEN with r, b substituted:
    g_y = (1.0 - C_BLUE - C_RED) / C_GREEN
    g_cb = -C_BLUE * b_cb / C_GREEN
    g_cr = -C_RED * r_cr / C_GREEN
    m = np.array(
        [
            [1.0, 0.0, r_cr],
            [g_y, g_cb, g_cr],
            [1.0, b_cb, 0.0],
        ],
        dtype=np.float64,
    )
    return m.astype(dtype)


def quantize_u8(x: jnp.ndarray, rounding: str = "truncate") -> jnp.ndarray:
    """Clamp to [0, 255] and convert to uint8.

    ``truncate`` reproduces reference ``f32_to_u8``
    (``src/jpeg/decoder.rs:382-390``): guard <0 / >255 then Rust ``as u8``
    (toward-zero truncation). ``round`` is round-half-away (libjpeg-like).
    """
    if rounding == "round":
        x = jnp.floor(x + 0.5)
    x = jnp.clip(x, 0.0, 255.0)
    return x.astype(jnp.uint8)


def quantize_samples(x: jnp.ndarray, rounding: str = "truncate",
                     maxval: int = 255) -> jnp.ndarray:
    """Clamp to [0, maxval] and narrow: u8 at 8-bit precision, u16 at
    12-bit (maxval 4095). Same truncate/round semantics as
    :func:`quantize_u8`."""
    if maxval <= 255:
        return quantize_u8(x, rounding)
    if rounding == "round":
        x = jnp.floor(x + 0.5)
    x = jnp.clip(x, 0.0, float(maxval))
    return x.astype(jnp.int32).astype(jnp.uint16)


def ycbcr_to_rgb(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                 rounding: str = "truncate",
                 maxval: int = 255) -> jnp.ndarray:
    """Centered planes [H, W] -> RGB [H, W, 3] u8.

    Follows the reference's exact operation order
    (``src/jpeg/decoder.rs:392-402``): compute r, b, derive g from them, then
    +128 level shift, then clamp/convert — so float rounding matches bit-exact
    in compat mode.
    """
    r = cr * np.float32(2.0 - 2.0 * C_RED) + y
    b = cb * np.float32(2.0 - 2.0 * C_BLUE) + y
    g = (y - np.float32(C_BLUE) * b - np.float32(C_RED) * r) / np.float32(C_GREEN)
    shift = np.float32((maxval + 1) // 2)
    rgb = jnp.stack([r + shift, g + shift, b + shift], axis=-1)
    return quantize_samples(rgb, rounding, maxval)


def grayscale_to_rgb(y: jnp.ndarray, rounding: str = "truncate",
                     maxval: int = 255) -> jnp.ndarray:
    """Centered gray plane [H, W] -> replicated RGB [H, W, 3] u8.

    Parity: reference grayscale path (``src/jpeg/decoder.rs:317-324``).
    """
    u = quantize_samples(y + np.float32((maxval + 1) // 2), rounding, maxval)
    return jnp.stack([u, u, u], axis=-1)


def cmyk_to_rgb(c: jnp.ndarray, m: jnp.ndarray, y: jnp.ndarray,
                k: jnp.ndarray, rounding: str = "truncate",
                ycck: bool = False) -> jnp.ndarray:
    """Adobe 4-component (CMYK / YCCK) centered planes -> RGB [H, W, 3] u8.

    Beyond the reference (3-component only). Adobe CMYK JPEGs store inverted
    ink values (s = 255 - ink); composing libjpeg's jdcolor output with
    Pillow's ``CMYK;I`` read + ``cmyk2rgb`` (libImaging/Convert.c) reduces to
    ``R = s_C * s_K / 255`` on the stored bytes. For YCCK (APP14 transform 2)
    the first three planes hold YCbCr of the *non-inverted* CMY (libjpeg
    ycck_cmyk_convert: C = 255 - R(ycc)), so convert, un-invert, then apply K.
    """
    s_k = jnp.clip(k + 128.0, 0.0, 255.0)
    if ycck:
        r = c + np.float32(2.0 - 2.0 * C_RED) * y  # here (c, m, y) = (Y, Cb, Cr)
        b = c + np.float32(2.0 - 2.0 * C_BLUE) * m
        g = (c - np.float32(C_BLUE) * b - np.float32(C_RED) * r) / np.float32(C_GREEN)
        stored = [255.0 - jnp.clip(p + 128.0, 0.0, 255.0) for p in (r, g, b)]
    else:
        stored = [jnp.clip(p + 128.0, 0.0, 255.0) for p in (c, m, y)]
    rgb = jnp.stack(stored, axis=-1) * (s_k * np.float32(1.0 / 255.0))[..., None]
    return quantize_u8(rgb, rounding)


def rgb_direct(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
               rounding: str = "truncate",
               maxval: int = 255) -> jnp.ndarray:
    """3-component stream already in RGB (Adobe transform 0 or R/G/B
    component ids): level shift only, no YCbCr matrix."""
    shift = np.float32((maxval + 1) // 2)
    rgb = jnp.stack([r + shift, g + shift, b + shift], axis=-1)
    return quantize_samples(rgb, rounding, maxval)
