"""Property tests against libjpeg: random images, full feature matrix.

For any baseline JPEG libjpeg produces, our decode must agree with libjpeg's
own decode to within the known deviations (truncate-vs-round, replicated
vs fancy upsampling): high PSNR, identical shapes. This is the SURVEY.md §4
"encode-with-libjpeg / decode-with-ours round trip" property test.
"""

import io

import numpy as np
import pytest
from PIL import Image

from conftest import psnr
from jpeg_tpu.models.decoder import decode_bytes


def _photo(rng, h, w):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    f1, f2 = rng.uniform(5, 60, 2)
    img = np.stack(
        [
            128 + 70 * np.sin(xx / f1) * np.cos(yy / f2),
            128 + 70 * np.cos(xx / f2 + 1),
            128 + 70 * np.sin(yy / f1 + 2),
        ],
        axis=-1,
    )
    img += rng.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsampling", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
@pytest.mark.parametrize("quality", [50, 85, 95])
def test_random_images_match_libjpeg(subsampling, quality):
    rng = np.random.default_rng(subsampling * 100 + quality)
    for _ in range(3):
        h = int(rng.integers(17, 120))
        w = int(rng.integers(17, 120))
        img = _photo(rng, h, w)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=quality,
                                  subsampling=subsampling)
        data = buf.getvalue()
        ours = decode_bytes(data, rounding="round")
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert ours.shape == pil.shape
        floor = 38.0 if subsampling == 0 else 28.0
        p = psnr(ours, pil)
        assert p > floor, (h, w, p)


@pytest.mark.parametrize("rmb", [1, 3, 64])
def test_restart_streams_match_libjpeg(rmb):
    rng = np.random.default_rng(rmb)
    img = _photo(rng, 96, 144)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90, restart_marker_blocks=rmb)
    data = buf.getvalue()
    ours = decode_bytes(data, rounding="round")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(ours, pil) > 30.0


def test_grayscale_random_matches_libjpeg():
    rng = np.random.default_rng(5)
    img = _photo(rng, 77, 91)[..., 0]
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, "JPEG", quality=92)
    data = buf.getvalue()
    ours = decode_bytes(data, rounding="round")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert psnr(ours, pil) > 45.0


def test_pil_high_quality_444_near_exact():
    """At 4:4:4 there is no upsampling; only rounding differs -> max +-1."""
    rng = np.random.default_rng(9)
    img = _photo(rng, 64, 64)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=97, subsampling=0)
    data = buf.getvalue()
    ours = decode_bytes(data, rounding="round")
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 2