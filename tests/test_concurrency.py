"""Thread-safety: concurrent decodes/encodes from user threads must be
bit-identical to sequential ones. The native runtime keys its reusable
scratch buffers by thread id (jpeg_tpu/runtime/__init__.py _out_buffers), so
interleaved same-geometry decodes on different threads must never alias."""

from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jpeg_tpu
from jpeg_tpu.io.corpus import synthetic_image, synthetic_jpeg


def test_concurrent_decode_matches_sequential():
    files = [synthetic_jpeg(160, 112, seed=s) for s in range(12)]
    want = [jpeg_tpu.decode_bytes(f) for f in files]
    with ThreadPoolExecutor(max_workers=8) as ex:
        for _ in range(3):  # repeat so threads reuse warmed buffers
            got = list(ex.map(jpeg_tpu.decode_bytes, files * 2))
            for g, w in zip(got, want * 2):
                np.testing.assert_array_equal(g, w)


def test_concurrent_fast_path_matches_sequential():
    files = [synthetic_jpeg(256, 128, seed=s) for s in range(6)]
    want = [jpeg_tpu.decode_bytes(f, path="fast") for f in files]
    fn = lambda f: jpeg_tpu.decode_bytes(f, path="fast")  # noqa: E731
    with ThreadPoolExecutor(max_workers=6) as ex:
        got = list(ex.map(fn, files * 2))
    for g, w in zip(got, want * 2):
        np.testing.assert_array_equal(g, w)


def test_concurrent_encode_matches_sequential():
    imgs = [synthetic_image(120, 88, seed=s) for s in range(8)]
    want = [jpeg_tpu.encode_rgb(im, quality=83) for im in imgs]
    fn = lambda im: jpeg_tpu.encode_rgb(im, quality=83)  # noqa: E731
    with ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(fn, imgs * 2))
    assert got == want * 2
