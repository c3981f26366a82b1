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


def test_concurrent_multithreaded_native_calls_share_worker_pool():
    """Several Python threads each requesting MULTI-threaded native
    decodes (restart-parallel and speculative no-restart mixed) must
    stay bit-identical: the C++ WorkerPool serves one dispatch and the
    contended callers fall back to ad-hoc threads (r4 pool design)."""
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.runtime import native_decode_planes

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (192, 224, 3), dtype=np.uint8)
    d_restart = jpeg_tpu.encode_rgb(img, quality=88, subsampling=(2, 2),
                                    restart_interval_mcus=4)
    d_plain = jpeg_tpu.encode_rgb(img, quality=88, subsampling=(2, 2))
    plans = [parse_jpeg(d_restart), parse_jpeg(d_plain)]
    want = [[p.copy() for p in native_decode_planes(
        pl, reuse_buffer=False, n_threads=4)] for pl in plans]

    def one(i):
        pl = plans[i % 2]
        return [p.copy() for p in native_decode_planes(
            pl, reuse_buffer=False, n_threads=4)]

    with ThreadPoolExecutor(max_workers=6) as ex:
        for _ in range(2):
            got = list(ex.map(one, range(12)))
    for i, g in enumerate(got):
        for a, b in zip(g, want[i % 2]):
            np.testing.assert_array_equal(a, b)
