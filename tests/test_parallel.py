"""Sharded batch decode tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.models.decoder import (
    PipelineGeometry,
    decode_bytes,
    decode_coefficients_host,
    plan_matrices,
)
from jpeg_tpu.parallel.batch import (
    decode_batch,
    decode_batch_rows_sp,
    decode_batch_with_metrics,
)
from jpeg_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def lena_batch(corpus=None):
    data = open("/root/reference/lena.jpeg", "rb").read()
    plan = parse_jpeg(data)
    coeffs = decode_coefficients_host(plan)
    geom = PipelineGeometry.of(plan)
    B = 8
    cb = np.broadcast_to(coeffs, (B,) + coeffs.shape).copy()
    mb = np.broadcast_to(plan_matrices(plan), (B, 3, 64, 64)).copy()
    single = decode_bytes(data)
    return geom, cb, mb, np.asarray(single)


def test_mesh_shape():
    mesh = make_mesh(n_data=4, n_seg=2)
    assert mesh.shape == {"data": 4, "seg": 2}


def test_batch_matches_single(lena_batch):
    geom, cb, mb, single = lena_batch
    out = np.asarray(decode_batch(cb, mb, geom))
    assert out.shape[0] == 8
    for i in range(8):
        np.testing.assert_array_equal(out[i], single)


def test_batch_sharded_matches_single(lena_batch):
    geom, cb, mb, single = lena_batch
    mesh = make_mesh(n_data=8, n_seg=1)
    out = np.asarray(decode_batch(cb, mb, geom, mesh=mesh))
    for i in range(8):
        np.testing.assert_array_equal(out[i], single)


def test_batch_metrics_psum(lena_batch):
    geom, cb, mb, single = lena_batch
    mesh = make_mesh(n_data=8, n_seg=1)
    out, frames, blocks = decode_batch_with_metrics(cb, mb, geom, mesh)
    assert int(frames) == 8
    assert int(blocks) == 8 * geom.total_blocks
    np.testing.assert_array_equal(np.asarray(out)[3], single)


def test_rows_sp_matches_single(lena_batch):
    """Images over data axis AND MCU rows over seg axis."""
    geom, cb, mb, single = lena_batch
    mesh = make_mesh(n_data=4, n_seg=2)
    out, frames = decode_batch_rows_sp(cb[:4], mb[:4], geom, mesh)
    assert int(frames) == 4
    out = np.asarray(out)
    for i in range(4):
        np.testing.assert_array_equal(out[i], single)


def test_rows_sp_rejects_bad_geometry(lena_batch):
    geom, cb, mb, _ = lena_batch
    mesh = make_mesh(n_data=2, n_seg=4)
    import dataclasses

    bad = dataclasses.replace(geom, mcus_y=geom.mcus_y - 1)
    with pytest.raises(ValueError, match="row sharding"):
        decode_batch_rows_sp(cb[:2], mb[:2], bad, mesh)


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128, 128, 3)
    ge.dryrun_multichip(8)


def test_batch_fast_path_sharded():
    """vmap'd Pallas fast path sharded over the data axis (interpret mode)."""
    import jax.numpy as jnp

    from jpeg_tpu.io.corpus import synthetic_jpeg
    from jpeg_tpu.ops.pallas_kernels import plan_quant_patterns
    from jpeg_tpu.parallel.batch import decode_batch_fast
    from jpeg_tpu.runtime import native_decode_planes

    data = synthetic_jpeg(128, 96, seed=0)
    plan = parse_jpeg(data)
    geom = PipelineGeometry.of(plan)
    planes = [np.asarray(p) for p in native_decode_planes(plan)]
    qpats = plan_quant_patterns(plan, geom)
    B = 8
    bp = [np.broadcast_to(p, (B,) + p.shape).copy() for p in planes]
    bq = [np.broadcast_to(q, (B,) + q.shape).copy() for q in qpats]
    mesh = make_mesh(n_data=8, n_seg=1)
    out = np.asarray(decode_batch_fast(bp, bq, geom, mesh=mesh))
    single = np.asarray(decode_batch_fast([p[None] for p in planes],
                                          [q[None] for q in qpats], geom))[0]
    assert out.shape[0] == B
    for i in range(B):
        np.testing.assert_array_equal(out[i], single)


def test_data_sharding_helper():
    from jpeg_tpu.parallel.mesh import data_sharding

    mesh = make_mesh(n_data=4, n_seg=2)
    sh = data_sharding(mesh, rank=3, axis=0)
    assert sh.spec == jax.sharding.PartitionSpec("data", None, None)


def test_rows_sp_fast_matches_single():
    """Pallas fast path sharded over (data, seg): bands of the coefficient
    planes decode independently per device."""
    from jpeg_tpu.io.corpus import synthetic_jpeg
    from jpeg_tpu.ops.pallas_kernels import plan_quant_patterns
    from jpeg_tpu.parallel.batch import decode_batch_fast, decode_batch_rows_sp_fast
    from jpeg_tpu.runtime import native_decode_planes

    # mcus_y must be divisible by band_mcus * n_seg = 8 * 2 = 16 (4:2:0).
    data = synthetic_jpeg(256, 16 * 16 * 2, seed=5)  # H = 512 -> mcus_y = 32
    plan = parse_jpeg(data)
    geom = PipelineGeometry.of(plan)
    planes = [np.asarray(p) for p in native_decode_planes(plan)]
    qpats = plan_quant_patterns(plan, geom)
    B = 4
    bp = [np.broadcast_to(p, (B,) + p.shape).copy() for p in planes]
    bq = [np.broadcast_to(q, (B,) + q.shape).copy() for q in qpats]
    mesh = make_mesh(n_data=4, n_seg=2)
    out = np.asarray(decode_batch_rows_sp_fast(bp, bq, geom, mesh))
    single = np.asarray(decode_batch_fast(
        [p[None] for p in planes], [q[None] for q in qpats], geom))[0]
    assert out.shape[0] == B
    for i in range(B):
        np.testing.assert_array_equal(out[i], single)


def test_encode_batch_device_sharded():
    """Batched device forward transform matches the single-image encoder."""
    from jpeg_tpu.io.corpus import synthetic_image
    from jpeg_tpu.models.decoder import PipelineGeometry
    from jpeg_tpu.ops.pallas_kernels import (
        fused_plane_encoder,
        padded_plane_shapes,
        plan_inv_quant_patterns,
    )
    from jpeg_tpu.entropy.annex_k import scaled_quant_table, QUANT_CHROMA, QUANT_LUMA
    from jpeg_tpu.parallel.batch import encode_batch_device

    img = synthetic_image(128, 96, seed=91)
    geom = PipelineGeometry(
        width=128, height=96, mcus_x=8, mcus_y=6, h_max=2, v_max=2,
        sampling=((2, 2), (1, 1), (1, 1)),
    )
    shapes = padded_plane_shapes(geom)
    rows_pad, w_pad = shapes[0]
    planar = np.pad(img.transpose(2, 0, 1),
                    ((0, 0), (0, rows_pad - 96), (0, w_pad - 128)),
                    mode="edge")
    q = [scaled_quant_table(QUANT_LUMA, 85),
         scaled_quant_table(QUANT_CHROMA, 85),
         scaled_quant_table(QUANT_CHROMA, 85)]
    iqp = plan_inv_quant_patterns(q, geom)
    single = fused_plane_encoder(geom, interpret=True)(
        *( [np.asarray(planar)] + [np.asarray(x) for x in iqp] ))
    B = 4
    bp = np.broadcast_to(planar, (B,) + planar.shape).copy()
    bq = [np.broadcast_to(x, (B,) + x.shape).copy() for x in iqp]
    mesh = make_mesh(n_data=4, n_seg=1)
    out = encode_batch_device(bp, bq, geom, mesh=mesh)
    for c in range(3):
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(out[c][b]), np.asarray(single[c]))
