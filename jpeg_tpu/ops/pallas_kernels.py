"""Pallas TPU kernels: the fused plane-decode kernel (SURVEY.md §7 layer 5).

The XLA pipeline (models/decoder._pipeline) works on stream-ordered
``[N, 64]`` blocks and pays ~60%% of its time in block->plane relayouts whose
minor dimension is 8 (6.25%% lane efficiency). This module takes a different
route made possible by the C++ runtime's *plane layout* output
(``jpeg_tpu.runtime.native_decode_planes``): coefficients arrive already
de-zigzagged into per-component natural-order planes, so the only remaining
work is dense linear algebra — and this Mosaic version supports no vector
reshapes at all, so the kernel is built purely from matmuls + elementwise:

- dequant: elementwise multiply with a tiled quant pattern (runtime arg, so
  one compiled kernel serves all images of a geometry);
- 8x8 IDCT on a [rows, cols] tile: sandwich product
  ``kron(I, A^T) @ F @ kron(I, A)`` with the column side split into
  [128, 128] lane chunks (sandwich_idct_split) — block-diagonal constants
  make the per-block transform plain MXU matmuls at the 16x-waste floor;
- chroma upsample: replication matrices ``kron(I, [1,1]^T)`` (rows) and
  ``kron(I, [1,1])`` (cols) — the MXU does pixel replication;
- YCbCr->RGB + level shift + clamp + u8 narrowing (VPU).

Grid = (MCU row bands, 256-column tiles). One HBM read of the int16
coefficient planes and one HBM write of the planar u8 band per cell — the
minimum possible traffic for this stage.

Round-3 tuning bounds (measured on the real chip, 4K):

* Tile-size sweep (tools/sweep_tiles.py): (BAND_ROWS, TILE_W) =
  (128, 256) -> 2224 fps / 13.6%% HBM SOL; (256, 256) -> 1990 fps.
  The default IS the optimum — taller bands do not raise MXU
  efficiency (the chroma LHS at 64 rows is not the limiter).
* Fusing the chroma replication into the sandwich matmuls (the r2
  ROADMAP item) is anti-productive by direct FLOP accounting: the
  IDCT runs at HIGHEST (6-pass bf16 — required for bit-exact u8), so
  widening its output to the upsampled resolution costs 6 passes on
  2x the MACs, while the separate replication matmul pays 1 DEFAULT
  pass: per 2x2-chroma cell, fused = +6.3M pass-MACs vs separate
  4.2M. The pipeline sits at ~46%% MXU efficiency on the 6-pass
  matmuls plus the VPU color/clamp chain; exact-mode ~2200 fps is the
  practical ceiling of this formulation (the approx tier at DEFAULT
  reaches ~4300 fps for tolerant pipelines).

Round-4 A/B of the alternative exact formulation (VERDICT r3 weak #6
asked for a second data point beside the fusion pass-accounting):

* int16 islow-style fixed-point IDCT — measured primitive costs on the
  real chip (tools/probe_int_mxu.py, differential-chained dots at
  pipeline shapes): int16 x int16 -> i32 dot = 1.569 us = 0.64x of the
  f32 HIGHEST dot (2.450 us); islow needs TWO 1-D passes with a
  rounding shift between vs ONE fused HIGHEST sandwich -> ~1.28x the
  MXU time before the extra VPU shift/clamp. REJECTED on measurement,
  not accounting. int8 -> i32 is the only faster primitive (0.275 us,
  0.11x) and cannot carry dequantized coefficients or 13-bit basis
  constants without a hi/lo split (4 dots, 1.1 us) that still loses to
  DEFAULT and is not bit-exact vs the f32 compat spec.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_tpu.ops.color import C_BLUE, C_GREEN, C_RED
from jpeg_tpu.ops.idct import dct_basis_1d
from jpeg_tpu.ops.zigzag import unzigzag

import os as _os

# Y-resolution column-tile width / rows per grid cell. Env-overridable
# for tile-size A/B sweeps (tools/sweep_tiles.py); production defaults
# from the measured sweep. Chroma matmuls run at half these dims under
# 2x2 sampling, so BAND_ROWS=256 keeps even the chroma LHS at the MXU's
# full 128-row height. Must match jpeg_tpu.runtime plane layout.
TILE_W = int(_os.environ.get("JT_TILE_W", "256"))
BAND_ROWS = int(_os.environ.get("JT_BAND_ROWS", "128"))


def _kron_eye(m: np.ndarray, n: int) -> np.ndarray:
    return np.kron(np.eye(n, dtype=np.float64), m.astype(np.float64)).astype(
        np.float32
    )


def _row_repeat_matrix(rows: int, f: int) -> np.ndarray:
    """R [rows*f, rows] with R @ x repeating each row f times."""
    return np.kron(np.eye(rows), np.ones((f, 1))).astype(np.float32)


def _col_repeat_matrix(cols: int, f: int) -> np.ndarray:
    """R [cols, cols*f] with x @ R repeating each column f times."""
    return np.kron(np.eye(cols), np.ones((1, f))).astype(np.float32)


def _shift(x, d: int, axis: int):
    """x shifted so result[i] = x[i + d] along ``axis`` (wrapping — wrapped
    entries are masked to zero by the caller). Expressed as two static
    slices + concat, the only vector-layout ops this Mosaic build supports
    (no reshapes, no gathers)."""
    if d == 0:
        return x
    if axis == 0:
        return jnp.concatenate([x[d:, :], x[:d, :]], axis=0)
    return jnp.concatenate([x[:, d:], x[:, :d]], axis=1)


def roll_mask_vector(n: int, d: int, transpose_a: bool = False) -> np.ndarray:
    """[n] f32 with entry i = A[i%8 + d, i%8] (or A[i%8, i%8 + d] for the
    forward DCT) when 0 <= i%8 + d < 8, else 0 — the shift-d diagonal of the
    per-8-block 1-D DCT basis."""
    a = dct_basis_1d()
    out = np.zeros(n, np.float32)
    for i in range(n):
        x = i % 8
        u = x + d
        if 0 <= u < 8:
            out[i] = a[x, u] if transpose_a else a[u, x]
    return out


def roll_masks(rows: int, cols: int, forward: bool = False):
    """(mrow [rows, 128], mcol [16, cols]) constants for
    :func:`idct_roll_tile` — column/row ``d + 7`` holds the shift-d mask.
    (128-wide / 16-tall padding keeps the minor dims tileable.)"""
    mrow = np.zeros((rows, 128), np.float32)
    mcol = np.zeros((16, cols), np.float32)
    for d in range(-7, 8):
        mrow[:, d + 7] = roll_mask_vector(rows, d, transpose_a=forward)
        mcol[d + 7, :] = roll_mask_vector(cols, d, transpose_a=forward)
    return mrow, mcol


def idct_roll_tile(f, mrow_ref, mcol_ref):
    """Separable per-8-block 2-D IDCT over a [rows, cols] tile on the VPU.

    The sandwich formulation multiplies by block-diagonal kron constants
    that are 15/16 (rows) and 31/32 (cols) zeros — the MXU burns 16-32x
    wasted FLOPs per side, 6x more at f32 HIGHEST (VERDICT r1 weak #2).
    This version never touches the MXU: for each shift d in [-7, 7], the
    term A[x+d, x] * f[8b + x + d] is a *constant-shift* of the whole tile
    times a period-8 mask — 15 shift+FMA passes per axis, all elementwise.
    Exact f32 (masked terms contribute exact zeros; live terms accumulate
    in ascending-u order), ~30 MACs/pixel on the VPU vs 384 dense-equiv
    MACs/pixel x 6 passes on the MXU.
    """
    acc = jnp.zeros_like(f)
    for d in range(-7, 8):
        acc = acc + mrow_ref[:, d + 7 : d + 8] * _shift(f, d, axis=0)
    out = jnp.zeros_like(f)
    for d in range(-7, 8):
        out = out + mcol_ref[d + 7 : d + 8, :] * _shift(acc, d, axis=1)
    return out



def sandwich_idct_split(f, bd_at_ref, bd_a128_ref,
                        precision=jax.lax.Precision.HIGHEST):
    """Per-8-block 2-D transform via MXU matmuls with the column side split
    into [128, 128] block-diagonal products.

    Measured on TPU v5e (BENCH r2 A/B): the single [C, C] right-multiply at
    C=256 wastes 32x FLOPs (31/32 zeros); splitting the lanes into 128-wide
    chunks against one kron(I_16, A) [128, 128] halves that to the 16x MXU
    floor — 0.499 -> 0.674 Gblocks/s bare IDCT, bit-identical. The VPU
    shift+mask formulation (:func:`idct_roll_tile`) and an int8 MXU path
    were both benchmarked and rejected: rolls hit 0.323 Gblocks/s (concat
    shifts cost more than the MXU waste on v5e), and exact int8 needs >=12
    digit passes, landing below the f32 sandwich.
    """
    t = jnp.dot(bd_at_ref[:], f, preferred_element_type=jnp.float32,
                precision=precision)
    cols = t.shape[1]
    chunk = bd_a128_ref.shape[0]
    parts = [
        jnp.dot(t[:, i : i + chunk], bd_a128_ref[:],
                preferred_element_type=jnp.float32, precision=precision)
        for i in range(0, cols, chunk)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)


def quant_pattern(quant_zz: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """Tile the natural-order 8x8 quant table over a [rows, cols] tile."""
    qnat = unzigzag(np.asarray(quant_zz, dtype=np.float32).reshape(64)).reshape(8, 8)
    return np.tile(qnat, (rows // 8, cols // 8))


def band_mcus(geom) -> int:
    """MCU rows per grid band (BAND_ROWS of Y resolution)."""
    return BAND_ROWS // (8 * geom.v_max)


def n_bands(geom) -> int:
    return -(-geom.mcus_y // band_mcus(geom))


def padded_plane_shapes(geom) -> list[tuple[int, int]]:
    """[rows, stride] per component: strides aligned so a TILE_W Y-tile maps
    to whole chroma tiles (Y stride multiple of TILE_W); rows padded to whole
    BAND_ROWS bands (pad region zero -> decodes to gray, cropped off). Must
    match ``jpeg_tpu.runtime.plane_shapes``."""
    base = -(-geom.mcus_x * geom.h_max * 8 // TILE_W) * TILE_W
    bm = band_mcus(geom)
    nb = n_bands(geom)
    return [
        (nb * bm * v * 8, base * h // geom.h_max)
        for (h, v) in geom.sampling
    ]


def _plane_kernel(*refs, geom, rounding: str,
                  idct_precision=jax.lax.Precision.HIGHEST):
    """One (band, col-tile) cell. refs order: [comp planes i16 x n] [qpat x n]
    [per-comp static aux: bd_at, bd_a (+ rrep? + crep?)] [out u8]."""
    n_comp = len(geom.sampling)
    out_ref = refs[-1]
    comp_refs = refs[:n_comp]
    qpat_refs = refs[n_comp : 2 * n_comp]
    aux = list(refs[2 * n_comp : -1])

    planes = []
    for ci, (h, v) in enumerate(geom.sampling):
        fy, fx = geom.v_max // v, geom.h_max // h
        f = comp_refs[ci][:].astype(jnp.float32) * qpat_refs[ci][:]
        bd_at = aux.pop(0)
        bd_a128 = aux.pop(0)
        spatial = sandwich_idct_split(f, bd_at, bd_a128, idct_precision)
        if fy > 1:
            spatial = jnp.dot(aux.pop(0)[:], spatial,
                              preferred_element_type=jnp.float32)
        if fx > 1:
            spatial = jnp.dot(spatial, aux.pop(0)[:],
                              preferred_element_type=jnp.float32)
        planes.append(spatial)

    if n_comp == 1:
        rgb = [planes[0] + 128.0] * 3
    else:
        y, cb, cr = planes
        # Reference operation order (src/jpeg/decoder.rs:392-402) for
        # bit-exact truncate-mode parity.
        r = cr * np.float32(2.0 - 2.0 * C_RED) + y
        b = cb * np.float32(2.0 - 2.0 * C_BLUE) + y
        g = (y - np.float32(C_BLUE) * b - np.float32(C_RED) * r) / np.float32(
            C_GREEN
        )
        rgb = [r + 128.0, g + 128.0, b + 128.0]

    for c, chan in enumerate(rgb):
        if rounding == "round":
            chan = jnp.floor(chan + 0.5)
        # Mosaic has no f32->u8 cast; clamp, truncate to i32, then narrow.
        out_ref[c, :, :] = jnp.clip(chan, 0.0, 255.0).astype(jnp.int32).astype(
            jnp.uint8
        )


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@lru_cache(maxsize=256)
def fused_plane_decoder(geom, rounding: str = "truncate",
                        interpret: bool = False,
                        idct_mode: str = "exact"):
    """Build jitted fn: (*comp_planes int16, *qpat f32) -> planar u8
    [3, H_pad, W_pad]. Plane shapes per :func:`padded_plane_shapes`; qpat
    tiles per :func:`quant_pattern` with that component's (rows, cols)."""
    n_comp = len(geom.sampling)
    shapes = padded_plane_shapes(geom)
    w_pad = shapes[0][1]
    bm = band_mcus(geom)
    nb = n_bands(geom)
    grid = (nb, w_pad // TILE_W)

    plane_specs = []
    qpat_specs = []
    static_aux = []
    for (h, v) in geom.sampling:
        fy, fx = geom.v_max // v, geom.h_max // h
        rows, cols = bm * v * 8, TILE_W // fx
        plane_specs.append(
            pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        )
        qpat_specs.append(_const_spec((rows, cols)))
        a = dct_basis_1d()
        static_aux.append(_kron_eye(a.T, rows // 8))
        static_aux.append(_kron_eye(a, min(cols, 128) // 8))  # column chunks
        if fy > 1:
            static_aux.append(_row_repeat_matrix(rows, fy))
        if fx > 1:
            static_aux.append(_col_repeat_matrix(cols, fx))
    aux_specs = [_const_spec(arr.shape) for arr in static_aux]

    idct_precision = (jax.lax.Precision.HIGHEST if idct_mode == "exact"
                      else jax.lax.Precision.DEFAULT)
    call = pl.pallas_call(
        partial(_plane_kernel, geom=geom, rounding=rounding,
                idct_precision=idct_precision),
        grid=grid,
        in_specs=plane_specs + qpat_specs + aux_specs,
        out_specs=pl.BlockSpec(
            (3, BAND_ROWS, TILE_W), lambda i, j: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, nb * BAND_ROWS, w_pad), jnp.uint8
        ),
        interpret=interpret,
    )
    aux_jnp = [jnp.asarray(x) for x in static_aux]

    @jax.jit
    def run(*planes_and_qpats):
        return call(*planes_and_qpats, *aux_jnp)

    return run


@lru_cache(maxsize=64)
def idct_only_kernel_roll(rows: int, cols: int, interpret: bool = False):
    """Bare dequant+IDCT via the VPU shift+mask formulation (see
    :func:`idct_roll_tile`) — same contract as :func:`idct_only_kernel`."""
    grid = (rows // BAND_ROWS, cols // TILE_W)
    mrow, mcol = roll_masks(BAND_ROWS, TILE_W)

    def kernel(x_ref, qpat_ref, mrow_ref, mcol_ref, out_ref):
        f = x_ref[:].astype(jnp.float32) * qpat_ref[:]
        out_ref[:, :] = idct_roll_tile(f, mrow_ref, mcol_ref)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BAND_ROWS, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            _const_spec((BAND_ROWS, TILE_W)),
            _const_spec(mrow.shape),
            _const_spec(mcol.shape),
        ],
        out_specs=pl.BlockSpec((BAND_ROWS, TILE_W), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        interpret=interpret,
    )
    mrow_j, mcol_j = jnp.asarray(mrow), jnp.asarray(mcol)

    @jax.jit
    def run(x, qpat):
        return call(x, qpat, mrow_j, mcol_j)

    return run


@lru_cache(maxsize=64)
def idct_only_kernel(rows: int, cols: int, interpret: bool = False):
    """Bare dequant+IDCT kernel for roofline measurement (BASELINE north
    star: 8x8 IDCT blocks/s vs speed of light): int16 coefficient plane
    [rows, cols] -> f32 spatial plane, nothing else. Grid tiles of
    [BAND_ROWS, TILE_W]; minimum HBM traffic 2B in + 4B out per pixel."""
    grid = (rows // BAND_ROWS, cols // TILE_W)
    a = dct_basis_1d()
    bd_at = _kron_eye(a.T, BAND_ROWS // 8)
    bd_a = _kron_eye(a, 16)  # [128,128] column-chunk matrix

    def kernel(x_ref, qpat_ref, bd_at_ref, bd_a_ref, out_ref):
        f = x_ref[:].astype(jnp.float32) * qpat_ref[:]
        out_ref[:, :] = sandwich_idct_split(f, bd_at_ref, bd_a_ref)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BAND_ROWS, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            _const_spec((BAND_ROWS, TILE_W)),
            _const_spec(bd_at.shape),
            _const_spec(bd_a.shape),
        ],
        out_specs=pl.BlockSpec((BAND_ROWS, TILE_W), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
        interpret=interpret,
    )
    bd_at_j, bd_a_j = jnp.asarray(bd_at), jnp.asarray(bd_a)

    @jax.jit
    def run(x, qpat):
        return call(x, qpat, bd_at_j, bd_a_j)

    return run


def _row_mean_matrix(rows: int, f: int) -> np.ndarray:
    """D [rows/f, rows] with D @ x box-averaging groups of f rows."""
    return np.kron(np.eye(rows // f), np.full((1, f), 1.0 / f)).astype(np.float32)


def _col_mean_matrix(cols: int, f: int) -> np.ndarray:
    """D [cols, cols/f] with x @ D box-averaging groups of f columns."""
    return np.kron(np.eye(cols // f), np.full((f, 1), 1.0 / f)).astype(np.float32)


def _encode_kernel(*refs, geom, n_comp: int):
    """Forward transform of one (band, col-tile) cell: planar RGB u8 in,
    quantized int16 coefficient planes out.

    refs: [rgb u8 (3|1, BAND_ROWS, TILE_W)] [inv qpat x n_comp]
    [per-comp static aux: bd_a, bd_at (+ drow, dcol when subsampling)]
    [out int16 x n_comp]."""
    rgb_ref = refs[0]
    iqpat_refs = refs[1 : 1 + n_comp]
    out_refs = refs[-n_comp:]
    aux = list(refs[1 + n_comp : -n_comp])

    def _to_f32(x):
        # Mosaic has no direct u8->f32 cast; widen to i32 first.
        return x.astype(jnp.int32).astype(jnp.float32)

    if n_comp == 1:
        planes = [_to_f32(rgb_ref[0]) - 128.0]
    else:
        r = _to_f32(rgb_ref[0])
        g = _to_f32(rgb_ref[1])
        b = _to_f32(rgb_ref[2])
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
        planes = [y, cb, cr]

    for ci, (h, v) in enumerate(geom.sampling):
        fy, fx = geom.v_max // v, geom.h_max // h
        x = planes[ci]
        bd_a = aux.pop(0)
        bd_at128 = aux.pop(0)
        if fy > 1:
            x = jnp.dot(aux.pop(0)[:], x, preferred_element_type=jnp.float32)
        if fx > 1:
            x = jnp.dot(x, aux.pop(0)[:], preferred_element_type=jnp.float32)
        # Forward per-8-block DCT (A @ g @ A^T), column side split into
        # [128, 128] chunks (see sandwich_idct_split).
        coeffs = sandwich_idct_split(x, bd_a, bd_at128)
        q = jnp.round(coeffs * iqpat_refs[ci][:])
        out_refs[ci][:, :] = jnp.clip(q, -32767.0, 32767.0).astype(
            jnp.int32).astype(jnp.int16)


@lru_cache(maxsize=256)
def fused_plane_encoder(geom, interpret: bool = False):
    """Build jitted fn: (rgb planar u8 [3|1, H_pad, W_pad], *inv_qpat f32)
    -> per-component quantized int16 coefficient planes
    (padded_plane_shapes layout — directly consumable by the C++ entropy
    encoder). Input must be edge-padded to the padded Y plane shape."""
    n_comp = len(geom.sampling)
    shapes = padded_plane_shapes(geom)
    w_pad = shapes[0][1]
    bm = band_mcus(geom)
    nb = n_bands(geom)
    grid = (nb, w_pad // TILE_W)
    n_chan = 3 if n_comp == 3 else 1

    rgb_spec = pl.BlockSpec((n_chan, BAND_ROWS, TILE_W), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)
    iqpat_specs = []
    static_aux = []
    out_specs = []
    out_shapes = []
    for (h, v) in geom.sampling:
        fy, fx = geom.v_max // v, geom.h_max // h
        rows, cols = bm * v * 8, TILE_W // fx
        iqpat_specs.append(_const_spec((rows, cols)))
        a = dct_basis_1d()
        static_aux.append(_kron_eye(a, rows // 8))
        static_aux.append(_kron_eye(a.T, min(cols, 128) // 8))
        if fy > 1:
            static_aux.append(_row_mean_matrix(BAND_ROWS, fy))
        if fx > 1:
            static_aux.append(_col_mean_matrix(TILE_W, fx))
        out_specs.append(
            pl.BlockSpec((rows, cols), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        )
        rtot, ctot = shapes[len(out_shapes)]
        out_shapes.append(jax.ShapeDtypeStruct((rtot, ctot), jnp.int16))
    aux_specs = [_const_spec(arr.shape) for arr in static_aux]

    call = pl.pallas_call(
        partial(_encode_kernel, geom=geom, n_comp=n_comp),
        grid=grid,
        in_specs=[rgb_spec] + iqpat_specs + aux_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )
    aux_jnp = [jnp.asarray(x) for x in static_aux]

    @jax.jit
    def run(rgb_planar, *iqpats):
        return call(rgb_planar, *iqpats, *aux_jnp)

    return run


def plan_inv_quant_patterns(quant_tables_zz, geom) -> list[np.ndarray]:
    """Per-component reciprocal quant tiles for :func:`fused_plane_encoder`.
    ``quant_tables_zz``: zigzag-order table per component."""
    out = []
    bm = band_mcus(geom)
    for ci, (h, v) in enumerate(geom.sampling):
        fx = geom.h_max // h
        rows, cols = bm * v * 8, TILE_W // fx
        out.append(1.0 / quant_pattern(quant_tables_zz[ci], rows, cols))
    return out


def plan_quant_patterns(plan, geom) -> list[np.ndarray]:
    """Per-component dequant tiles for :func:`fused_plane_decoder` inputs."""
    out = []
    bm = band_mcus(geom)
    for (h, v) in geom.sampling:
        fx = geom.h_max // h
        rows, cols = bm * v * 8, TILE_W // fx
        ci = len(out)
        q = plan.quant_tables[plan.components[ci].quant_id]
        out.append(quant_pattern(q, rows, cols))
    return out


def decode_planes_fused(planes, plan, rounding: str = "truncate",
                        interpret: bool = False, idct_mode: str = "exact"):
    """int16 coefficient planes (native_decode_planes layout) -> [H, W, 3] u8.

    The fast decode path: C++ entropy (plane layout) + this kernel.
    ``idct_mode="approx"`` runs the IDCT matmuls at DEFAULT (one bf16
    pass) instead of HIGHEST: ~1.8x faster kernel (measured 2161 -> 3930
    fps on a v5e 4K ablation), with bounded pixel error vs the exact
    kernel — the libjpeg JDCT_IFAST analogue for ML-ingestion pipelines
    that tolerate approximate pixels.
    """
    from jpeg_tpu.models.decoder import PipelineGeometry

    geom = PipelineGeometry.of(plan)
    fn = fused_plane_decoder(geom, rounding, interpret, idct_mode)
    qpats = plan_quant_patterns(plan, geom)
    planar = fn(*[jnp.asarray(p) for p in planes],
                *[jnp.asarray(q) for q in qpats])
    return planar[:, : geom.height, : geom.width].transpose(1, 2, 0)
