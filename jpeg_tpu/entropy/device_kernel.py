"""Device entropy decode v4: the lockstep MCU loop INSIDE one Pallas kernel.

Every prior device tier (v1/v2/pair/spec) is an XLA-level loop: on this
axon stack each sequential loop step pays ~25-40 us of dispatch latency
regardless of lane count, which is why the gate ladder concluded the
host/device crossover "does not exist" (``device_decode.py``). That
conclusion covered only XLA-loop formulations (VERDICT r3 missing-item 1).
Here the whole decode loop runs inside a single Mosaic kernel — dispatch
is paid once per kernel — built from primitives validated on the real
chip by ``tools/probe_inkernel*.py``:

* **select-reduce gather**: TPU has no vector gather, so ``lut[idx]``
  becomes ``sum(where(iota == idx, lut, 0), axis=0)`` — an [T, S]
  compare+select+reduce the VPU eats at ~4k lanes/cycle (probe P1a).
* **per-lane word refills** the same way over lane-private word columns
  (``words [W, S]``).
* lanes live on the LANE dimension (arrays are ``[*, S]``): elementwise
  state ops cost 1/128th of the ``[S, 1]`` orientation.
* 11-bit primary LUT + canonical length walk (five static compares,
  JPEG Annex F) for the rare 12..16-bit codes — a 2^16 flat row is a
  gather bargain for XLA but a 65536-wide compare sweep here.
* the Mosaic build crashes (internal tpu_compile_helper error) on some
  gated loop-carry formulations; updates here are written in the
  additive/OR-accumulate style (``x | where(p, d, 0)``,
  ``x + where(p, d, 0)``) that probes K1/I1 cleared.

Grid = (max_mcus,): one MCU per grid step, register/DC/error state in
VMEM scratch persisting across the sequential grid. Output streams to
HBM one ``[bpm, 64, S]`` block per step — no dynamic stores and no
VMEM-resident [S, blocks, 64] tensor.

Contract identical to v2 (zigzag order, DC-predicted, MCU stream order,
per-lane error flags, 0xAA tail semantics); equivalence-tested against
the oracle. Reference: ``src/jpeg/huffman.rs:109-268``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpeg_tpu.io.container import DecodePlan

T11 = 2048  # primary LUT size (11-bit peek)

# Scoped-VMEM budget for one in-kernel batch launch, calibrated on the real
# chip (v5e, 16 MiB scoped VMEM/core). The model counts the grid-invariant
# lane word block (W x S_pad x 4 B) plus a double-buffered per-step output
# block (2 x bpm x 64 x S_pad x 4 B), S_pad = lanes rounded to the 128-lane
# tile. Mosaic's real frame is ~25% larger than this (extra staging the
# model can't see): 4K row-restart batch 7 models at 13.0 MB but measures
# 16.63 MB scoped (OOM at the 16 MB limit), while batch 6 (11.4 MB model)
# runs; 1080p batch 24 (13.0 MB model) runs, batch 32 (17.0 MB) OOMs.
# r5 re-measurement with the exact frame instrument
# (tools/probe_vmem_frame.py): the v4 select-gather frame runs up to
# 1.36x this model at 1400+ lanes (1080p x22: model 12.0 -> real 16.31
# MB, an OOM the old 12 MB budget admitted), so the budget is 11 MB.
# The v5 windowed tier (device_window.py) replaced this kernel in
# production with a measured two-regime model; this budget only guards
# the legacy tier.
#
# Rejected lever: int16 output blocks would halve the out-buffer term and
# buy ~+1 batch at 4K, but coefficients must stay i32 — on corrupt (or
# adversarial valid-code) streams DC prediction legitimately accumulates
# past +-32767, and the cross-tier contract requires BIT-IDENTICAL
# garbage vs the i32 oracle (test_corrupt_stream_parity), which an i16
# wraparound would break.
_VMEM_BATCH_BUDGET = 11 * 2**20


def suggest_device_batch(plan: DecodePlan,
                         vmem_budget: int = _VMEM_BATCH_BUDGET,
                         max_batch: int = 64) -> int:
    """Largest homogeneous-corpus batch whose in-kernel launch fits the
    measured VMEM budget, from ``plan``'s geometry (segments-per-image,
    longest segment, blocks/MCU). The hybrid corpus route
    (``BatchedCorpusDecoder(hybrid_device=True)``) and
    ``bench.bench_e2e_hybrid`` use this instead of a hand-picked batch:
    4K row-restart -> 6, 1080p -> 22 on the calibration corpora."""
    s_img = max(1, len(plan.segments))
    bpm = plan.blocks_per_mcu
    w = _plan_w(plan)  # kernel_runner_batch's word bucketing
    best = 1
    for b in range(1, max_batch + 1):
        if _launch_model_bytes(w, b * s_img, bpm) <= vmem_budget:
            best = b
        else:
            break
    return best


def _launch_model_bytes(w_bucketed: int, n_lanes: int, bpm: int) -> int:
    """Analytic scoped-VMEM model for ONE in-kernel batch launch: the
    grid-invariant lane word block plus a double-buffered per-step output
    block, lanes padded to the 128-lane tile. Mosaic's real frame is ~25%
    larger (see _VMEM_BATCH_BUDGET); callers budget at 12 MB."""
    s_pad = -(-n_lanes // 128) * 128
    return (w_bucketed * s_pad + 2 * bpm * 64 * s_pad) * 4


def _plan_w(plan: DecodePlan) -> int:
    """Word-column height for ``plan`` under kernel_runner_batch's
    256-word bucketing (+4 slack words for refill prefetch)."""
    mw = max(-(-(s.byte_end - s.byte_start) // 4)
             for s in plan.segments) + 4
    return -(-mw // 256) * 256


def fit_batch_plans(plans: list,
                    vmem_budget: int = _VMEM_BATCH_BUDGET) -> list:
    """Split a claimed list of plans into contiguous sub-batches whose
    one-launch VMEM model each fits ``vmem_budget``, using the ACTUAL
    claimed plans' segment geometry (kernel_runner_batch sizes W and the
    grid from the max over the whole batch, so sizing from one probe plan
    alone can overshoot the budget when later-claimed images have longer
    segments — advisor r4 finding). Single oversized plans still get
    their own sub-batch (the launch OOM then falls back per-claim)."""
    out: list = []
    cur: list = []
    cur_w = cur_s = 0
    for p in plans:
        w = max(cur_w, _plan_w(p))
        s = cur_s + len(p.segments)
        if cur and _launch_model_bytes(
                w, s, p.blocks_per_mcu) > vmem_budget:
            out.append(cur)
            cur, cur_w, cur_s = [p], _plan_w(p), len(p.segments)
        else:
            cur, cur_w, cur_s = cur + [p], w, s
    if cur:
        out.append(cur)
    return out


# --------------------------------------------------------------------------
# Host-side table prep


def _lut11(table) -> np.ndarray:
    """[T11] i32: 11-bit peek -> len | sym<<8 for codes of length <= 11,
    else 0 (resolve via the canonical walk)."""
    ll = table.lut_length[::32].astype(np.int32)  # length at peek11<<5
    lv = table.lut_value[::32].astype(np.int32)
    ok = (ll > 0) & (ll <= 11)
    return np.where(ok, ll | (lv << 8), 0)


def _canon_params(table):
    """(mincode[5], maxcode[5], valptr[5], huffval[256]) for code lengths
    12..16 — JPEG Annex F canonical decode, evaluated with five static
    compares in-kernel."""
    mincode = np.zeros(5, np.int64)
    maxcode = np.full(5, -1, np.int64)
    valptr = np.zeros(5, np.int64)
    lengths = table.lengths.astype(np.int64)
    codes = table.codes.astype(np.int64)
    for i, ln in enumerate(range(12, 17)):
        sel = np.where(lengths == ln)[0]
        if len(sel):
            mincode[i] = codes[sel[0]]
            maxcode[i] = codes[sel[-1]]
            valptr[i] = sel[0]
    hv = np.zeros(256, np.int32)
    hv[: len(table.values)] = table.values.astype(np.int32)
    return mincode, maxcode, valptr, hv


def plan_kernel_tables(plan: DecodePlan, gather: str = "select"):
    """(lut11s, huffvals, canon) — rows 0-3 DC tables, 4-7 AC;
    ``canon[row]`` = (mincode, maxcode, valptr) python int tuples baked
    into the traced kernel (scalars). Shapes depend on the gather mode:
    "select" -> i32 [8, T11, 1] / [8, 256, 1] column tables for the
    select-reduce sweep; "mxu" -> f32 [8, 64, 32] / [8, 16, 16]
    Kronecker splits (tab2d[lo, hi] = tab[hi*Tlo + lo], entries < 2^24
    so the HIGHEST-precision dot is exact)."""
    luts = np.zeros((8, T11, 1), np.int32)
    hvs = np.zeros((8, 256, 1), np.int32)
    canon = []
    for row in range(8):
        tabs = plan.dc_tables if row < 4 else plan.ac_tables
        t = tabs[row % 4]
        if t is None:
            canon.append((tuple([0] * 5), tuple([-1] * 5), tuple([0] * 5)))
            continue
        luts[row, :, 0] = _lut11(t)
        mn, mx, vp, hv = _canon_params(t)
        hvs[row, :, 0] = hv
        canon.append((tuple(int(x) for x in mn),
                      tuple(int(x) for x in mx),
                      tuple(int(x) for x in vp)))
    if gather == "mxu":
        luts = np.ascontiguousarray(
            luts[:, :, 0].reshape(8, 32, 64).transpose(0, 2, 1)
        ).astype(np.float32)
        hvs = np.ascontiguousarray(
            hvs[:, :, 0].reshape(8, 16, 16).transpose(0, 2, 1)
        ).astype(np.float32)
    return luts, hvs, tuple(canon)


def _lane_words(scan: bytes, segs, max_words: int) -> np.ndarray:
    """[W, S] i32 big-endian u32 word columns, one per lane, 0xAA-padded
    (the reference's tail-fill byte, ``src/jpeg/huffman.rs:240-250``)."""
    S = len(segs)
    out = np.full((max_words, S), 0xAAAAAAAA, np.uint32)
    b = np.frombuffer(bytes(scan), np.uint8)
    for i, s in enumerate(segs):
        seg = b[s.byte_start : s.byte_end]
        n_words = -(-len(seg) // 4)
        padded = np.full(n_words * 4, 0xAA, np.uint8)
        padded[: len(seg)] = seg
        w = padded.reshape(-1, 4).astype(np.uint32)
        out[:n_words, i] = (
            (w[:, 0] << 24) | (w[:, 1] << 16) | (w[:, 2] << 8) | w[:, 3])
    return out.view(np.int32)


# --------------------------------------------------------------------------
# Kernel


def _bci(v):
    return jax.lax.bitcast_convert_type(v, jnp.int32)


def _bcu(v):
    return jax.lax.bitcast_convert_type(v, jnp.uint32)


def _gather_rows(idx, tab, iota):
    """tab[idx] per lane: tab [T, 1] i32, idx [1, S] i32 -> [1, S]."""
    return jnp.sum(jnp.where(iota == idx, tab, 0), axis=0, keepdims=True)


def _magnitude(hi, length, nbits, u32=jnp.uint32):
    """Magnitude bits [length, length+nbits) of the 32-bit register top,
    sign-extended per JPEG Table F.2 (all [1, S])."""
    sh = u32(32) - (length + nbits).astype(u32)
    raw = jnp.where(
        nbits > 0,
        _bci(hi >> sh) & ((1 << jnp.minimum(nbits, 16)) - 1), 0)
    base = jnp.where(nbits > 0, 1 << jnp.maximum(nbits - 1, 0), 0)
    return jnp.where((nbits > 0) & (raw < base), raw - 2 * base + 1, raw)


def _make_kernel(n_comp, max_mcus, bpm, slot_comp, slot_dc, slot_ac,
                 canon, S, W, gather="select", max_block_steps=70):
    u32 = jnp.uint32

    def _iotas():
        # Created per kernel trace: module-level iotas would be captured
        # as pallas constants, which pallas_call rejects.
        return (jax.lax.broadcasted_iota(jnp.int32, (T11, S), 0),
                jax.lax.broadcasted_iota(jnp.int32, (256, S), 0),
                jax.lax.broadcasted_iota(jnp.int32, (W, S), 0),
                jax.lax.broadcasted_iota(jnp.int32, (64, S), 0))

    def _shr32(x, a):
        """x >> a for a in [0, 32]: two half-shifts dodge the shift-by-32
        UB *and* the nested-where select chains that stall the Mosaic
        compiler (tools/probe_kernel_stages.py)."""
        h = (a >> 1).astype(u32)
        return (x >> h) >> (a.astype(u32) - h)

    def _shl32(x, a):
        h = (a >> 1).astype(u32)
        return (x << h) << (a.astype(u32) - h)

    def refill64(words, st, iota_w):
        """Append two stream words (64 bits) to lanes holding <= 32 valid
        bits. Branch-free placement via the half-shift helpers; the only
        select is the additive ``can`` gate (identity-else gated carries
        crash the Mosaic build, probes F/I2)."""
        wi, cnt, hi, mi, lo = st
        w0 = _bcu(_gather_rows(wi, words, iota_w))
        w1 = _bcu(_gather_rows(wi + 1, words, iota_w))
        can = cnt <= 32
        cnt_c = jnp.minimum(cnt, 32)  # keep shift amounts in [0, 32]
        inv = 32 - cnt_c              # even for discarded (can=False) lanes
        hi_c = _shr32(w0, cnt_c)
        mi_c = _shl32(w0, inv) | _shr32(w1, cnt_c)
        lo_c = _shl32(w1, inv)
        zero = u32(0)
        hi = hi | jnp.where(can, hi_c, zero)
        mi = mi | jnp.where(can, mi_c, zero)
        lo = lo | jnp.where(can, lo_c, zero)
        gain = jnp.where(can, 1, 0)
        return (wi + 2 * gain, cnt + 64 * gain, hi, mi, lo)

    def consume(st, d):
        """Shift the 96-bit register left by d (in [0, 31]) bits,
        branch-free (d=0 handled by the half-shift helpers)."""
        wi, cnt, hi, mi, lo = st
        du = d.astype(u32)
        hi = (hi << du) | _shr32(mi, 32 - d)
        mi = (mi << du) | _shr32(lo, 32 - d)
        lo = lo << du
        return (wi, cnt - d, hi, mi, lo)

    def _gather_kron(idx, tab2d, bits_lo):
        """tab[idx] per lane via a Kronecker one-hot split: idx =
        hi*2^bits_lo + lo; one-hot the hi part ([Th, S] compares), dot
        the [Tlo, Th] table slice on the MXU (f32 HIGHEST — entries
        < 2^24 so exact, probe P1b), then select-reduce the lo part.
        Replaces a [T, S] compare sweep with [Th + Tlo, S] compares —
        ~15x less VPU work for the 11-bit LUT (T=2048 -> 32+64)."""
        Th = tab2d.shape[1]
        Tlo = tab2d.shape[0]
        hi_idx = idx >> bits_lo
        lo_idx = idx & (Tlo - 1)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (Th, S), 0)
        oh_hi = (iota_hi == hi_idx).astype(jnp.float32)
        y = jax.lax.dot(tab2d, oh_hi,
                        precision=jax.lax.Precision.HIGHEST)  # [Tlo, S]
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (Tlo, S), 0)
        return jnp.sum(jnp.where(iota_lo == lo_idx, y, 0.0), axis=0,
                       keepdims=True).astype(jnp.int32)

    def resolve(hi, lut_row, hv_row, cn, iota_t, iota_h):
        """One Huffman symbol from the register top: 11-bit LUT gather +
        canonical 12..16-bit walk. -> (length [1,S], sym [1,S]);
        length == 0 marks an invalid prefix."""
        peek11 = _bci(hi >> u32(21))
        if gather == "mxu":
            e = _gather_kron(peek11, lut_row, 6)
        else:
            e = _gather_rows(peek11, lut_row, iota_t)
        len_f = e & 0x1F
        sym_f = (e >> 8) & 0xFF
        peek16 = _bci(hi >> u32(16))
        mincode, maxcode, valptr = cn
        len_s = jnp.zeros_like(len_f)
        idx = jnp.zeros_like(len_f)
        for i, ln in enumerate(range(12, 17)):
            if maxcode[i] < 0:
                continue
            code = peek16 >> (16 - ln)
            hit = ((code >= mincode[i]) & (code <= maxcode[i])
                   & (len_s == 0))
            len_s = len_s + jnp.where(hit, ln, 0)
            idx = idx + jnp.where(hit, valptr[i] + code - mincode[i], 0)
        if gather == "mxu":
            sym_s = _gather_kron(idx, hv_row, 4)
        else:
            sym_s = _gather_rows(idx, hv_row, iota_h)
        need_s = len_f == 0
        length = len_f + jnp.where(need_s, len_s, 0)
        sym = jnp.where(need_s, sym_s, sym_f)
        return length, sym

    def decode_block(words, st, err, active, lut_dc, hv_dc, cn_dc,
                     lut_ac, hv_ac, cn_ac, io):
        iota_t, iota_h, iota_w, pos_iota = io
        """One 8x8 block for all lanes -> (acc [64, S], st, err)."""
        st = refill64(words, st, iota_w)
        # --- DC symbol (peeled) ---
        length, size = resolve(st[2], lut_dc, hv_dc, cn_dc, iota_t, iota_h)
        bad = active & (length == 0)
        val = _magnitude(st[2], length, size)
        ok = active & ~bad
        st = consume(st, jnp.where(ok, length + size, 0))
        acc = jnp.where(ok & (pos_iota == 0), val, 0)
        err = err | bad
        coef = jnp.where(ok, 1, 64)

        # The AC loop carries the error mask as i32, not bool: a [1, S]
        # bool while_loop carry fails Mosaic's scf.yield legalization on
        # the real chip (bisected 2026-08-18, /tmp-bisect case C; every
        # other carry kind — mixed [1,S]/[8,S] i32, any() conds, fori —
        # legalizes fine).
        def cond(carry):
            st, erri, coef, acc, step = carry
            busy = active & (erri == 0) & (coef < 64)
            return (step < max_block_steps) & jnp.any(busy)

        def body(carry):
            st, erri, coef, acc, step = carry
            st = refill64(words, st, iota_w)
            busy = active & (erri == 0) & (coef < 64) & (st[1] >= 31)
            length, sym = resolve(st[2], lut_ac, hv_ac, cn_ac, iota_t,
                                  iota_h)
            bad = busy & (length == 0)
            is_eob = sym == 0x00
            is_zrl = sym == 0xF0
            run = (sym >> 4) & 0xF
            size = sym & 0xF
            nbits = jnp.where(is_eob | is_zrl, 0, size)
            val = _magnitude(st[2], length, nbits)
            d = jnp.where(busy & ~bad, length + nbits, 0)
            run_cap = jnp.minimum(run, 64 - coef - 1)
            pos = coef + run_cap
            coef_next = jnp.where(
                is_eob, 64,
                jnp.where(is_zrl, jnp.minimum(coef + 16, 64), pos + 1))
            do_write = busy & ~bad & ~is_eob & ~is_zrl
            acc = acc + jnp.where(do_write & (pos_iota == pos), val, 0)
            coef = coef + jnp.where(busy & ~bad, coef_next - coef, 0)
            erri = erri | bad.astype(jnp.int32)
            st = consume(st, d)
            return (st, erri, coef, acc, step + 1)

        st, erri, coef, acc, step = jax.lax.while_loop(
            cond, body, (st, err.astype(jnp.int32), coef, acc,
                         jnp.int32(0)))
        err = (erri > 0) | (active & (coef < 64))
        return acc, st, err

    def kernel(words_ref, luts_ref, hvs_ref, nblk_ref, bitend_ref,
               out_ref, errout_ref, reg_ref, dc_ref, err_ref):
        iota_t, iota_h, iota_w, pos_iota = _iotas()
        m = pl.program_id(0)
        words = words_ref[...]

        @pl.when(m == 0)
        def _init():
            reg_ref[0] = jnp.zeros((1, S), jnp.int32) + 2  # wi
            w0 = _gather_rows(jnp.zeros((1, S), jnp.int32), words, iota_w)
            w1 = _gather_rows(jnp.ones((1, S), jnp.int32), words, iota_w)
            reg_ref[1] = jnp.full((1, S), 64, jnp.int32)  # cnt
            reg_ref[2] = w0  # hi (i32 bitcast)
            reg_ref[3] = w1  # mi
            reg_ref[4] = jnp.zeros((1, S), jnp.int32)  # lo
            dc_ref[...] = jnp.zeros((n_comp, 1, S), jnp.int32)
            err_ref[...] = jnp.zeros((1, 1, S), jnp.int32)

        st = (reg_ref[0], reg_ref[1], _bcu(reg_ref[2]), _bcu(reg_ref[3]),
              _bcu(reg_ref[4]))
        err = err_ref[0] > 0
        nblk = nblk_ref[...]
        for slot in range(bpm):
            comp = slot_comp[slot]
            dcr, acr = slot_dc[slot], 4 + slot_ac[slot]
            active = ~err & (m * bpm + slot < nblk)
            acc, st, err = decode_block(
                words, st, err, active,
                luts_ref[dcr], hvs_ref[dcr], canon[dcr],
                luts_ref[acr], hvs_ref[acr], canon[acr],
                (iota_t, iota_h, iota_w, pos_iota))
            dc = dc_ref[comp] + jnp.where(active, acc[:1], 0)
            dc_ref[comp] = dc
            acc = acc + jnp.where(active & (pos_iota == 0),
                                  dc - acc[:1], 0)
            acc = jnp.where(active, acc, 0)
            out_ref[0, slot] = acc
        reg_ref[0], reg_ref[1] = st[0], st[1]
        reg_ref[2], reg_ref[3] = _bci(st[2]), _bci(st[3])
        reg_ref[4] = _bci(st[4])
        err_ref[0] = err.astype(jnp.int32)

        @pl.when(m == max_mcus - 1)
        def _finish():
            cursor = st[0] * 32 - st[1]
            over = cursor > bitend_ref[...] + 8
            errout_ref[...] = (err_ref[0] > 0) | over

    return kernel


@lru_cache(maxsize=64)
def _compiled_kernel4(n_comp, max_mcus, bpm, slot_comp, slot_dc, slot_ac,
                      canon, S, W, interpret=False, gather="select"):
    kernel = _make_kernel(n_comp, max_mcus, bpm, slot_comp, slot_dc,
                          slot_ac, canon, S, W, gather)
    lut_block = ((8, 64, 32) if gather == "mxu" else (8, T11, 1))
    hv_block = ((8, 16, 16) if gather == "mxu" else (8, 256, 1))
    fn = pl.pallas_call(
        kernel,
        grid=(max_mcus,),
        in_specs=[
            pl.BlockSpec((W, S), lambda m: (0, 0)),
            pl.BlockSpec(lut_block, lambda m: (0, 0, 0)),
            pl.BlockSpec(hv_block, lambda m: (0, 0, 0)),
            pl.BlockSpec((1, S), lambda m: (0, 0)),
            pl.BlockSpec((1, S), lambda m: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bpm, 64, S), lambda m: (m, 0, 0, 0)),
            pl.BlockSpec((1, S), lambda m: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((max_mcus, bpm, 64, S), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.bool_),
        ],
        scratch_shapes=[
            pltpu.VMEM((5, 1, S), jnp.int32),       # register
            pltpu.VMEM((n_comp, 1, S), jnp.int32),  # DC predictors
            pltpu.VMEM((1, 1, S), jnp.int32),       # error latch
        ],
        interpret=interpret,
    )
    return jax.jit(fn)


def kernel_runner(plan: DecodePlan, interpret: bool = False,
                  gather: str = "select"):
    """Compile the in-kernel decoder for ``plan`` -> (kernel, args,
    max_mcus, S). ``kernel(*args)`` returns the raw
    ([max_mcus, bpm, 64, S] i32, err [1, S]) device arrays — used by
    :func:`decode_coefficients_device4` and by bench.py's kernel-only
    timing (which must not pay the 50 MB tunnel D2H)."""
    segs = plan.segments
    bpm = plan.blocks_per_mcu
    max_mcus = max(s.mcu_count for s in segs)
    S = len(segs)
    # Lane-private word columns: +4 slack words for refill prefetch.
    max_words = max(-(-(s.byte_end - s.byte_start) // 4) for s in segs) + 4
    W = -(-max_words // 8) * 8
    luts, hvs, canon = plan_kernel_tables(plan, gather)
    slots = plan.component_block_slots()
    slot_comp = tuple(ci for ci, _ in slots)
    slot_dc = tuple(plan.components[ci].dc_id for ci, _ in slots)
    slot_ac = tuple(plan.components[ci].ac_id for ci, _ in slots)
    kernel = _compiled_kernel4(
        len(plan.components), max_mcus, bpm, slot_comp, slot_dc, slot_ac,
        canon, S, W, interpret, gather)
    words = _lane_words(plan.scan_data, segs, W)
    nblk = np.array([[s.mcu_count * bpm for s in segs]], np.int32)
    bitend = np.array(
        [[(s.byte_end - s.byte_start) * 8 for s in segs]], np.int32)
    args = (jnp.asarray(words), jnp.asarray(luts), jnp.asarray(hvs),
            jnp.asarray(nblk), jnp.asarray(bitend))
    return kernel, args, max_mcus, S


def decode_coefficients_device4(plan: DecodePlan, interpret: bool = False,
                                gather: str = "select"):
    """Entropy-decode the scan in ONE Pallas kernel ->
    ([total_blocks, 64] i32, err [S]). Contract identical to v1/v2."""
    kernel, args, max_mcus, S = kernel_runner(plan, interpret, gather)
    bpm = plan.blocks_per_mcu
    out, err = kernel(*args)
    # [max_mcus, bpm, 64, S] -> [S, max_mcus*bpm, 64] stream order.
    coeffs = np.moveaxis(np.asarray(out), 3, 0).reshape(
        S, max_mcus * bpm, 64)
    coeffs = coeffs.reshape(S * max_mcus * bpm, 64)[: plan.total_blocks]
    return coeffs, np.asarray(err)[0]


def kernel_runner_batch(plans: list, interpret: bool = False,
                        gather: str = "select"):
    """Compile ONE in-kernel decoder over a CORPUS: every plan's restart
    segments stacked on the lane axis (S_total lanes), sequential grid =
    the longest single segment. Same homogeneity contract as
    ``device_decode.decode_coefficients_device_batch`` (identical slot
    structure and byte-identical Huffman tables — the homogeneous-corpus
    deployment shape); per-image segment counts/lengths may differ.
    Returns (kernel, args, max_mcus, S_total, lane_base) where
    ``lane_base[i]`` is image i's first lane column."""
    assert plans, "empty batch"
    p0 = plans[0]
    bpm = p0.blocks_per_mcu
    luts, hvs, canon = plan_kernel_tables(p0, gather)
    slots = p0.component_block_slots()
    slot_comp = tuple(ci for ci, _ in slots)
    slot_dc = tuple(p0.components[ci].dc_id for ci, _ in slots)
    slot_ac = tuple(p0.components[ci].ac_id for ci, _ in slots)
    for p in plans[1:]:
        s = p.component_block_slots()
        l2, h2, c2 = plan_kernel_tables(p, gather)
        if (p.blocks_per_mcu != bpm
                or tuple(ci for ci, _ in s) != slot_comp
                or tuple(p.components[ci].dc_id for ci, _ in s) != slot_dc
                or tuple(p.components[ci].ac_id for ci, _ in s) != slot_ac
                or not np.array_equal(l2, luts)
                or not np.array_equal(h2, hvs) or c2 != canon):
            raise ValueError(
                "in-kernel batch requires identical slot structure and "
                "Huffman tables across images")
    max_mcus = max(s.mcu_count for p in plans for s in p.segments)
    max_words = max(-(-(s.byte_end - s.byte_start) // 4)
                    for p in plans for s in p.segments) + 4
    # Bucket the lane-column height so successive corpus batches with
    # slightly different longest-segment lengths reuse the lru-cached
    # compiled kernel (256 words = 1 KB/lane granularity).
    W = -(-max_words // 256) * 256
    lane_base = []
    cols, nblk, bitend = [], [], []
    pos = 0
    for p in plans:
        lane_base.append(pos)
        cols.append(_lane_words(p.scan_data, p.segments, W))
        nblk.extend(s.mcu_count * bpm for s in p.segments)
        bitend.extend((s.byte_end - s.byte_start) * 8 for s in p.segments)
        pos += len(p.segments)
    S = pos
    words = np.concatenate(cols, axis=1)
    kernel = _compiled_kernel4(
        len(p0.components), max_mcus, bpm, slot_comp, slot_dc, slot_ac,
        canon, S, W, interpret, gather)
    args = (jnp.asarray(words), jnp.asarray(luts), jnp.asarray(hvs),
            jnp.asarray(np.array([nblk], np.int32)),
            jnp.asarray(np.array([bitend], np.int32)))
    return kernel, args, max_mcus, S, lane_base


def decode_coefficients_device4_batch(plans: list, interpret: bool = False,
                                      gather: str = "select",
                                      to_host: bool = True):
    """Corpus entropy decode in ONE kernel launch -> (list of
    [total_blocks, 64] i32 per image, err [S_total]). The per-image lane
    rows are trimmed per segment when an image's restart interval is
    shorter than the batch-wide max (same reshape contract as the v1
    batch tier). ``to_host=False`` keeps the coefficient arrays AND the
    error vector on device (the hybrid corpus route feeds coefficients
    straight into the XLA pixel pipeline — no D2H of ~50 MB/4K frame —
    and defers the err sync so the caller can keep a second launch in
    flight; materialize it with ``np.asarray(err)``)."""
    kernel, args, max_mcus, S, lane_base = kernel_runner_batch(
        plans, interpret, gather)
    bpm = plans[0].blocks_per_mcu
    out, err = kernel(*args)
    xp = np if to_host else jnp
    flat = xp.moveaxis(np.asarray(out) if to_host else out, 3, 0).reshape(
        S, max_mcus * bpm, 64)
    results = []
    for p, row in zip(plans, lane_base):
        segs = p.segments
        if all(s.mcu_count == max_mcus for s in segs[:-1]):
            img = flat[row : row + len(segs)].reshape(-1, 64)
        else:
            img = xp.concatenate(
                [flat[row + i, : s.mcu_count * bpm]
                 for i, s in enumerate(segs)])
        results.append(img[: p.total_blocks])
    return results, (np.asarray(err)[0] if to_host else err[0])
