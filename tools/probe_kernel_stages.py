"""Staged Mosaic-compile bisect for the in-kernel entropy decoder
(entropy/device_kernel.py — correct in interpret mode; the full kernel
hangs the remote Mosaic compiler). Each stage adds one structural
element; stages run in KILLABLE subprocesses (a compiler hang must not
take down the sweep). Usage:
    python tools/probe_kernel_stages.py            # run all stages
    python tools/probe_kernel_stages.py <stage>    # one stage, in-proc
"""

import subprocess
import sys

sys.path.insert(0, ".")

STAGES = [
    "s1_skeleton",      # grid + scratch + pl.when init + out writes
    "s2_refill",        # + refill64/consume register ops per step
    "s3_resolve",       # + 11-bit LUT gather + canonical walk
    "s4_fori_block",    # + block loop as fixed fori (no while)
    "s5_while_block",   # + while(any busy) block loop (the real shape)
    "s6_full",          # the production kernel via decode path
]


def build(stage):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jpeg_tpu.entropy.device_kernel import (
        T11, _bci, _bcu, _gather_rows, _magnitude)

    S, W, bpm, max_mcus = 128, 256, 6, 4
    u32 = jnp.uint32

    def iotas():
        return (jax.lax.broadcasted_iota(jnp.int32, (T11, S), 0),
                jax.lax.broadcasted_iota(jnp.int32, (256, S), 0),
                jax.lax.broadcasted_iota(jnp.int32, (W, S), 0),
                jax.lax.broadcasted_iota(jnp.int32, (64, S), 0))

    def refill64(words, st, iota_w):
        wi, cnt, hi, mi, lo = st
        w0 = _bcu(_gather_rows(wi, words, iota_w))
        w1 = _bcu(_gather_rows(wi + 1, words, iota_w))
        can = cnt <= 32
        cu = cnt.astype(u32)
        sh = cu & u32(31)
        full = cnt == 32
        hi_c = jnp.where(full, u32(0), w0 >> sh)
        mi_c = jnp.where(full, w0,
                         jnp.where(cnt == 0, u32(0),
                                   w0 << ((u32(32) - cu) & u32(31))))
        mi_c = mi_c | jnp.where(full, u32(0), w1 >> sh)
        lo_c = jnp.where(full, w1,
                         jnp.where(cnt == 0, u32(0),
                                   w1 << ((u32(32) - cu) & u32(31))))
        zero = u32(0)
        hi = hi | jnp.where(can, hi_c, zero)
        mi = mi | jnp.where(can, mi_c, zero)
        lo = lo | jnp.where(can, lo_c, zero)
        gain = jnp.where(can, 1, 0)
        return (wi + 2 * gain, cnt + 64 * gain, hi, mi, lo)

    def consume(st, d):
        wi, cnt, hi, mi, lo = st
        du = d.astype(u32)
        dsh = (u32(32) - du) & u32(31)
        dnz = du > 0
        zero = u32(0)
        hi = (hi << du) | jnp.where(dnz, mi >> dsh, zero)
        mi = (mi << du) | jnp.where(dnz, lo >> dsh, zero)
        lo = lo << du
        return (wi, cnt - d, hi, mi, lo)

    def resolve(hi, lut_row, hv_row, iota_t, iota_h):
        peek11 = _bci(hi >> u32(21))
        e = _gather_rows(peek11, lut_row, iota_t)
        len_f = e & 0x1F
        sym_f = (e >> 8) & 0xFF
        peek16 = _bci(hi >> u32(16))
        len_s = jnp.zeros_like(len_f)
        idx = jnp.zeros_like(len_f)
        for i, ln in enumerate(range(12, 17)):
            code = peek16 >> (16 - ln)
            hit = (code >= i) & (code <= 99 + i) & (len_s == 0)
            len_s = len_s + jnp.where(hit, ln, 0)
            idx = idx + jnp.where(hit, 7 + code - i, 0)
        sym_s = _gather_rows(idx & 0xFF, hv_row, iota_h)
        need_s = len_f == 0
        length = len_f + jnp.where(need_s, len_s, 0)
        sym = jnp.where(need_s, sym_s, sym_f)
        return length, sym

    def kernel(words_ref, luts_ref, hvs_ref, out_ref, reg_ref):
        iota_t, iota_h, iota_w, pos_iota = iotas()
        m = pl.program_id(0)
        words = words_ref[...]

        @pl.when(m == 0)
        def _init():
            reg_ref[0] = jnp.zeros((1, S), jnp.int32) + 2
            reg_ref[1] = jnp.full((1, S), 64, jnp.int32)
            reg_ref[2] = _gather_rows(jnp.zeros((1, S), jnp.int32), words,
                                      iota_w)
            reg_ref[3] = _gather_rows(jnp.ones((1, S), jnp.int32), words,
                                      iota_w)
            reg_ref[4] = jnp.zeros((1, S), jnp.int32)

        st = (reg_ref[0], reg_ref[1], _bcu(reg_ref[2]), _bcu(reg_ref[3]),
              _bcu(reg_ref[4]))

        for slot in range(bpm):
            acc = jnp.zeros((64, S), jnp.int32)
            if stage == "s1_skeleton":
                acc = acc + _bci(st[2]) + m + slot
            elif stage == "s2_refill":
                st = refill64(words, st, iota_w)
                st = consume(st, (_bci(st[2]) & 7) + 1)
                acc = acc + _bci(st[2])
            elif stage == "s3_resolve":
                st = refill64(words, st, iota_w)
                length, sym = resolve(st[2], luts_ref[slot % 8],
                                      hvs_ref[slot % 8], iota_t, iota_h)
                val = _magnitude(st[2], length, sym & 0xF)
                st = consume(st, jnp.minimum(length + (sym & 0xF), 31))
                acc = acc + jnp.where(pos_iota == (sym & 63), val, 0)
            elif stage == "s4_fori_block":
                def body(k, carry):
                    st, acc = carry
                    st = refill64(words, st, iota_w)
                    length, sym = resolve(st[2], luts_ref[slot % 8],
                                          hvs_ref[slot % 8], iota_t,
                                          iota_h)
                    val = _magnitude(st[2], length, sym & 0xF)
                    st = consume(st, jnp.minimum(length + (sym & 0xF), 31))
                    acc = acc + jnp.where(pos_iota == (sym & 63), val, 0)
                    return st, acc
                st, acc = jax.lax.fori_loop(0, 8, body, (st, acc))
            elif stage == "s5_while_block":
                def cond(carry):
                    st, acc, coef, step = carry
                    return (step < 8) & jnp.any(coef < 64)

                def body(carry):
                    st, acc, coef, step = carry
                    st = refill64(words, st, iota_w)
                    length, sym = resolve(st[2], luts_ref[slot % 8],
                                          hvs_ref[slot % 8], iota_t,
                                          iota_h)
                    val = _magnitude(st[2], length, sym & 0xF)
                    st = consume(st, jnp.minimum(length + (sym & 0xF), 31))
                    acc = acc + jnp.where(pos_iota == (sym & 63), val, 0)
                    coef = coef + jnp.where(coef < 64, (sym & 15) + 1, 0)
                    return st, acc, coef, step + 1
                coef = jnp.zeros((1, S), jnp.int32)
                st, acc, coef, _ = jax.lax.while_loop(
                    cond, body, (st, acc, coef, jnp.int32(0)))
            out_ref[0, slot] = acc
        reg_ref[0], reg_ref[1] = st[0], st[1]
        reg_ref[2], reg_ref[3] = _bci(st[2]), _bci(st[3])
        reg_ref[4] = _bci(st[4])

    fn = pl.pallas_call(
        kernel,
        grid=(max_mcus,),
        in_specs=[
            pl.BlockSpec((W, S), lambda m: (0, 0)),
            pl.BlockSpec((8, T11, 1), lambda m: (0, 0, 0)),
            pl.BlockSpec((8, 256, 1), lambda m: (0, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, bpm, 64, S), lambda m: (m, 0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((max_mcus, bpm, 64, S), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((5, 1, S), jnp.int32)],
    )

    import numpy as np
    rng = np.random.default_rng(0)
    words = rng.integers(0, 1 << 31, (W, S)).astype(np.int32)
    luts = rng.integers(0, 1 << 13, (8, T11, 1)).astype(np.int32)
    hvs = rng.integers(0, 256, (8, 256, 1)).astype(np.int32)
    out = jax.jit(fn)(words, luts, hvs)
    return int(np.asarray(out[0])[0, 0, 0, 0])


def run_stage(stage):
    import time
    t0 = time.time()
    v = build(stage)
    print(f"{stage}: OK ({time.time() - t0:.0f}s, v={v})", flush=True)


def s6_full():
    import numpy as np
    from jpeg_tpu.entropy.device_kernel import decode_coefficients_device4
    from jpeg_tpu.entropy.oracle import decode_coefficients
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.models.encoder import encode_rgb

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)
    data = encode_rgb(img, quality=85, subsampling=(2, 2),
                      restart_interval_mcus=6)
    plan = parse_jpeg(data)
    ref = decode_coefficients(plan)
    got, err = decode_coefficients_device4(plan)
    print(f"s6_full: OK exact={np.array_equal(got, ref)} "
          f"err={bool(err.any())}", flush=True)


def main():
    if len(sys.argv) > 1:
        stage = sys.argv[1]
        if stage == "s6_full":
            s6_full()
        else:
            run_stage(stage)
        return
    for stage in STAGES:
        try:
            r = subprocess.run(
                [sys.executable, "-u", __file__, stage],
                capture_output=True, text=True, timeout=420)
            out = (r.stdout + r.stderr).strip().splitlines()
            tail = [ln for ln in out if "WARNING" not in ln][-1:] or ["?"]
            print(f"{stage}: rc={r.returncode} {tail[0][:220]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"{stage}: COMPILE HANG (>420s, killed)", flush=True)


if __name__ == "__main__":
    main()
