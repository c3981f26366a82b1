"""Per-step cost ablation for the lockstep device entropy kernel.

Uses a 4K stream re-encoded with a 16-MCU restart interval (2025 valid
lane starts) so every lane decodes real symbols. Variants isolate the
cost components of a step: LUT gathers, refill gathers, one-hot
coefficient accumulate, per-block output flush, and the big while-loop
carry. Run as the only TPU process under `timeout`.
"""

import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bench import make_4k_jpeg  # noqa: E402
from jpeg_tpu.entropy.device_decode import packed_luts  # noqa: E402
from jpeg_tpu.entropy.device_decode2 import (  # noqa: E402
    SYMS_PER_STEP,
    _magnitude,
    _make_register_ops,
    _plan_slot_ids,
    _scan_words,
)
from jpeg_tpu.io.container import parse_jpeg  # noqa: E402


def build_kernel(n_comp, max_mcus, slot_comp, slot_dc, slot_ac, *,
                 accumulate=True, flush=True, syms=SYMS_PER_STEP,
                 refills=2):
    bpm = len(slot_comp)
    blocks_per_seg = max_mcus * bpm

    def kernel(words, luts, bit_start, n_blocks_seg):
        S = bit_start.shape[0]
        n_words = words.shape[0]
        u32 = jnp.uint32
        refill, consume = _make_register_ops(words)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 64), 1)
        max_block_steps = 40

        def decode_block(reg, err, active, lut_dc, lut_ac):
            reg = refill(refill(reg))
            peek = (reg[2] >> 16).astype(jnp.int32)
            e = lut_dc[peek]
            length = e & 0xFF
            nbits = (e >> 8) & 0xFF
            bad = active & (length == 0)
            val = _magnitude(reg[2], length, nbits)
            ok = active & ~bad
            reg = consume(reg, jnp.where(ok, length + nbits, 0))
            if accumulate:
                acc = jnp.where(ok[:, None] & (pos_iota == 0),
                                val[:, None], 0)
            else:
                acc = val  # [S] checksum accumulator
            state = dict(reg=reg, err=err | bad,
                         coef=jnp.where(ok, 1, 64), acc=acc,
                         step=jnp.int32(0))

            def cond(st):
                busy = active & ~st["err"] & (st["coef"] < 64)
                return (st["step"] < max_block_steps) & jnp.any(busy)

            def body(st):
                reg = st["reg"]
                for _ in range(refills):
                    reg = refill(reg)
                err, coef, acc = st["err"], st["coef"], st["acc"]
                for _k in range(syms):
                    busy = (active & ~err & (coef < 64) & (reg[1] >= 27))
                    peek = (reg[2] >> 16).astype(jnp.int32)
                    e = lut_ac[peek]
                    length = e & 0xFF
                    sym = (e >> 8) & 0xFF
                    bad = busy & (length == 0)
                    is_eob = sym == 0x00
                    is_zrl = sym == 0xF0
                    run = (sym >> 4) & 0xF
                    size = sym & 0xF
                    nbits = jnp.where(is_eob | is_zrl, 0, size)
                    val = _magnitude(reg[2], length, nbits)
                    d = jnp.where(busy & ~bad, length + nbits, 0)
                    run_cap = jnp.minimum(run, 64 - coef - 1)
                    pos = coef + run_cap
                    coef_next = jnp.where(
                        is_eob, 64,
                        jnp.where(is_zrl, jnp.minimum(coef + 16, 64),
                                  pos + 1))
                    do_write = busy & ~bad & ~is_eob & ~is_zrl
                    if accumulate:
                        acc = acc + jnp.where(
                            do_write[:, None] & (pos_iota == pos[:, None]),
                            val[:, None], 0)
                    else:
                        acc = acc + jnp.where(do_write, val, 0)
                    coef = jnp.where(busy & ~bad, coef_next, coef)
                    err = err | bad
                    reg = consume(reg, d)
                return dict(reg=reg, err=err, coef=coef, acc=acc,
                            step=st["step"] + 1)

            st = jax.lax.while_loop(cond, body, state)
            return st["acc"], st["reg"], st["err"]

        def mcu_body(m, carry):
            reg, err, prev_dc, out = carry
            base = m * bpm
            for slot in range(bpm):
                comp = slot_comp[slot]
                active = ~err & (base + slot < n_blocks_seg)
                block, reg, err = decode_block(
                    reg, err, active, luts[slot_dc[slot]],
                    luts[4 + slot_ac[slot]])
                if accumulate:
                    dc = jnp.where(active, block[:, 0] + prev_dc[comp],
                                   prev_dc[comp])
                else:
                    dc = jnp.where(active, block + prev_dc[comp],
                                   prev_dc[comp])
                prev_dc = tuple(dc if c == comp else prev_dc[c]
                                for c in range(n_comp))
                if accumulate and flush:
                    blk = block.at[:, 0].set(jnp.where(active, dc, 0))
                    blk = jnp.where(active[:, None], blk, 0)
                    out = jax.lax.dynamic_update_slice(
                        out, blk[:, None, :], (0, base + slot, 0))
                elif not accumulate:
                    out = out + block
            return reg, err, prev_dc, out

        wi0 = bit_start >> 5
        off0 = (bit_start & 31).astype(u32)
        w0 = words[jnp.clip(wi0, 0, n_words - 1)]
        reg = (wi0 + 1, 32 - (bit_start & 31), w0 << off0,
               jnp.zeros((S,), u32), jnp.zeros((S,), u32))
        if accumulate and flush:
            out = jnp.zeros((S, blocks_per_seg, 64), jnp.int32)
        elif accumulate:
            out = jnp.zeros((S, 1, 64), jnp.int32)  # no-flush: tiny out
        else:
            out = jnp.zeros((S,), jnp.int32)
        prev_dc = tuple(jnp.zeros((S,), jnp.int32) for _ in range(n_comp))
        err = jnp.zeros((S,), bool)
        reg, err, prev_dc, out = jax.lax.fori_loop(
            0, max_mcus, mcu_body, (reg, err, prev_dc, out))
        return out, err

    return jax.jit(kernel)


def main():
    data = make_4k_jpeg(restart_rows=1)
    # Re-encode with a 16-MCU restart interval for 2025 valid lane starts.
    from PIL import Image
    import io as _io

    img = np.asarray(Image.open(_io.BytesIO(data)).convert("RGB"))
    from jpeg_tpu.models.encoder import encode_rgb

    data2 = encode_rgb(img, quality=85, subsampling=(2, 2),
                       restart_interval_mcus=16)
    plan = parse_jpeg(data2)
    segs = plan.segments
    print(f"segments: {len(segs)}, mcus/seg: {segs[0].mcu_count}")
    slot_comp, slot_dc, slot_ac = _plan_slot_ids(plan)
    max_mcus = max(s.mcu_count for s in segs)
    words = jnp.asarray(_scan_words(plan.scan_data))
    luts = jnp.asarray(packed_luts(plan))
    bit_start = jnp.asarray(
        np.array([s.byte_start * 8 for s in segs], np.int32))
    nbs = jnp.asarray(
        np.array([s.mcu_count * plan.blocks_per_mcu for s in segs],
                 np.int32))

    variants = [
        ("baseline", dict()),
        ("no-flush", dict(flush=False)),
        ("no-accum", dict(accumulate=False)),
        ("syms=2", dict(syms=2)),
        ("syms=6", dict(syms=6)),
        ("refill=1", dict(refills=1)),
        ("syms=6,refill=3", dict(syms=6, refills=3)),
    ]
    for name, kw in variants:
        kern = build_kernel(len(plan.components), max_mcus, slot_comp,
                            slot_dc, slot_ac, **kw)
        out, err = kern(words, luts, bit_start, nbs)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out, err = kern(words, luts, bit_start, nbs)
            cs = float(jnp.sum(out.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        ne = int(np.asarray(err).sum())
        print(f"{name:18s} {1e3*sorted(ts)[1]:7.1f} ms   err={ne} cs={cs:.0f}")


if __name__ == "__main__":
    main()
