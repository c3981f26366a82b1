#!/usr/bin/env python
"""Independent reference-fidelity fixture generator.

Breaks the golden-circularity noted in VERDICT.md (round 1, Missing #1):
the committed goldens are this repo's own compat-mode output, so "bit-exact
vs the reference" rested on self-generated data. This script re-derives the
expected output of `/root/reference` for `working-jpegs/huff_simple0.jpg`
(653 bytes, 16x8, three 1x1 components, 6 blocks) **without importing any
jpeg_tpu code**: it is a from-scratch trace of the reference's algebra,
written against the Rust sources:

- marker walk + 0xFF00 unstuffing: src/jpeg/mod.rs:362-381
- Huffman semantics (32-bit window, MSB-first, 0xAA tail padding,
  Table F.2 value correction): src/jpeg/huffman.rs:109-268
- DC prediction: src/jpeg/decoder.rs:207-210
- dequant + zigzag inverse: src/jpeg/decoder.rs:227-235, 404-437
- float IDCT, per-term f32 accumulation: src/transform.rs:55-87
- block placement for 1x1 sampling: src/jpeg/decoder.rs:290-312
- YCbCr->RGB quirk algebra + truncating f32->u8: src/jpeg/decoder.rs:382-402

Every float step emulates Rust f32 semantics with np.float32 scalars
(one rounding per arithmetic op). cos() is computed in float64 and rounded
to f32 — correctly rounded, matching Rust's cosf to <=1 ulp.

Writes tests/goldens/huff_simple0_fidelity.npz with:
- coeffs_zz [6, 64] int16 — DC-corrected zigzag-order coefficients in MCU
  stream order (c0, c1, c2 per MCU), the entropy-layer contract
- rgb [8, 16, 3] uint8 — final reference-algebra pixels

Run: python tests/gen_fidelity_fixtures.py
"""

import os

import numpy as np

F = np.float32
HERE = os.path.dirname(os.path.abspath(__file__))
SRC = "/root/reference/working-jpegs/huff_simple0.jpg"
OUT = os.path.join(HERE, "goldens", "huff_simple0_fidelity.npz")

ZIGZAG_INDICES = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33,
    40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50, 43,
    36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53,
    60, 61, 54, 47, 55, 62, 63,
]


def parse(data):
    """Minimal baseline marker walk (SOI/DQT/SOF0/DHT/SOS), returning
    quant tables, huffman (bits, values) pairs, frame info, and the
    unstuffed entropy-coded bytes."""
    assert data[0:2] == b"\xff\xd8"
    i = 2
    quant = {}
    dc_tabs, ac_tabs = {}, {}
    frame = None
    scan_comps = None
    entropy = None
    while i < len(data):
        assert data[i] == 0xFF, hex(data[i])
        marker = data[i + 1]
        if marker == 0xD9:
            break
        seg_len = (data[i + 2] << 8) | data[i + 3]
        body = data[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:
            j = 0
            while j < len(body):
                assert body[j] >> 4 == 0
                quant[body[j] & 0xF] = list(body[j + 1 : j + 65])
                j += 65
        elif marker == 0xC0:
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w, h, comps)
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0xF
                bits = list(body[j + 1 : j + 17])
                count = sum(bits)
                values = list(body[j + 17 : j + 17 + count])
                (dc_tabs if tc == 0 else ac_tabs)[th] = (bits, values)
                j += 17 + count
        elif marker == 0xDA:
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid = body[1 + 2 * c]
                tt = body[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0xF))
            # Unstuff 0xFF00 -> 0xFF until the next marker
            # (src/jpeg/mod.rs:371-381).
            out = bytearray()
            while i < len(data):
                b = data[i]
                if b == 0xFF and i + 1 < len(data) and data[i + 1] == 0x00:
                    out.append(0xFF)
                    i += 2
                elif b == 0xFF and data[i + 1] != 0x00:
                    break
                else:
                    out.append(b)
                    i += 1
            entropy = bytes(out)
    return quant, dc_tabs, ac_tabs, frame, scan_comps, entropy


def make_code_table(lengths):
    """JPEG Figure C.2 (src/jpeg/huffman.rs:80-98)."""
    codes = []
    code = 0
    cur = lengths[0]
    for ln in lengths:
        while ln > cur:
            code <<= 1
            cur += 1
        codes.append(code)
        code += 1
    return codes


def build_table(bits, values):
    """-> dict (length, code) -> value."""
    lengths = []
    for ln, n in enumerate(bits, start=1):
        lengths.extend([ln] * n)
    codes = make_code_table(lengths)
    return {(ln, c): v for ln, c, v in zip(lengths, codes, values)}


class BitReader:
    """Reference HuffmanDecoder semantics: 32-bit window preloaded with the
    first 4 bytes, MSB-first reads from bits 31..16, 0xAA padding past the
    end (src/jpeg/huffman.rs:123-254)."""

    def __init__(self, data):
        self.data = data
        self.current = int.from_bytes(data[:4], "big")
        self.next_index = 4
        self.bits_read = 0

    def _shift(self, n):
        self.current = (self.current << n) & 0xFFFFFFFF
        self.bits_read += n
        while self.bits_read >= 8:
            self.bits_read -= 8
            nxt = (self.data[self.next_index]
                   if self.next_index < len(self.data) else 0xAA)
            self.current |= nxt << self.bits_read
            self.next_index += 1

    def read_n_bits(self, n):
        if n == 0:
            return 0
        val = (self.current >> (32 - n)) & ((1 << n) - 1)
        self._shift(n)
        return val

    def next_code(self, table):
        for ln in range(2, 17):
            bits = (self.current >> (32 - ln)) & ((1 << ln) - 1)
            if (ln, bits) in table:
                self._shift(ln)
                return table[(ln, bits)]
        raise AssertionError("no code matched")


def value_correction(val, length):
    """JPEG Table F.2 (src/jpeg/huffman.rs:256-268)."""
    if length == 0:
        return 0
    base = 1 << (length - 1)
    return val if val >= base else -2 * base + 1 + val


def next_block(reader, dc_tab, ac_tab):
    """One 8x8 block, zigzag order (src/jpeg/huffman.rs:146-195)."""
    n = reader.next_code(dc_tab)
    block = [value_correction(reader.read_n_bits(n), n)]
    while len(block) < 64:
        sym = reader.next_code(ac_tab)
        if sym == 0x00:
            block.extend([0] * (64 - len(block)))
            break
        if sym == 0xF0:
            block.extend([0] * min(16, 64 - len(block)))
            continue
        run, size = sym >> 4, sym & 0xF
        num = value_correction(reader.read_n_bits(size), size)
        block.extend([0] * min(run, 64 - len(block) - 1))
        block.append(num)
    assert len(block) == 64
    return block


def idct_reference(coef_nat):
    """src/transform.rs:55-87 with per-op f32 rounding."""
    inv_sqrt2 = F(1.0) / np.sqrt(F(2.0), dtype=np.float32)
    pi = F(np.pi)

    def alpha(u):
        return inv_sqrt2 if u == 0 else F(1.0)

    def cosf(x):
        return F(np.cos(np.float64(x)))

    out = np.zeros(64, np.float32)
    for y in range(8):
        for x in range(8):
            s = F(0.0)
            for v in range(8):
                for u in range(8):
                    f_uv = coef_nat[v * 8 + u]
                    c1 = cosf((F(2.0) * F(x) + F(1.0)) * F(u) * pi / F(16.0))
                    c2 = cosf((F(2.0) * F(y) + F(1.0)) * F(v) * pi / F(16.0))
                    term = alpha(u) * alpha(v)
                    term = term * f_uv
                    term = term * c1
                    term = term * c2
                    s = s + term
            out[y * 8 + x] = s / F(4.0)
    return out


def f32_to_u8(n):
    """src/jpeg/decoder.rs:382-390: clamp then truncate."""
    if n < 0.0:
        return 0
    if n > 255.0:
        return 255
    return int(n)


def y_cb_cr_to_rgb(y, cb, cr):
    """src/jpeg/decoder.rs:392-402, per-op f32."""
    c_red, c_green, c_blue = F(0.299), F(0.587), F(0.114)
    r = cr * (F(2.0) - F(2.0) * c_red) + y
    b = cb * (F(2.0) - F(2.0) * c_blue) + y
    g = (y - c_blue * b - c_red * r) / c_green
    return (f32_to_u8(r + F(128.0)), f32_to_u8(g + F(128.0)),
            f32_to_u8(b + F(128.0)))


def main():
    with open(SRC, "rb") as f:
        data = f.read()
    quant, dc_tabs, ac_tabs, frame, scan_comps, entropy = parse(data)
    w, h, comps = frame
    assert (w, h) == (16, 8) and len(comps) == 3
    assert all(ch == 1 and cv == 1 for _, ch, cv, _ in comps)

    dc = {i: build_table(*t) for i, t in dc_tabs.items()}
    ac = {i: build_table(*t) for i, t in ac_tabs.items()}
    reader = BitReader(entropy)

    n_mcus = 2  # 16x8, 1x1 sampling -> 2 blocks per component
    prev_dc = [0, 0, 0]
    stream = []  # MCU-interleaved zigzag blocks (c0, c1, c2 per MCU)
    per_comp = [[] for _ in comps]
    for _ in range(n_mcus):
        for ci, (cid, _, _, tq) in enumerate(comps):
            _, dc_id, ac_id = scan_comps[ci]
            assert scan_comps[ci][0] == cid
            blk = next_block(reader, dc[dc_id], ac[ac_id])
            blk[0] += prev_dc[ci]
            prev_dc[ci] = blk[0]
            stream.append(blk)
            per_comp[ci].append(blk)

    coeffs_zz = np.array(stream, np.int16)

    # Dequant (f32) + zigzag inverse + reference IDCT, then assemble the
    # 1x1-sampling plane: block b covers columns 8b..8b+8.
    planes = np.zeros((3, 8, 16), np.float32)
    for ci, (cid, _, _, tq) in enumerate(comps):
        q = quant[tq]
        for b, blk in enumerate(per_comp[ci]):
            deq = [F(n) * F(qv) for n, qv in zip(blk, q)]
            nat = np.zeros(64, np.float32)
            for zi, val in enumerate(deq):
                nat[ZIGZAG_INDICES[zi]] = val
            spatial = idct_reference(nat).reshape(8, 8)
            planes[ci, :, 8 * b : 8 * b + 8] = spatial

    rgb = np.zeros((8, 16, 3), np.uint8)
    for yy in range(8):
        for xx in range(16):
            rgb[yy, xx] = y_cb_cr_to_rgb(
                planes[0, yy, xx], planes[1, yy, xx], planes[2, yy, xx])

    np.savez(OUT, coeffs_zz=coeffs_zz, rgb=rgb)
    print(f"wrote {OUT}: coeffs_zz {coeffs_zz.shape}, rgb {rgb.shape}")
    print("DC per block:", coeffs_zz[:, 0].tolist())


if __name__ == "__main__":
    main()
