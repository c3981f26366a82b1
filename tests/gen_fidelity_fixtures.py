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


# ---------------------------------------------------------------------------
# Full decode() transcription for the remaining reference corpus images
# (VERDICT r3 missing-item 2: lena-bw, lena, 2x2-chroma were still anchored
# to this engine's own output). This re-derives src/jpeg/decoder.rs:162-343
# — including its edge quirks, reproduced deliberately:
#   * block-count math `num_read_blocks = ceil(num_blocks / (h_max*v_max))`
#     (decoder.rs:164-192) under-reads odd-dimension 4:2:0 streams
#     (2x2-chroma: 1763 of the true 1786 MCUs);
#   * `get_indices` MCU-interleave remap (decoder.rs:259-288);
#   * `fill_block_in_array` (decoder.rs:347-379): linear-index writes wrap
#     past the row end (num_blocks_x*8 > width), and the y_scale repeat
#     writes `target[i + j*stride*8]` (a block-half copy 8 rows down, not
#     line doubling) while bounds-checking `i + j*stride`;
#   * f32 DC prediction (decoder.rs:173,207-210).
# The IDCT is vectorized with per-op f32 rounding in the reference's exact
# accumulation order (v-major, u-minor; see idct_reference) and asserted
# equal to the scalar trace on sample blocks.


def idct_reference_batch(coef_nat):
    """[B, 64] natural-order f32 -> [B, 64] spatial, bit-identical to
    :func:`idct_reference` (same per-op f32 rounding, same accumulation
    order), vectorized over blocks."""
    inv_sqrt2 = F(1.0) / np.sqrt(F(2.0), dtype=np.float32)
    pi = F(np.pi)
    alpha = np.full(8, F(1.0), np.float32)
    alpha[0] = inv_sqrt2
    # cos tables, correctly rounded to f32 like Rust cosf
    xs = np.arange(8, dtype=np.float32)
    us = np.arange(8, dtype=np.float32)
    # per-op f32: (2x+1) computed as F(2)*F(x)+F(1) then *u*pi/16
    c = np.zeros((8, 8), np.float32)  # c[x, u]
    for x in range(8):
        for u in range(8):
            arg = (F(2.0) * F(xs[x]) + F(1.0)) * F(us[u]) * pi / F(16.0)
            c[x, u] = F(np.cos(np.float64(arg)))
    aa = np.empty((8, 8), np.float32)  # alpha(u)*alpha(v), one f32 multiply
    for v in range(8):
        for u in range(8):
            aa[v, u] = alpha[u] * alpha[v]
    B = coef_nat.shape[0]
    f = coef_nat.reshape(B, 8, 8)  # [B, v, u]
    # term = ((aa * f) * c1[x,u]) * c2[y,v], each a single f32 multiply
    m2 = (aa[None] * f).astype(np.float32)  # [B, v, u]
    # m3[b, x, v, u] = m2[b, v, u] * c[x, u]
    m3 = (m2[:, None, :, :] * c[None, :, None, :]).astype(np.float32)
    # m4[b, y, x, v, u] = m3[b, x, v, u] * c[y, v]
    m4 = (m3[:, None, :, :, :] *
          c[None, :, None, :, None]).astype(np.float32)
    # sequential accumulation in (v, u) order — f32 rounding per add
    s = np.zeros((B, 8, 8), np.float32)
    for v in range(8):
        for u in range(8):
            s = (s + m4[:, :, :, v, u]).astype(np.float32)
    out = (s / F(4.0)).astype(np.float32)
    return out.reshape(B, 64)


def get_indices(x, y, max_x, _max_y, x_factor, y_factor, max_xf, max_yf):
    """decoder.rs:259-288, literal."""
    if max_yf > 1 and y_factor == 1:
        if max_xf > 1 and x_factor == 1:
            if (y & 1) == 0:  # is_upper
                if ((x // 2) & 1) == 1:  # move_down
                    return (x // 2 - 1 + (x & 1), y + 1)
                return (x // 2 + (x & 1), y)
            if y > 0 and ((x // 2) & 1) == 0:  # move_up
                return (max_x // 2 + x // 2 - 1 + (x & 1), y)
            return (max_x // 2 + x // 2 + (x & 1), y - 1)
        if (y & 1) == 0:
            return (x // 2, y + (x & 1))
        return (x // 2 + max_x // 2, y - (x & 1))
    return (x, y)


def fill_block_in_array(block, target, x_scale, y_scale, x, y, stride):
    """decoder.rs:347-379, literal (including the wrapping linear writes
    and the j*stride-checked / j*stride*8-written y repeat)."""
    start_x = x * 8 * x_scale
    for line_number in range(8):
        if stride < start_x:
            continue
        start_i = y * 8 * y_scale * stride + line_number * stride + start_x
        row = block[line_number * 8:(line_number + 1) * 8]
        for ind in range(8 * x_scale):
            n = row[ind // x_scale]
            i = ind + start_i
            for j in range(y_scale):
                if i + j * stride < len(target):
                    target[i + j * stride * 8] = n


def decode_reference(data):
    """Transcription of JPEGImage::parse + JPEGDecoder::decode for one
    baseline stream: returns (coeffs_zz int32 [n_blocks, 64] in stream
    order, rgb uint8 [h, w, 3])."""
    quant, dc_tabs, ac_tabs, frame, scan_comps, entropy = parse(data)
    w, h, comps = frame
    dc = {i: build_table(*t) for i, t in dc_tabs.items()}
    ac = {i: build_table(*t) for i, t in ac_tabs.items()}
    comp_tt = {cid: (dc_id, ac_id) for cid, dc_id, ac_id in scan_comps}

    num_blocks_x = (w + 7) // 8
    num_blocks_y = (h + 7) // 8
    num_blocks = num_blocks_x * num_blocks_y
    max_h = max(ch for _, ch, _, _ in comps)
    max_v = max(cv for _, _, cv, _ in comps)
    skip_factor = max_h * max_v
    num_read_blocks = (num_blocks + skip_factor - 1) // skip_factor

    reader = BitReader(entropy)
    blocks = [[] for _ in comps]
    prev_dc = [F(0.0)] * len(comps)  # f32 prediction, decoder.rs:173
    stream = []
    for _ in range(num_read_blocks):
        for ci, (cid, ch, cv, _tq) in enumerate(comps):
            dc_id, ac_id = comp_tt[cid]
            for _ in range(ch * cv):
                blk = next_block(reader, dc[dc_id], ac[ac_id])
                fblk = np.array(blk, np.float32)
                fblk[0] = F(fblk[0]) + prev_dc[ci]
                prev_dc[ci] = F(fblk[0])
                blocks[ci].append(fblk)
                stream.append(fblk.astype(np.int32))
    coeffs_zz = np.array(stream, np.int32)

    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        q = np.array(quant[tq], np.float32)
        zz = np.stack(blocks[ci])  # [B, 64] zigzag f32
        deq = (zz * q[None, :]).astype(np.float32)
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG_INDICES] = deq
        spatial = idct_reference_batch(nat)
        # spot-check the vectorized IDCT vs the scalar trace
        for b in (0, len(spatial) - 1):
            np.testing.assert_array_equal(spatial[b],
                                          idct_reference(nat[b]))
        x_i = np.ceil(F(w) * (F(ch) / F(max_h)))
        y_i = np.ceil(F(h) * (F(cv) / F(max_v)))
        x_factor = int(np.ceil(F(w) / F(x_i)))
        y_factor = int(np.ceil(F(h) / F(y_i)))
        target = np.zeros(w * h, np.float32)
        block_i = 0
        for y in range(num_blocks_y // y_factor):
            for x in range(num_blocks_x // x_factor):
                xi, yi = get_indices(x, y, num_blocks_x, num_blocks_y,
                                     x_factor, y_factor, max_h, max_v)
                fill_block_in_array(spatial[block_i], target, x_factor,
                                    y_factor, xi, yi, w)
                block_i += 1
        planes.append(target)

    rgb = np.zeros((h, w, 3), np.uint8)
    if len(comps) == 1:
        for yy in range(h):
            for xx in range(w):
                u = f32_to_u8(planes[0][yy * w + xx] + F(128.0))
                rgb[yy, xx] = (u, u, u)
    else:
        for yy in range(h):
            for xx in range(w):
                i = yy * w + xx
                rgb[yy, xx] = y_cb_cr_to_rgb(planes[0][i], planes[1][i],
                                             planes[2][i])
    return coeffs_zz, rgb


CORPUS = {
    "lena-bw": "/root/reference/working-jpegs/lena-bw.jpeg",
    "lena": "/root/reference/lena.jpeg",
    "2x2-chroma": "/root/reference/2x2-chroma.jpeg",
}


def gen_corpus_fixtures():
    for name, path in CORPUS.items():
        with open(path, "rb") as f:
            data = f.read()
        coeffs_zz, rgb = decode_reference(data)
        out = os.path.join(HERE, "goldens", f"{name}_fidelity.npz")
        np.savez_compressed(out, coeffs_zz=coeffs_zz, rgb=rgb)
        print(f"wrote {out}: coeffs_zz {coeffs_zz.shape}, rgb {rgb.shape}")


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
    import sys

    if "--corpus" in sys.argv:
        gen_corpus_fixtures()
    else:
        main()
