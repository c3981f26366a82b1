"""Dump a progressive DecodePlan's per-scan arrays for the C++
microbenchmark (tools/profile_prog.cpp). Usage:
    python tools/dump_prog.py <progressive-jpeg> <out-dir>

Layout: meta.i64.bin gives global geometry; per scan i:
  scan<i>_data.u8.bin, scan<i>_bounds.i64.bin (start/end pairs),
  scan<i>_meta.i64.bin [ss, se, ah, al, n_comps, restart_interval,
                        comp_idx..., dc_id..., ac_id...],
  scan<i>_dc_luts.u16.bin / scan<i>_ac_luts.u16.bin (packed 4x65536).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpeg_tpu.io.container import parse_jpeg


def packed(tables):
    out = np.zeros((4, 65536), np.uint16)
    for i, t in enumerate(tables):
        if t is not None and hasattr(t, "lut_value"):
            out[i] = (t.lut_value.astype(np.uint16) << 8) | t.lut_length
    return out


def main():
    path, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    with open(path, "rb") as f:
        plan = parse_jpeg(f.read())
    assert plan.progressive
    comp = np.array(
        [[c.h, c.v] for c in plan.components], np.int64)
    meta = np.array(
        [plan.width, plan.height, plan.mcus_x, plan.mcus_y, plan.n_mcus,
         len(plan.components), plan.h_max, plan.v_max,
         len(plan.prog_scans)], np.int64)
    meta.tofile(os.path.join(outdir, "meta.i64.bin"))
    comp.tofile(os.path.join(outdir, "comp.i64.bin"))
    for i, sc in enumerate(plan.prog_scans):
        np.ascontiguousarray(sc.scan_data, np.uint8).tofile(
            os.path.join(outdir, f"scan{i}_data.u8.bin"))
        np.array(sc.bounds, np.int64).tofile(
            os.path.join(outdir, f"scan{i}_bounds.i64.bin"))
        sm = np.array(
            [sc.ss, sc.se, sc.ah, sc.al, len(sc.comp_indices),
             sc.restart_interval or 0]
            + list(sc.comp_indices) + list(sc.dc_ids) + list(sc.ac_ids),
            np.int64)
        sm.tofile(os.path.join(outdir, f"scan{i}_meta.i64.bin"))
        packed(sc.dc_tables).tofile(
            os.path.join(outdir, f"scan{i}_dc_luts.u16.bin"))
        packed(sc.ac_tables).tofile(
            os.path.join(outdir, f"scan{i}_ac_luts.u16.bin"))
    print(f"dumped {len(plan.prog_scans)} scans to {outdir}")


if __name__ == "__main__":
    main()
