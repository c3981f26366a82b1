"""Dump a DecodePlan's scan arrays to flat .bin files for the C++
microbenchmark (tools/profile_entropy.cpp). Usage:
    python tools/dump_scan.py <jpeg-file> <out-dir>
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.runtime import plane_shapes


def main():
    path, outdir = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)
    with open(path, "rb") as f:
        plan = parse_jpeg(f.read())
    slots = plan.component_block_slots()
    arrays = {
        "data.u8": np.ascontiguousarray(plan.scan_data, np.uint8),
        "seg_start.i64": np.array([s.byte_start for s in plan.segments], np.int64),
        "seg_end.i64": np.array([s.byte_end for s in plan.segments], np.int64),
        "seg_mcu_start.i64": np.array([s.mcu_start for s in plan.segments], np.int64),
        "seg_mcu_count.i64": np.array([s.mcu_count for s in plan.segments], np.int64),
        "slot_comp.u8": np.array([ci for ci, _ in slots], np.uint8),
        "slot_vi.u8": np.array([sub // plan.components[ci].h for ci, sub in slots], np.uint8),
        "slot_hi.u8": np.array([sub % plan.components[ci].h for ci, sub in slots], np.uint8),
        "comp_dc.u8": np.array([c.dc_id for c in plan.components], np.uint8),
        "comp_ac.u8": np.array([c.ac_id for c in plan.components], np.uint8),
        "comp_h.u8": np.array([c.h for c in plan.components], np.uint8),
        "comp_v.u8": np.array([c.v for c in plan.components], np.uint8),
    }
    if getattr(plan, "arith_code", False):
        arrays["dc_L.u8"] = np.array(plan.arith_dc_L, np.uint8)
        arrays["dc_U.u8"] = np.array(plan.arith_dc_U, np.uint8)
        arrays["ac_K.u8"] = np.array(plan.arith_ac_K, np.uint8)
    else:
        arrays["dc_luts.u16"] = np.ascontiguousarray(np.stack(
            [(t.lut_value.astype(np.uint16) << 8) | t.lut_length
             for t in plan.dc_tables]))
        arrays["ac_luts.u16"] = np.ascontiguousarray(np.stack(
            [(t.lut_value.astype(np.uint16) << 8) | t.lut_length
             for t in plan.ac_tables]))
    shapes = plane_shapes(plan)
    meta = np.array(
        [plan.blocks_per_mcu, len(plan.components), plan.mcus_x, plan.n_mcus,
         len(plan.segments)] +
        [v for s in shapes for v in s], np.int64)
    arrays["meta.i64"] = meta
    for name, arr in arrays.items():
        arr.tofile(os.path.join(outdir, name + ".bin"))
    print(f"dumped {len(arrays)} arrays to {outdir}; "
          f"{len(plan.segments)} segs, {plan.n_mcus} mcus, shapes {shapes}")


if __name__ == "__main__":
    main()
