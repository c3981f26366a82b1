"""Burst statistics for the windowed in-kernel entropy decoder.

The windowed design (entropy/device_window.py) re-bases each lane's word
window at its own cursor every launch, so cross-lane spread is irrelevant;
the only failure mode is a PER-LANE burst: a lane consuming more than
W_chunk words within one launch's G MCUs. The launch planner provisions
G = (W_chunk - slack) / (safety * rate) with rate = the corpus max of the
per-segment average words/MCU (known exactly on host: segment bytes /
mcu_count). This probe measures, from oracle bit offsets, the worst
G-MCU-window consumption of every lane relative to that provisioned rate —
i.e. the safety factor that would have zero fallbacks on the bench corpus.

Run on CPU: PYTHONPATH= python tools/probe_window_stats.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

from jpeg_tpu.entropy.oracle import decode_coefficients_with_offsets
from jpeg_tpu.io.container import parse_jpeg
from jpeg_tpu.io.corpus import synthetic_jpeg


def lane_mcu_words(plan):
    """[S] list of per-MCU word-consumption arrays (words of 4 bytes,
    rounded up per refill granularity is 2 but use exact bits/32)."""
    _, offsets = decode_coefficients_with_offsets(plan)
    bpm = plan.blocks_per_mcu
    out = []
    bi = 0
    for seg in plan.segments:
        n = seg.mcu_count
        # bit offset at the start of each MCU within this segment
        starts = offsets[bi : bi + n * bpm : bpm].astype(np.float64)
        end_bits = (seg.byte_end - seg.byte_start) * 8
        bounds = np.concatenate([starts, [end_bits]])
        out.append(np.diff(bounds) / 32.0)  # words per MCU
        bi += n * bpm
    return out


def analyze(name, data, g_values):
    plan = parse_jpeg(data)
    lanes = lane_mcu_words(plan)
    rates = np.array([(s.byte_end - s.byte_start) / 4.0 / s.mcu_count
                      for s in plan.segments])
    print(f"{name}: S={len(lanes)} lanes, mcus/lane="
          f"{plan.segments[0].mcu_count}, rate words/MCU "
          f"min/med/max = {rates.min():.1f}/{np.median(rates):.1f}/"
          f"{rates.max():.1f}")
    for G in g_values:
        worst = 0.0
        for w in lanes:
            if len(w) < 1:
                continue
            k = min(G, len(w))
            c = np.convolve(w, np.ones(k), mode="valid")
            worst = max(worst, c.max())
        prov = rates.max() * G
        print(f"  G={G:3d}: worst {worst:7.1f} words over any lane-window; "
              f"/ (G*max_rate {prov:7.1f}) = safety needed "
              f"{worst / prov:.2f}")


for seed in range(2):
    analyze(f"4K row-restart seed{seed}",
            synthetic_jpeg(3840, 2160, restart_rows=1, seed=seed),
            [8, 16, 32, 64])
analyze("1080p", synthetic_jpeg(1920, 1080, seed=0), [8, 16, 32, 64])
