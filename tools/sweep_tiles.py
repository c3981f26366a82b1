"""Tile-size sweep for the fused plane-decode kernel.

Runs bench_device_pipeline on a real 4K plan for one (JT_BAND_ROWS,
JT_TILE_W) configuration taken from the environment, printing one JSON
line, and verifies the decoded band checksum against the XLA compat
pipeline cropping so layout bugs can't masquerade as speedups. Run one
config per process (plane layout constants bind at import):

  for c in 128:256 256:256 256:512; do
    JT_BAND_ROWS=${c%%:*} JT_TILE_W=${c##*:} timeout 590 \
      python tools/sweep_tiles.py; done
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    from bench import bench_device_pipeline, make_4k_jpeg
    from jpeg_tpu.io.container import parse_jpeg
    from jpeg_tpu.runtime import native_decode_planes

    data = make_4k_jpeg()
    plan = parse_jpeg(data)
    planes = native_decode_planes(plan)
    fps, bps, sol = bench_device_pipeline(plan, planes)

    # Correctness probe: decoded pixels vs the library's own full decode
    # (which routes through the same kernel at these constants — so
    # compare against PIL instead for an independent anchor).
    import io

    import jpeg_tpu
    from PIL import Image

    rgb = np.asarray(jpeg_tpu.decode_bytes(data, path="fast"))
    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    mse = float(((rgb.astype(np.float64) - ref) ** 2).mean())
    psnr = 10 * np.log10(255 ** 2 / mse) if mse else 99.0
    print(json.dumps({
        "band_rows": int(os.environ.get("JT_BAND_ROWS", "128")),
        "tile_w": int(os.environ.get("JT_TILE_W", "256")),
        "fps": round(fps, 1),
        "gblocks": round(bps / 1e9, 3),
        "sol": round(sol, 4),
        "psnr_vs_libjpeg": round(psnr, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
