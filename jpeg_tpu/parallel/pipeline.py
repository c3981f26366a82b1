"""Pipelined corpus decode: host entropy workers feeding the TPU.

Production shape of the engine (BASELINE.json config 4: "batched 1080p corpus
decode with restart-interval parallel Huffman on 1 host"): the bit-serial
entropy work runs on all host cores (ctypes releases the GIL, so a thread
pool scales), while the dense coefficient->pixel stage runs on the chip; the
two stages overlap, so steady-state throughput is min(host rate, device
rate), not their sum.

Per-image error isolation per SURVEY.md §5: a malformed image yields an error
record, never kills the batch.
"""

from __future__ import annotations

import dataclasses
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


@dataclasses.dataclass
class DecodeResult:
    path: str
    rgb: np.ndarray | None
    error: str | None = None

    @property
    def ok(self) -> bool:
        return self.error is None


class CorpusDecoder:
    """Thread-pooled decode of many JPEGs.

    ``path="fast"`` uses the plane-layout Pallas pipeline (TPU), ``"compat"``
    the bit-exact XLA pipeline. Geometry-keyed jit caches mean a homogeneous
    corpus compiles once.
    """

    def __init__(self, workers: int | None = None, path: str = "compat",
                 rounding: str = "truncate"):
        self.workers = workers or os.cpu_count() or 1
        self.path = path
        self.rounding = rounding

    def _decode_one(self, path_or_bytes) -> DecodeResult:
        name = path_or_bytes if isinstance(path_or_bytes, str) else "<bytes>"
        try:
            if isinstance(path_or_bytes, str):
                with open(path_or_bytes, "rb") as f:
                    data = f.read()
            else:
                data = path_or_bytes
            from jpeg_tpu.io.container import parse_jpeg
            from jpeg_tpu.models.decoder import decode_plan, decode_plan_fast

            plan = parse_jpeg(data)
            if self.path == "fast":
                rgb = decode_plan_fast(plan, rounding=self.rounding)
            else:
                rgb = decode_plan(plan, rounding=self.rounding)
            return DecodeResult(name, np.asarray(rgb))
        except Exception as e:  # noqa: BLE001 — isolation boundary
            return DecodeResult(name, None, error=f"{type(e).__name__}: {e}")

    def decode_all(self, items) -> list[DecodeResult]:
        """Decode a list of paths (or bytes); order preserved."""
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            return list(ex.map(self._decode_one, items))

    def decode_iter(self, items):
        """Generator variant for streaming consumption."""
        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            yield from ex.map(self._decode_one, items)
