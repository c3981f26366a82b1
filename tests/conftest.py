"""Test config: force CPU backend with an 8-device virtual mesh.

Multi-chip sharding code paths (jpeg_tpu.parallel) are exercised on emulated
devices per SURVEY.md §4; the real-chip path is covered by bench.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon TPU-tunnel sitecustomize imports jax at interpreter start and sets
# jax_platforms to "axon,cpu" programmatically, overriding the JAX_PLATFORMS
# env var — which would silently route all "CPU" tests through the TPU tunnel
# (minutes-long remote compiles). Force the CPU backend back on. Real-TPU
# coverage is bench.py's job.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: full-pipeline tests compile several geometries;
# cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE = "/root/reference"
CORPUS = {
    "huff_simple0": f"{REFERENCE}/working-jpegs/huff_simple0.jpg",
    "lena-bw": f"{REFERENCE}/working-jpegs/lena-bw.jpeg",
    "lena": f"{REFERENCE}/lena.jpeg",
    "2x2-chroma": f"{REFERENCE}/2x2-chroma.jpeg",
}
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


@pytest.fixture(scope="session")
def corpus():
    return {k: open(v, "rb").read() for k, v in CORPUS.items()}


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
