"""Multi-host coordination test: 2 real processes via jax.distributed.

BASELINE configs 4-5 analogue runnable without a pod: two CPU-backend
processes form a distributed JAX runtime over localhost, each decodes its
host shard of a corpus, and metrics aggregate across processes
(jpeg_tpu.parallel.distributed). This exercises the exact
``initialize``/``aggregate_metrics``/``shard_items`` code paths a v5p
multi-host slice would use.
"""

import json
import os
import socket
import subprocess
import sys

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["JPEG_TPU_ROOT"])
import jax
jax.config.update("jax_platforms", "cpu")

from jpeg_tpu.parallel.distributed import aggregate_metrics, initialize
from jpeg_tpu.io.corpus import shard_items, synthetic_jpeg
from jpeg_tpu.models.decoder import decode_bytes

idx, count = initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert count == 2, count

items = [("img%d" % i, 48 + 16 * i) for i in range(5)]
mine = shard_items(items, idx, count)
frames = 0
for name, size in mine:
    rgb = decode_bytes(synthetic_jpeg(size, 48, seed=hash(name) % 100))
    assert rgb.shape == (48, size, 3)
    frames += 1
total = aggregate_metrics({"frames": float(frames)})
print(json.dumps({"idx": idx, "local": frames, "total": total["frames"]}))
"""


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["COORD"] = f"127.0.0.1:{port}"
    env["JPEG_TPU_ROOT"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no virtual devices in the workers
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=150)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["idx"] for o in outs} == {0, 1}
    assert sum(o["local"] for o in outs) == 5
    # Every process saw the globally aggregated count.
    assert all(o["total"] == 5.0 for o in outs)
