"""Multi-host DP launcher: two REAL processes, each with 4 virtual CPU
devices, coordinate through `parallel.launch` into one 8-device global mesh;
each feeds its local half of the batch and the jitted gradient must equal the
single-process full-batch gradient on both hosts (the all-reduce rides the
cross-process collective exactly as it would ride ICI on a pod).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["SB_COORDINATOR"] = "localhost:" + port
os.environ["SB_NUM_PROCESSES"] = "2"
os.environ["SB_PROCESS_ID"] = str(pid)
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from sound_bubble_tpu.parallel.launch import (
    ShardedDataset, is_primary, maybe_initialize_distributed)
from sound_bubble_tpu.parallel import mesh as M

idx, cnt = maybe_initialize_distributed(verbose=False)
assert (idx, cnt) == (pid, 2), (idx, cnt)
assert is_primary() == (pid == 0)
mesh = M.get_mesh()
assert mesh.devices.size == 8, mesh

ds = ShardedDataset(list(range(10)))
assert len(ds) == 5 and ds[0] == pid and ds[1] == 2 + pid

X = np.arange(24, dtype=np.float32).reshape(8, 3) / 10
y = (X @ np.array([1.0, -2.0, 3.0], np.float32))[:, None]
loc = slice(pid * 4, (pid + 1) * 4)
g = M.shard_batch({"x": X[loc], "y": y[loc]}, mesh)
assert g["x"].shape == (8, 3), g["x"].shape

w0 = jax.device_put(jnp.zeros((3, 1)), M.replicated(mesh))
grad = jax.jit(jax.grad(lambda w, b: jnp.mean((b["x"] @ w - b["y"]) ** 2)))(
    w0, g)
print("GRAD " + json.dumps(np.asarray(grad).ravel().tolist()), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_grad(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(p), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for p in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so}\n{se}"

    grads = []
    for so, _ in outs:
        line = [ln for ln in so.splitlines() if ln.startswith("GRAD ")][0]
        grads.append(np.asarray(json.loads(line[5:])))

    # both hosts see the identical all-reduced gradient == full-batch numpy
    X = np.arange(24, dtype=np.float32).reshape(8, 3) / 10
    y = (X @ np.array([1.0, -2.0, 3.0], np.float32))[:, None]
    ref = (2.0 / 8.0) * X.T @ (X @ np.zeros((3, 1), np.float32) - y)
    np.testing.assert_allclose(grads[0], grads[1], atol=1e-6)
    np.testing.assert_allclose(grads[0], ref.ravel(), atol=1e-5)
