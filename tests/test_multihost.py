"""Multi-host (DCN) bring-up smoke test — VERDICT round-2 item #9.

Two REAL processes on this host, wired by parallel.mesh.initialize_multihost
(jax.distributed over TCP — the same bring-up path a real multi-host TPU pod
uses over DCN), each contributing 2 virtual CPU devices to one global 4-device
data mesh. The child runs a replicated-params / sharded-batch gradient step
shape: the per-process loss gradient must come back identical on every host
(the psum the SPMD step relies on crossed the process boundary).
"""

import os
import socket
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys
sys.path.insert(0, os.environ["CAGC_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from content_aware_gan_compression_tpu.parallel import (
    initialize_multihost, make_mesh, DATA_AXIS)

pid = int(os.environ["CAGC_PROC_ID"])
initialize_multihost(coordinator_address=os.environ["CAGC_COORD"],
                     num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 4, devs  # 2 local x 2 processes

mesh = make_mesh(devices=devs)
batch_sh = NamedSharding(mesh, P(DATA_AXIS))
rep_sh = NamedSharding(mesh, P())

# replicated params, globally-sharded batch (2 local rows per process)
w = jax.device_put(jnp.arange(8, dtype=jnp.float32).reshape(4, 2), rep_sh)
local = np.arange(8, dtype=np.float32).reshape(4, 2)[pid * 2:(pid + 1) * 2]
x = jax.make_array_from_process_local_data(batch_sh, local, (4, 2))

@jax.jit
def grad_step(w, x):
    # mean loss over the GLOBAL batch -> dL/dw needs a cross-host psum
    return jax.grad(lambda w: jnp.mean((x @ w.T) ** 2))(w)

g = grad_step(w, x)
# the gradient is replicated: this process's local shard must equal the
# FULL-batch gradient — each process only fed half the batch, so equality
# proves the psum crossed the process boundary
local_g = np.asarray(g.addressable_shards[0].data)
full = jnp.arange(8, dtype=jnp.float32).reshape(4, 2)
want = jax.grad(lambda w: jnp.mean((full @ w.T) ** 2))(
    jnp.arange(8, dtype=jnp.float32).reshape(4, 2))
np.testing.assert_allclose(local_g, np.asarray(want), rtol=1e-6)
print(f"proc {pid} OK gsum={float(local_g.sum()):.4f}")
"""


def test_two_process_dcn_gradient_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update({
            "CAGC_REPO": _REPO,
            "CAGC_PROC_ID": str(pid),
            "CAGC_COORD": f"localhost:{port}",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            # silence TPU-relay sitecustomize in the children
            "JAX_COMPILATION_CACHE_DIR": str(tmp_path),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))

    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))

    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"proc {pid} rc={rc}\n{out}\n{err[-3000:]}"
        assert f"proc {pid} OK" in out, (out, err[-2000:])
