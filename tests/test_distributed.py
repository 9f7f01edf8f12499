"""Multi-process smoke test: ``parallel.init_distributed`` must bring up a
2-process jax.distributed runtime on CPU whose global mesh spans both
processes and whose collectives cross the process boundary.

The reference has no multi-node machinery at all (SURVEY §2.3); this is the
TPU-native replacement's minimal liveness check, run with two spawned
Python processes on localhost (the same wire protocol a multi-host TPU pod
uses, minus ICI).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from tangram_tpu.parallel import init_distributed

coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
init_distributed(coordinator_address=coordinator, num_processes=n_proc, process_id=pid)

assert jax.process_count() == n_proc, jax.process_count()
assert jax.device_count() == 2 * n_proc, jax.device_count()

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()), ("x",))
local = np.full(2, float(pid + 1), np.float32)  # process 0 -> 1s, 1 -> 2s
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("x")), local)
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
expect = 2.0 * sum(range(1, n_proc + 1))  # 2 devices per process
assert float(total) == expect, (float(total), expect)
print(f"proc {pid}: global reduce across {jax.device_count()} devices OK")

# --- fused sharded training across the process boundary ---------------
# every process supplies the same host arrays; jax.device_put takes each
# host's local shards of the global ("cell",) mesh, and the fused kernels'
# psums cross processes over the distributed runtime.
from tangram_tpu.models.mapper import init_logits
from tangram_tpu.ops.losses import LossWeights, MapperData
from tangram_tpu.parallel import fit_mapping_fused_sharded

expected_loss0 = float(sys.argv[4])
rng = np.random.default_rng(0)
c, s, g = 32, 24, 8
S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
d = rng.random(s).astype(np.float32)
d /= d.sum()
data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))
M0 = init_logits(c, s, 5, "numpy")
cell_mesh = Mesh(np.asarray(jax.devices()), ("cell",))
M_f, history = fit_mapping_fused_sharded(
    M0, data, LossWeights(lambda_g1=1.0, lambda_d=1.0), 5, 0.1, mesh=cell_mesh
)
jax.block_until_ready(M_f)
loss0 = float(history["total_loss"][0])
assert abs(loss0 - expected_loss0) < 1e-4, (loss0, expected_loss0)
print(f"proc {pid}: cross-process fused training OK (loss0={loss0:.6f})")
"""


def _single_process_reference_loss0():
    """Epoch-0 loss of the worker's training problem, computed in-process —
    the cross-process run must reproduce it."""
    import jax.numpy as jnp

    from tangram_tpu.models.mapper import fit_mapping, init_logits
    from tangram_tpu.ops.losses import LossWeights, MapperData

    import numpy as np

    rng = np.random.default_rng(0)
    c, s, g = 32, 24, 8
    S = (rng.poisson(2.0, (c, g)) + 0.1).astype(np.float32)
    G = (rng.poisson(3.0, (s, g)) + 0.1).astype(np.float32)
    d = rng.random(s).astype(np.float32)
    d /= d.sum()
    data = MapperData(S=jnp.asarray(S), G=jnp.asarray(G), d=jnp.asarray(d))
    M0 = init_logits(c, s, 5, "numpy")
    _, history = fit_mapping(M0, data, LossWeights(lambda_g1=1.0, lambda_d=1.0),
                             1, 0.1, impl="xla")
    return float(np.asarray(history["total_loss"])[0])


def test_two_process_cpu_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    expected_loss0 = _single_process_reference_loss0()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, "2", str(pid),
             repr(expected_loss0)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=150)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke test timed out:\n" + "\n".join(outputs))

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "global reduce" in out, out
        assert "cross-process fused training OK" in out, out
