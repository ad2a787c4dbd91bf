"""Worker for the two-process ``jax.distributed`` CPU smoke test.

Spawned (twice) by tests/test_distributed.py. Each process owns 2 virtual
CPU devices, connects to the coordinator, loads only ITS row range of a
known global dataset, and exercises parallel/input.py's multi-host
``make_array_from_process_local_data`` branch — first confirming that a
RAGGED global split raises the documented shard-shape ValueError, then
assembling an even split with the explicit ``n_total`` global shape and
running a tiny data-parallel no-kl fit over the 4-device global mesh.

Usage: python tests/_distributed_worker.py <process_id> <coordinator_port>
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

process_id = int(sys.argv[1])
port = sys.argv[2]

# must precede any jax import/initialization
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

# NOTE: the env var JAX_PLATFORMS=cpu is not honored when the axon TPU
# plugin is installed (same finding as tests/conftest.py) — only the
# config update reliably pins the CPU backend.
jax.config.update("jax_platforms", "cpu")
# CPU cross-process collectives need an explicit implementation; without
# it the client comes up single-process (process_count() == 1)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=process_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from vgan_tpu.parallel.input import process_row_range, shard_dataset  # noqa: E402
from vgan_tpu.train.steps import TrainConfig  # noqa: E402
from vgan_tpu.parallel.dp import no_kl_fit_program_dp  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes
mesh = Mesh(np.asarray(jax.devices()), ("data",))

# ---- ragged split is rejected, as documented ------------------------------
# NamedSharding requires the global row count to divide evenly by the
# 'data'-axis device count; loaders must pad/drop to a device multiple
# upstream (parallel/input.py docs). Executed here, not just claimed:
mesh_probe = Mesh(np.asarray(jax.devices()), ("data",))
try:
    with mesh_probe:
        ragged_local = np.zeros(
            (52 if process_id == 0 else 51, 6), np.float32
        )
        shard_dataset(ragged_local, mesh_probe, n_total=103)
    raise SystemExit("ragged split unexpectedly succeeded")
except ValueError as e:
    assert "evenly divide" in str(e) or "partitioned" in str(e), e
    print(f"[p{process_id}] ragged split rejected as documented", flush=True)

# ---- multi-host assembly (explicit n_total global shape) ------------------
N, D = 104, 6  # 104 rows: 52 per process, 26 per device
start, end = process_row_range(N)
full = np.arange(N * D, dtype=np.float32).reshape(N, D)
x_local = full[start:end]
with mesh:
    x_global = shard_dataset(x_local, mesh, n_total=N)
assert x_global.shape == (N, D), x_global.shape
total = float(jax.jit(jnp.sum)(x_global))
expected = float(full.sum())
assert abs(total - expected) < 1e-3 * abs(expected), (total, expected)
print(f"[p{process_id}] global sum OK: {total}", flush=True)

# ---- tiny dp fit over the global mesh -------------------------------------
rng = np.random.default_rng(7)
x_fit_full = rng.normal(size=(N, D)).astype(np.float32)
s2, e2 = process_row_range(N)
config = TrainConfig(ndims=D, batch_size=32, lr_g=0.01)
with mesh:
    x_fit = shard_dataset(x_fit_full[s2:e2], mesh, n_total=N)
    state, losses = no_kl_fit_program_dp(
        x_fit, jax.random.PRNGKey(0), config, epochs=2, mesh=mesh
    )
losses = np.asarray(losses)
assert losses.shape == (2,) and np.all(np.isfinite(losses)), losses
print(f"[p{process_id}] dp fit OK: losses={losses.tolist()}", flush=True)
print(f"[p{process_id}] DISTRIBUTED-SMOKE-OK", flush=True)
