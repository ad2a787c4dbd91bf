"""Hermetic multi-chip dry run on virtual CPU devices.

Validates the framework's real parallel axes (SURVEY.md section 2b) by
jitting the FULL training step over an ``n_devices`` mesh and executing one
step (plus a 2-epoch whole-fit) on tiny shapes:

- dp: batch rows sharded over 'data' (GSPMD whole-fit program);
- tp analogue: the feature axis sharded over 'model' (partial squared
  distances psum over feature shards);
- sp analogue: the explicit ring-ppermute row-sharded MMD train step via
  shard_map (kernel-method ring attention);
- ensemble axis: mask-sharded subspace-ensemble scoring over 'data'.

PP/EP are deliberate non-goals (4-layer KB-scale MLPs, no MoE) — SURVEY.md
section 2b. The reference itself is single-device
(/root/reference/src/vgan.py:46-47); this check is the new framework's
multi-chip verification contract.

HERMETICITY CONTRACT: this module must never initialize the TPU backend.
It is designed to run as ``python -m vgan_tpu._dryrun N`` in a fresh
process; the first thing it does is pin the CPU platform via
``jax.config.update("jax_platforms", "cpu")`` — the env var JAX_PLATFORMS
alone is NOT honored when an ambient TPU plugin (axon) is installed.
"""

from __future__ import annotations

import os
import sys


def _pin_cpu(n_devices: int) -> None:
    """Pin the CPU platform and request n virtual devices.

    Must run before ANY jax backend use in this process. Both knobs are
    belt-and-braces: the XLA_FLAGS env var only works pre-initialization,
    and jax_platforms=cpu is the only override an ambient TPU platform
    plugin respects.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")


def run(n_devices: int) -> None:
    _pin_cpu(n_devices)

    import jax

    assert jax.default_backend() == "cpu", (
        f"dryrun must be CPU-only, got backend={jax.default_backend()!r}"
    )
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} CPU devices, have {len(devices)} "
        "(XLA_FLAGS host-device-count not applied: jax initialized early?)"
    )

    import numpy as np
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import NamedSharding, PartitionSpec

    from vgan_tpu.parallel.dp import kl_fit_program_dp
    from vgan_tpu.parallel.mesh import make_mesh
    from vgan_tpu.parallel.ring import mmd_loss_ring_rowsharded
    from vgan_tpu.train.steps import (
        AlternationSchedule,
        TrainConfig,
        init_no_kl_state,
    )
    from vgan_tpu.train.adadelta import adadelta

    model = 2 if n_devices >= 4 and n_devices % 2 == 0 else 1
    data = n_devices // model
    mesh = make_mesh(data=data, model=model, devices=devices[:n_devices])

    # --- dp (+ feature sharding on 'model'): full kl fit, 2 epochs (D + G) ---
    rng = np.random.default_rng(0)
    n, d = 8 * data, 32
    x = rng.normal(size=(n, d)).astype(np.float32)
    # gumbel_st exercises the round-5 straight-through binarization path
    # (gradients THROUGH the mask snap) under the sharded whole-fit program
    config = TrainConfig(ndims=d, batch_size=n // data, mmd_impl="jnp",
                         generator_grad="gumbel_st")
    phases = AlternationSchedule(1, 5).phase_array(2)
    state, det_hist, gen_hist = kl_fit_program_dp(
        x,
        jax.random.PRNGKey(0),
        phases,
        config,
        mesh,
        shard_features=(model > 1),
    )
    assert np.isfinite(np.asarray(det_hist)[0])
    assert np.isfinite(np.asarray(gen_hist)[-1])

    # --- sp: explicit ring-sharded no-kl train step via shard_map ---
    ring_mesh = make_mesh(data=n_devices, model=1, devices=devices[:n_devices])
    config_r = TrainConfig(ndims=d, batch_size=n_devices * 4, mmd_impl="jnp")
    gen = config_r.generator_module(kl=False)
    opt = adadelta(config_r.lr_g, weight_decay=config_r.weight_decay)
    st = init_no_kl_state(config_r, jax.random.PRNGKey(1))
    repl = NamedSharding(ring_mesh, PartitionSpec())
    st = jax.device_put(st, repl)
    batch = jax.device_put(
        rng.normal(size=(config_r.batch_size, d)).astype(np.float32),
        NamedSharding(ring_mesh, PartitionSpec("data", None)),
    )

    def ring_step(params, opt_state, batch_loc, key):
        idx = lax.axis_index("data")
        z = jax.random.normal(
            jax.random.fold_in(key, idx),
            (batch_loc.shape[0], config_r.latent_size),
        )

        def loss_fn(p):
            u = gen.apply(p, z)
            loss, bw = mmd_loss_ring_rowsharded(
                batch_loc, u * batch_loc, u,
                config_r.penalty_weight,
                jnp.zeros(()), jnp.asarray(False), "data",
            )
            return loss, bw

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = lax.psum(grads, "data")
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u_: p + u_, params, updates)
        return new_params, new_opt, loss

    step = jax.jit(
        shard_map(
            ring_step,
            mesh=ring_mesh,
            in_specs=(
                PartitionSpec(),
                PartitionSpec(),
                PartitionSpec("data", None),
                PartitionSpec(),
            ),
            out_specs=(PartitionSpec(), PartitionSpec(), PartitionSpec()),
            # outputs are replicated via psum/all_gather; the conservative
            # varying-manual-axes inference can't prove it
            check_vma=False,
        )
    )
    params, opt_state, loss = step(
        st.params, st.opt_state, batch,
        jax.device_put(jax.random.PRNGKey(2), repl),
    )
    assert np.isfinite(float(np.asarray(loss)))

    # --- ensemble axis: mask-sharded subspace scoring over the mesh ---
    from vgan_tpu.ensemble.od import SubspaceEnsemble

    masks = (rng.random(size=(n_devices * 2, d)) < 0.5) | (
        np.eye(d, dtype=bool)[:1]
    )
    ens = SubspaceEnsemble(
        masks,
        np.full((masks.shape[0],), 1.0 / masks.shape[0], np.float32),
        base="knn",
        k=4,
        chunk=2,
        mesh=ring_mesh,
    )
    x_tr = rng.normal(size=(64, d)).astype(np.float32)
    x_te = rng.normal(size=(16, d)).astype(np.float32)
    scores = ens.fit(x_tr).decision_function(x_te)
    assert np.all(np.isfinite(np.asarray(scores)))

    # --- GoF axis: permutation-sharded streaming two-sample test ---
    from vgan_tpu.ops.pallas.gof_gram import mmd_permutation_test_tiled

    gx = rng.normal(size=(24, 5)).astype(np.float32)
    gy = (rng.normal(size=(24, 5)) + 1.0).astype(np.float32)
    stat, pval = mmd_permutation_test_tiled(
        gx, gy, [0.5], jax.random.PRNGKey(3),
        n_permutations=2 * n_devices - 1, mesh=ring_mesh,
    )
    assert np.isfinite(float(stat)) and 0.0 <= float(pval) <= 1.0

    print(
        f"dryrun_multichip OK: mesh=({data}x{model}) dp+tp kl fit, "
        f"{n_devices}-way ring-MMD step, mask-sharded ensemble, "
        "permutation-sharded GoF executed"
    )


def main() -> None:
    n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    run(n_devices)


if __name__ == "__main__":
    main()
