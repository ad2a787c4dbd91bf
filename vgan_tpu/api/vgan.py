"""Reference-parity estimator classes: ``VGAN`` and ``VGAN_no_kl``.

Public surface, defaults, and training dynamics mirror
/root/reference/src/vgan.py (classes at :20-431 and :434-708): ``__init__``
(same hyperparameter names/defaults), ``fit``, ``generate_subspaces``,
``approx_subspace_dist``, ``check_if_myopic``, ``model_snapshot``,
``load_models``, ``get_params``, ``get_the_networks``, ``train_history``.

Replicated quirks (all switchable via ``replicate_reference_quirks``):

- ``VGAN.__init__`` re-hardcodes ``seed = 777`` regardless of the argument
  (vgan.py:48); ``VGAN_no_kl`` honors its ``seed`` argument;
- ``generate_subspaces`` re-seeds from ``self.seed`` on EVERY call
  (vgan.py:365-366), so output is deterministic per (seed, nsubs);
- ``approx_subspace_dist(add_leftover_features=True)`` appends the
  never-selected-features mask with weight 1 *after* normalizing, then
  renormalizes (vgan.py:376-382) — the leftover mask ends at probability 0.5
  and all learned masks are halved;
- ``check_if_myopic`` passes the divisor-style "recommended bandwidth"
  directly as the multiplier-style kernel ``alpha`` (vgan.py:424-428);
- **the kl generator never trains in the reference**: torch 2.x
  ``Variable(tensor)`` detaches, and vgan.py:308-309 wraps
  ``generator(noise)`` in ``Variable`` before the generator loss — so the
  reference's generator receives no gradients and its "learned" kl mask
  distribution is the init-time geometry (verified empirically: the
  reference produces identical mask distributions after 15 and 200 epochs).
  Replicated by default; ``replicate_reference_quirks=False`` trains the
  generator as the paper intends;
- bandwidth freeze + encoder freeze: see :mod:`vgan_tpu.train.steps`.

Known reference *bugs* fixed rather than replicated (documented in
api/base.py): detector checkpoint contents, models-dir creation crash,
``momentum`` stored but never applied (we keep storing it for params.csv
parity and likewise never apply it — torch Adadelta has no momentum arg).

TPU-native behavior: ``fit`` keeps the dataset on device and runs each epoch
as one jitted ``lax.scan``; ``generate_subspaces`` is one jitted batched
forward; ``check_if_myopic`` runs its 1000-permutation bootstrap as a single
jitted matmul batch.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from vgan_tpu.api.base import EstimatorBase
from vgan_tpu.models.generator import GeneratorBig, latent_size_for
from vgan_tpu.ops.activations import binarize_mask
from vgan_tpu.ops.mmd_test import mmd_permutation_test_sweep
from vgan_tpu.train.steps import (
    AlternationSchedule,
    TrainConfig,
)


def _column_l2_normalize(x: np.ndarray) -> np.ndarray:
    """sklearn ``normalize(x, axis=0)``: each column scaled to unit L2 norm."""
    norms = np.linalg.norm(x, axis=0)
    norms = np.where(norms == 0.0, 1.0, norms)
    return x / norms


class _VGANCommon(EstimatorBase):
    """Behavior shared verbatim between the two reference classes."""

    # subclasses set: _kl (bool), batch_size, epochs, weight_decay, momentum,
    # seed, _lr_g, (kl: _lr_d, temperature, iternum_d, iternum_g)

    _kl: bool

    def _generator_module(self) -> GeneratorBig:
        return self._config.generator_module(kl=self._kl)

    # -- inference path -----------------------------------------------------

    def generate_subspaces(self, nsubs: int) -> np.ndarray:
        """Sample ``nsubs`` binary subspace masks, shape (nsubs, d), bool.

        Reference semantics (vgan.py:355-370): the RNG is re-seeded from
        ``self.seed`` on every call, so the result is deterministic per
        (seed, nsubs). One jitted batched forward; thousands of masks sample
        in a single launch (vmap-free: the generator is already batched).
        """
        if self.seed is not None:
            key = jax.random.PRNGKey(self.seed)
        else:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        z = jax.random.normal(key, (nsubs, self._latent_size), jnp.float32)
        u = self._sample_jit(self.generator_params, z)
        return np.asarray(u)

    @property
    def _sample_jit(self):
        fn = getattr(self, "_sample_jit_cache", None)
        if fn is None:
            module = self._generator_module()
            fn = jax.jit(lambda p, z: binarize_mask(module.apply(p, z), axis=-1))
            self._sample_jit_cache = fn
        return fn

    def approx_subspace_dist(self, subspace_count: int = 500, add_leftover_features: bool = False):
        """Empirical distribution over unique masks (vgan.py:372-382)."""
        u = self.generate_subspaces(subspace_count)
        unique_subspaces, proba = np.unique(u, axis=0, return_counts=True)
        if (unique_subspaces.sum(axis=0) < 1).sum() != 0 and add_leftover_features:
            unique_subspaces = np.append(
                unique_subspaces, [unique_subspaces.sum(axis=0) < 1], axis=0
            )
            proba = np.append(proba / proba.sum(), 1)
        self.subspaces = unique_subspaces
        self.proba = proba / proba.sum()

    def check_if_myopic(
        self,
        x_data: np.ndarray,
        bandwidth: Union[float, list, np.ndarray] = 0.01,
        count: int = 500,
        n_permutations: int = 1000,
        rng: Optional[np.random.Generator] = None,
        precision: str = "float64",
    ):
        """MMD goodness-of-fit test for myopicity (vgan.py:384-431).

        Column-L2-normalizes the data, samples ``count`` rows, projects each
        through a sampled mask with MEAN IMPUTATION of dropped features
        (training never imputes — parity with the reference), then runs the
        two-sample permutation MMD test at each requested bandwidth plus the
        "recommended" one. NOTE (reference semantics, flagged): bandwidths
        are passed directly as multiplier-style kernel alphas
        ``k = exp(-alpha d^2)``, including the divisor-style recommended
        bandwidth. Returns a 1x(k+1) DataFrame of p-values.

        ``precision``: 'float64' (default) runs the host-side double-
        accumulation path — REQUIRED for valid p-values near the null, where
        the statistic (~1e-7) sits below f32 Gram-sum rounding; this matches
        the reference's torch_two_sample (Cython double loop) and reproduces
        test.ipynb cell 14's p=1.0 @ 0.01 pattern. 'float32' runs the jitted
        accelerator sweep — screening-only for clearly separated samples.
        """
        import pandas as pd

        assert count <= x_data.shape[0], (
            "Selected 'count' is greater than the number of samples in the dataset"
        )
        rng = rng or np.random.default_rng()
        x_norm = _column_l2_normalize(np.asarray(x_data, dtype=np.float64))
        idx = rng.choice(x_norm.shape[0], size=count, replace=False)
        x_sample = x_norm[idx].astype(np.float32)

        u = self.generate_subspaces(count)
        col_mean = x_sample.mean(axis=0)
        ux_sample = u * x_sample + col_mean * (~u)

        if getattr(self, "bandwidth", None) is None:
            # same data-driven rule the loss uses (vgan.py:411-415), via the
            # impl-shared O(md) closed form — the dense Gram would be
            # (2*count)^2 and is never needed for the bandwidth alone
            from vgan_tpu.ops.mmd import candidate_bandwidth

            self.bandwidth = float(
                candidate_bandwidth(
                    jnp.concatenate(
                        [jnp.asarray(x_sample), jnp.asarray(ux_sample)]
                    )
                )
            )

        if isinstance(bandwidth, float):
            bandwidth = [bandwidth]
        bandwidth = [float(b) for b in np.asarray(bandwidth).ravel()]
        bandwidth.sort()

        alphas = bandwidth + [float(self.bandwidth)]
        # precision='float64' is uncapped since round 3: past ~8k samples
        # per side the precise sweep streams Kahan-compensated C planes on
        # device and reduces the final quadratic forms in f64 on host
        # (ops/pallas/gof_gram.py) instead of materializing the (2*count)^2
        # host Gram
        if precision == "float64":
            from vgan_tpu.ops.mmd_test import mmd_permutation_test_sweep_precise

            _, pvals = mmd_permutation_test_sweep_precise(
                x_sample,
                ux_sample,
                alphas=alphas,
                rng=np.random.default_rng(
                    self.seed if self.seed is not None else 0
                ),
                n_permutations=n_permutations,
                mesh=self.mesh,  # used by the streaming route past the cap
            )
        else:
            key = jax.random.PRNGKey(self.seed if self.seed is not None else 0)
            # all bandwidths (incl. recommended) in ONE compiled dispatch:
            # the d2 matrix and the permutation set are shared across the sweep
            _, pvals = mmd_permutation_test_sweep(
                x_sample,
                ux_sample,
                alphas=alphas,
                key=key,
                n_permutations=n_permutations,
                mesh=self.mesh,
            )
        results = [float(p) for p in np.asarray(pvals)]

        columns = bandwidth + ["recommended bandwidth"]
        return pd.DataFrame([results], columns=columns, index=["p-val"])

    # -- persistence --------------------------------------------------------

    def load_models(self, path_to_generator, ndims: int, device: str = None):
        """Load a trained generator for sampling (vgan.py:142-158).

        Accepts both native ``.msgpack`` checkpoints and reference torch
        ``.pt`` files (drop-in migration). Only the generator is restorable —
        parity with the reference. ``device`` is accepted for signature
        parity and ignored (JAX manages placement).
        """
        self._latent_size = latent_size_for(ndims)
        self._ndims = ndims
        self._config = self._make_config(ndims, self.batch_size)
        module = self._generator_module()
        template = module.init(
            jax.random.PRNGKey(0), jnp.zeros((1, self._latent_size))
        )
        self.generator_params = self._load_params_file(path_to_generator, template)
        self._sample_jit_cache = None
        self.generator_optimizer = (
            f"Loaded Model from {path_to_generator} with {ndims} dimensions in the latent space"
        )

    # -- checkpoint / resume (capability beyond the reference) ---------------

    def _prepare_fit_config(self, X):
        """Common fit prologue: validate the input (loud errors instead of
        the reference's cryptic downstream failures), clamp batch size
        (vgan.py:199), rebuild the train config for this dataset's width."""
        X = np.asarray(X)
        if X.ndim != 2 or 0 in X.shape:
            raise ValueError(
                "X must be a non-empty 2-D array (n_samples, n_features); "
                f"got shape {X.shape}"
            )
        if X.dtype == np.bool_:
            # one-hot / binary feature matrices are a legitimate input
            # class — cast rather than reject
            X = X.astype(np.float32)
        if not np.issubdtype(X.dtype, np.number) or np.issubdtype(
            X.dtype, np.complexfloating
        ):
            raise ValueError(
                f"X must be real-numeric; got dtype {X.dtype}"
            )
        if not np.isfinite(X).all():
            raise ValueError(
                "X contains NaN/Inf entries; the MMD Gram propagates a "
                "single non-finite value into the whole loss — clean or "
                "impute the data before fit()"
            )
        self.batch_size = min(self.batch_size, X.shape[0])
        self._ndims = X.shape[1]
        self._config = config = self._make_config(self._ndims, self.batch_size)
        self._latent_size = config.latent_size
        return X, config

    def _place_dataset(self, X):
        """Place the dataset on device: mesh-sharded (GSPMD fit) or plain."""
        if self.mesh is not None:
            from vgan_tpu.parallel.input import shard_dataset

            return shard_dataset(X.astype(np.float32), self.mesh,
                                 shard_features=self.shard_features)
        return jnp.asarray(X, dtype=jnp.float32)

    def _persist_artifacts(self, save_detector: bool):
        """Common fit epilogue: reference-layout artifacts (vgan.py:339-350
        minus its save bugs) — generator (+detector) weights and the
        model_snapshot CSV/params/plot set."""
        if self.path_to_directory is None:
            return
        path = Path(self.path_to_directory)
        models_dir = path / "models"
        run_number = self._count_runs(
            models_dir, files_per_run=2 if save_detector else 1
        )
        self._save_generator(models_dir, run_number, self.generator_params)
        if save_detector:
            self._save_detector(models_dir, run_number, self.detector_params)
        self.model_snapshot(path, run_number, show=False)

    def save_checkpoint(self, path):
        """Persist the FULL train state (params + optimizer + bandwidth +
        RNG key + schedule counters) for exact mid-training resume — the
        reference can only save final generator weights (vgan.py:339-350).
        """
        from vgan_tpu.utils.checkpoint import save_train_state

        assert getattr(self, "train_state", None) is not None, "fit first"
        # the LIVE train state is authoritative: self.bandwidth can be stale
        # here (set by a PREVIOUS fit or by check_if_myopic) while a new fit
        # froze a different value in its state — persisting the stale one
        # would poison check_if_myopic's recommended alpha after resume
        if bool(self.train_state.bw_is_set):
            bandwidth = float(self.train_state.bw_value)
        else:
            bandwidth = self.bandwidth
        meta = {
            "class": type(self).__name__,
            "ndims": self._ndims,
            "batch_size": self.batch_size,
            "train_history": {k: list(v) for k, v in self.train_history.items()},
            "bandwidth": bandwidth,
            "schedule": self._schedule.get_state() if getattr(self, "_schedule", None) else None,
        }
        save_train_state(path, self.train_state, meta)

    def restore_checkpoint(self, path):
        """Restore a checkpoint written by :meth:`save_checkpoint`."""
        import jax

        from vgan_tpu.train.steps import (
            AlternationSchedule,
            init_kl_state,
            init_no_kl_state,
        )
        from vgan_tpu.utils.checkpoint import load_meta, restore_train_state

        meta = load_meta(path)
        assert meta is not None, f"no checkpoint metadata at {path}"
        assert meta["class"] == type(self).__name__, (
            f"checkpoint is for {meta['class']}, not {type(self).__name__}"
        )
        self._ndims = meta["ndims"]
        self.batch_size = meta["batch_size"]
        self._config = self._make_config(self._ndims, self.batch_size)
        self._latent_size = self._config.latent_size
        init = init_kl_state if self._kl else init_no_kl_state
        template = init(self._config, jax.random.PRNGKey(0))
        self.train_state = restore_train_state(path, template)
        self.train_history.clear()
        for k, v in meta["train_history"].items():
            self.train_history[k].extend(v)
        self.bandwidth = meta["bandwidth"]
        if self._kl:
            self._schedule = AlternationSchedule(self.iternum_d, self.iternum_g)
            if meta.get("schedule"):
                self._schedule.set_state(meta["schedule"])
            self.generator_params = self.train_state.gen_params
            self.detector_params = self.train_state.det_params
        else:
            self.generator_params = self.train_state.params
        self._sample_jit_cache = None
        self.generator_optimizer = "Adadelta"
        return self

    def continue_fit(self, X, epochs: int):
        """Run ``epochs`` more training epochs from the current state."""
        import jax.numpy as jnp

        from vgan_tpu.train.steps import kl_train_epochs, no_kl_train_epochs

        X = np.asarray(X)
        if X.shape[0] < self._config.batch_size:
            raise ValueError(
                f"continue_fit dataset has {X.shape[0]} rows but the "
                f"checkpointed batch_size is {self._config.batch_size}; "
                "drop-last batching would train zero batches"
            )
        if self.mesh is not None:
            from vgan_tpu.parallel.input import shard_dataset

            x_dev = shard_dataset(X.astype(np.float32), self.mesh,
                                  shard_features=self.shard_features)
        else:
            x_dev = jnp.asarray(X, dtype=jnp.float32)
        if self._kl:
            phases = self._schedule.phase_array(epochs)
            state, det_hist, gen_hist = kl_train_epochs(
                self.train_state, x_dev, jnp.asarray(phases), self._config
            )
            # continue the last-seen-loss semantics across the resume point
            det_hist = np.asarray(det_hist, dtype=np.float64)
            gen_hist = np.asarray(gen_hist, dtype=np.float64)
            prev_d = self.train_history["detector_loss"]
            prev_g = self.train_history["generator_loss"]
            if prev_d:
                fix = np.isnan(det_hist)
                det_hist[fix] = prev_d[-1]
            if prev_g:
                fix = np.isnan(gen_hist)
                gen_hist[fix] = prev_g[-1]
            prev_d.extend(float(v) for v in det_hist)
            prev_g.extend(float(v) for v in gen_hist)
            self.generator_params = state.gen_params
            self.detector_params = state.det_params
        else:
            state, losses = no_kl_train_epochs(
                self.train_state, x_dev, self._config, epochs
            )
            self.train_history["generator_loss"].extend(
                float(v) for v in np.asarray(losses)
            )
            self.generator_params = state.params
        self._finalize_fit(state, None)
        return self

    # -- helpers ------------------------------------------------------------

    def _finalize_fit(self, state, x_shape):
        self.bandwidth = float(state.bw_value) if bool(state.bw_is_set) else None
        self.train_state = state
        self._sample_jit_cache = None


class VGAN(_VGANCommon):
    """Subspace-generation network WITH kernel learning (vgan.py:20-431).

    Adversarial training of a subspace generator against an encoder/decoder
    detector: the detector maximizes the (multi-bandwidth RBF) MMD between
    encodings of full and projected data minus reconstruction penalties; the
    generator minimizes the MMD in the learned embedding.
    """

    def __init__(
        self,
        batch_size: int = 500,
        temperature: float = 0,
        epochs: int = 2000,
        lr_G: float = 0.007,
        lr_D: float = 0.007,
        iternum_d: int = 1,
        iternum_g: int = 5,
        momentum: float = 0.99,
        seed: int = 777,
        weight_decay: float = 0.04,
        path_to_directory=None,
        *,
        mmd_impl: str = "auto",
        replicate_reference_quirks: bool = True,
        replicate_generator_detach: Optional[bool] = None,
        generator_grad: str = "reference",
        gumbel_tau: float = 1.0,
        latent_size: Optional[int] = None,
        elm: bool = False,
        verbose: bool = True,
        mesh=None,
        shard_features: bool = False,
        gram_matmul_dtype=None,
        model_matmul_dtype=None,
        opt_state_dtype=None,
        checkpoint_dir=None,
        checkpoint_every: int = None,
    ):
        super().__init__(path_to_directory)
        # reference parity: constructor args stashed as `storage` (vgan.py:29)
        self.storage = dict(
            batch_size=batch_size, temperature=temperature, epochs=epochs,
            lr_G=lr_G, lr_D=lr_D, iternum_d=iternum_d, iternum_g=iternum_g,
            momentum=momentum, seed=seed, weight_decay=weight_decay,
            path_to_directory=path_to_directory,
        )
        self._kl = True
        self.mesh = mesh
        self.shard_features = shard_features
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.batch_size = batch_size
        self.temperature = temperature
        self.epochs = epochs
        self.lr_G = lr_G
        self.lr_D = lr_D
        self.iternum_d = iternum_d
        self.iternum_g = iternum_g
        self.momentum = momentum  # stored, never applied (reference parity)
        self.weight_decay = weight_decay
        self.mmd_impl = mmd_impl
        self.replicate_reference_quirks = replicate_reference_quirks
        # Fine-grained override for ONE quirk: the reference's kl generator
        # never receives gradients (torch Variable() detach at vgan.py:308-310).
        # None -> follow replicate_reference_quirks; False with quirks
        # otherwise ON isolates exactly the paper-intended adversarial
        # training (the ablation docs/QUALITY.md measures).
        self.replicate_generator_detach = (
            replicate_reference_quirks
            if replicate_generator_detach is None
            else replicate_generator_detach
        )
        self.elm = elm  # reference's private __elm flag (vgan.py:45)
        # Binarization gradient estimator (extension; docs/QUALITY.md
        # ablation): 'reference' = mask-as-constant upper_softmax grads;
        # 'st' = straight-through; 'gumbel_st' = Gumbel-ST at gumbel_tau.
        # Only meaningful when the generator actually trains
        # (replicate_generator_detach=False); sampling always uses the
        # deterministic upper-softmax forward.
        self.generator_grad = generator_grad
        self.gumbel_tau = gumbel_tau
        # capacity override of the reference rule max(d//16, 1); None =
        # reference parity (vgan.py:196)
        self.latent_size = latent_size
        self.gram_matmul_dtype = gram_matmul_dtype
        self.model_matmul_dtype = model_matmul_dtype
        self.opt_state_dtype = opt_state_dtype
        self.verbose = verbose
        self.bandwidth = None
        # Reference quirk: seed is re-hardcoded to 777 (vgan.py:48).
        self.seed = 777 if replicate_reference_quirks else seed

    @property
    def _lr_g(self):
        return self.lr_G

    def _make_config(self, ndims: int, batch_size: int) -> TrainConfig:
        return TrainConfig(
            ndims=ndims,
            batch_size=batch_size,
            lr_g=self.lr_G,
            lr_d=self.lr_D,
            weight_decay=self.weight_decay,
            temperature=self.temperature,
            iternum_d=self.iternum_d,
            iternum_g=self.iternum_g,
            freeze_bandwidth=True,
            replicate_encoder_freeze=self.replicate_reference_quirks,
            replicate_generator_detach=self.replicate_generator_detach,
            elm=self.elm,
            mmd_impl=self.mmd_impl,
            gram_matmul_dtype=self.gram_matmul_dtype,
            model_matmul_dtype=self.model_matmul_dtype,
            opt_state_dtype=self.opt_state_dtype,
            generator_grad=self.generator_grad,
            gumbel_tau=self.gumbel_tau,
            latent_override=self.latent_size,
        )

    def get_the_networks(self, ndims: int, latent_size: int, device: str = None):
        """Construct (generator, detector) modules (vgan.py:160-176).

        ``device`` accepted for parity, ignored (JAX manages placement).
        """
        config = self._make_config(ndims, self.batch_size)
        return config.generator_module(kl=True), config.detector_module()

    def fit(self, X):
        """Adversarially train generator and detector on dataset X."""
        import time as _time

        t_start = _time.time()
        X, config = self._prepare_fit_config(X)
        x_dev = self._place_dataset(X)
        self._schedule = AlternationSchedule(self.iternum_d, self.iternum_g)
        # The whole fit is ONE compiled program per chunk: a single dispatch
        # and a single device->host fetch of the loss history. Without
        # checkpoint_every there is exactly one chunk. Under a mesh the same
        # program runs data-parallel (XLA inserts the ICI collectives).
        from vgan_tpu.train.steps import init_kl_state, kl_train_epochs

        state = init_kl_state(config, jax.random.PRNGKey(self.seed))
        done = 0
        last_d, last_g = float("nan"), float("nan")
        while done < self.epochs:
            chunk = min(self.checkpoint_every or self.epochs, self.epochs - done)
            phases = self._schedule.phase_array(chunk)
            state, det_hist, gen_hist = kl_train_epochs(
                state, x_dev, jnp.asarray(phases), config
            )
            det_hist = np.asarray(det_hist, dtype=np.float64)
            gen_hist = np.asarray(gen_hist, dtype=np.float64)
            # carry last-seen-loss semantics across chunk boundaries
            det_hist[np.isnan(det_hist)] = last_d
            gen_hist[np.isnan(gen_hist)] = last_g
            for i in range(chunk):
                epoch = done + i
                if self.verbose:
                    print(f"\rEpoch {epoch} of {self.epochs}")
                    print(f"Average loss in the epoch Generator: {gen_hist[i]}")
                    print(f"Average loss in the epoch Detector: {det_hist[i]}")
                self.train_history["generator_loss"].append(float(gen_hist[i]))
                self.train_history["detector_loss"].append(float(det_hist[i]))
            last_d, last_g = det_hist[-1], gen_hist[-1]
            done += chunk
            if self.checkpoint_dir is not None:
                self.train_state = state
                self.generator_params = state.gen_params
                self.detector_params = state.det_params
                self.save_checkpoint(self.checkpoint_dir)

        self.generator_optimizer = "Adadelta"
        self.detector_optimizer = "Adadelta"
        self.generator_params = state.gen_params
        self.detector_params = state.det_params
        self._finalize_fit(state, X.shape)
        self._log_metrics_jsonl(_time.time() - t_start)
        self._persist_artifacts(save_detector=True)


class VGAN_no_kl(_VGANCommon):
    """Subspace-generation network WITHOUT kernel learning (vgan.py:434-708).

    Generator-only: MMD is computed in raw data space between the batch and
    its masked projection, with coverage-penalty weight 10 (vgan.py:571).
    """

    def __init__(
        self,
        batch_size: int = 500,
        epochs: int = 2000,
        lr: float = 0.007,
        momentum: float = 0.99,
        seed: int = 777,
        weight_decay: float = 0.04,
        path_to_directory=None,
        *,
        mmd_impl: str = "auto",
        replicate_reference_quirks: bool = True,
        generator_grad: str = "reference",
        gumbel_tau: float = 1.0,
        verbose: bool = True,
        mesh=None,
        shard_features: bool = False,
        gram_matmul_dtype=None,
        model_matmul_dtype=None,
        opt_state_dtype=None,
        fit_impl: str = "scan",
        checkpoint_dir=None,
        checkpoint_every: int = None,
    ):
        super().__init__(path_to_directory)
        # reference parity: constructor args stashed as `storage` (vgan.py:443)
        self.storage = dict(
            batch_size=batch_size, epochs=epochs, lr=lr, momentum=momentum,
            seed=seed, weight_decay=weight_decay,
            path_to_directory=path_to_directory,
        )
        self._kl = False
        self.mesh = mesh
        self.shard_features = shard_features
        self.gram_matmul_dtype = gram_matmul_dtype
        self.model_matmul_dtype = model_matmul_dtype
        self.opt_state_dtype = opt_state_dtype
        self.fit_impl = fit_impl
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.batch_size = batch_size
        self.epochs = epochs
        self.lr = lr
        self.momentum = momentum
        self.seed = seed
        self.weight_decay = weight_decay
        self.mmd_impl = mmd_impl
        self.replicate_reference_quirks = replicate_reference_quirks
        self.generator_grad = generator_grad
        self.gumbel_tau = gumbel_tau
        self.verbose = verbose
        self.bandwidth = None

    @property
    def _lr_g(self):
        return self.lr

    def _fit_fused(self, X, state, config, t_start):
        """Experimental whole-fit-in-one-Pallas-kernel path (fit_impl=
        'fused'): the complete train step including backward and Adadelta
        runs inside a single kernel, the grid iterating over all steps
        (ops/pallas/fused_no_kl.py). Same per-step math as the scan path
        (locked by tests/test_fused_step.py); different RNG streams
        (in-kernel noise, rotational batching). Single-device, fresh fits
        only."""
        import time as _time

        from vgan_tpu.ops.pallas.fused_no_kl import (
            fused_no_kl_fit,
            fused_supported,
        )
        from vgan_tpu.train.steps import NoKLTrainState
        from vgan_tpu.train.adadelta import AdadeltaState

        assert self.mesh is None, "fit_impl='fused' is single-device"
        assert self.checkpoint_every is None, (
            "fit_impl='fused' runs the whole fit as one kernel launch — "
            "periodic checkpointing needs the scan path (fit_impl='scan')"
        )
        assert self.model_matmul_dtype is None and self.opt_state_dtype is None, (
            "fit_impl='fused' runs its own in-kernel f32 math and does not "
            "honor model_matmul_dtype/opt_state_dtype; use fit_impl='scan' "
            "for the bf16 options"
        )
        assert self.generator_grad == "reference", (
            "fit_impl='fused' implements the reference gradient estimator "
            "only; use fit_impl='scan' for generator_grad='st'/'gumbel_st'"
        )
        n, ndims = X.shape
        assert fused_supported(
            n, ndims, self.batch_size, config.latent_size
        ), "fused fit unsupported for this shape; use fit_impl='scan'"
        params, (sq, acc), (bw, bw_set), losses, _, _ = fused_no_kl_fit(
            X, state.params, config, self.epochs,
            jax.random.PRNGKey(self.seed),
        )
        losses = np.asarray(losses, np.float64).mean(axis=1)
        for epoch, loss in enumerate(losses):
            if self.verbose:
                print(f"\rEpoch {epoch} of {self.epochs}")
                print(f"Average loss in the epoch: {loss}")
            self.train_history["generator_loss"].append(float(loss))
        state = NoKLTrainState(
            params=params,
            opt_state=AdadeltaState(square_avg=sq, acc_delta=acc),
            bw_value=jnp.asarray(float(bw), jnp.float32),
            bw_is_set=jnp.asarray(bool(bw_set)),
            key=state.key,
        )
        self.generator_optimizer = "Adadelta"
        self.generator_params = state.params
        self._finalize_fit(state, X.shape)
        self._log_metrics_jsonl(_time.time() - t_start)
        if self.checkpoint_dir is not None:
            self.save_checkpoint(self.checkpoint_dir)
        self._persist_artifacts(save_detector=False)


    def _make_config(self, ndims: int, batch_size: int) -> TrainConfig:
        return TrainConfig(
            ndims=ndims,
            batch_size=batch_size,
            lr_g=self.lr,
            weight_decay=self.weight_decay,
            freeze_bandwidth=True,
            mmd_impl=self.mmd_impl,
            gram_matmul_dtype=self.gram_matmul_dtype,
            model_matmul_dtype=self.model_matmul_dtype,
            opt_state_dtype=self.opt_state_dtype,
            generator_grad=self.generator_grad,
            gumbel_tau=self.gumbel_tau,
        )

    def get_the_networks(self, ndims: int, latent_size: int, device: str = None):
        """Construct the generator module (vgan.py:529-544)."""
        return self._make_config(ndims, self.batch_size).generator_module(kl=False)

    def fit(self, X):
        """Train the generator on dataset X (no kernel learning)."""
        import time as _time

        t_start = _time.time()
        X, config = self._prepare_fit_config(X)

        from vgan_tpu.train.steps import init_no_kl_state, no_kl_train_epochs

        state = init_no_kl_state(config, jax.random.PRNGKey(self.seed))
        if self.fit_impl == "fused":
            # the fused kernel stages the (pre-permuted) dataset itself
            return self._fit_fused(X, state, config, t_start)
        x_dev = self._place_dataset(X)
        # The whole fit is ONE compiled program per chunk: a single dispatch
        # and a single device->host fetch of the loss history. Without
        # checkpoint_every there is exactly one chunk.
        done = 0
        while done < self.epochs:
            chunk = min(self.checkpoint_every or self.epochs, self.epochs - done)
            state, losses = no_kl_train_epochs(state, x_dev, config, chunk)
            losses = np.asarray(losses, dtype=np.float64)
            for i in range(chunk):
                epoch = done + i
                if self.verbose:
                    print(f"\rEpoch {epoch} of {self.epochs}")
                    print(f"Average loss in the epoch: {losses[i]}")
                self.train_history["generator_loss"].append(float(losses[i]))
            done += chunk
            if self.checkpoint_dir is not None:
                self.train_state = state
                self.generator_params = state.params
                self.save_checkpoint(self.checkpoint_dir)

        self.generator_optimizer = "Adadelta"
        self.generator_params = state.params
        self._finalize_fit(state, X.shape)
        self._log_metrics_jsonl(_time.time() - t_start)
        self._persist_artifacts(save_detector=False)
