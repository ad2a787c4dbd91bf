"""Jitted training steps and the alternation schedule.

TPU-first restructuring of the reference's eager per-batch loops
(/root/reference/src/vgan.py:234-332 for the kernel-learning variant,
vgan.py:573-621 for the generator-only variant): a whole epoch — shuffle,
batching, per-batch noise sampling, generator/detector forward, MMD loss,
backward, Adadelta update, loss averaging — is ONE jitted function whose body
is a ``lax.scan`` over batches. No per-batch host<->device traffic, no Python
dispatch in the hot loop, static shapes throughout (drop_last batching).

Replicated training dynamics (each an explicit flag / threaded state rather
than hidden mutation):

- bandwidth frozen after the first loss evaluation
  (Mmd_loss_constrained.py:16-22) -> ``(bw_value, bw_is_set)`` in TrainState,
  ``freeze_bandwidth`` config flag;
- encoder freeze leak: the generator phase freezes ALL detector params
  (vgan.py:319-320) but the next detector phase re-enables only the decoder
  (vgan.py:266-267), so the encoder stops learning after the first generator
  phase -> ``encoder_active`` threaded bool, ``replicate_encoder_freeze``
  flag to opt out;
- frozen params take no Adadelta step, no weight decay, and no state advance
  (torch skips grad-less params) -> ``active`` masks in
  :mod:`vgan_tpu.train.adadelta`;
- 1:|iternum_d| / |iternum_g| epoch-level alternation counters
  (vgan.py:229-332) -> :class:`AlternationSchedule` (host-side, it only
  picks which jitted epoch function to call);
- the kl variant applies N(0, 0.1)/zero init (vgan.py:204-205); the no-kl
  variant trains from torch-default init (vgan.py:565-566).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from vgan_tpu.models.detector import Detector
from vgan_tpu.models.generator import GeneratorBig, latent_size_for
from vgan_tpu.models.initializers import REFERENCE_NORMAL, TORCH_DEFAULT
from vgan_tpu.ops import mmd as mmd_ops
from vgan_tpu.train.adadelta import AdadeltaState, adadelta


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training configuration (hashable -> usable as a jit static arg).

    Defaults mirror the reference constructors (vgan.py:28-48, 442-454).
    """

    ndims: int
    batch_size: int
    lr_g: float = 0.007
    lr_d: float = 0.007
    weight_decay: float = 0.04
    temperature: float = 0.0  # kl coverage-penalty weight (vgan.py:214)
    penalty_weight: float = 10.0  # no-kl coverage-penalty weight (vgan.py:571)
    iternum_d: int = 1
    iternum_g: int = 5
    # NOTE deliberately no `seed` field: the RNG key is a TRACED input to
    # every train program, and a seed here would join the static jit hash —
    # multi-seed sweeps would recompile bit-identical XLA programs per seed
    freeze_bandwidth: bool = True
    replicate_encoder_freeze: bool = True
    # Reference-exact kl-generator semantics: torch 2.x `Variable(tensor)`
    # DETACHES (vgan.py:308-309 wraps generator(noise) in Variable), so the
    # reference's kernel-learning generator receives NO gradients and never
    # trains — its "learned" kl mask distribution is the init-time geometry
    # (verified by running the reference: identical masks at 15 and 200
    # epochs). True replicates that (loss still evaluated for history /
    # bandwidth; no update); False trains the generator as the paper intends.
    replicate_generator_detach: bool = True
    elm: bool = False  # reference's private __elm flag: encoder frozen from epoch 0
    mmd_impl: str = "auto"
    # 'bfloat16' runs the Gram matmul in bf16 w/ f32 accumulation (~4x MXU
    # rate); opt-in since it perturbs the loss at bf16 resolution
    gram_matmul_dtype: "str | None" = None
    # 'bfloat16' runs the generator/detector Dense matmuls with bf16
    # operands (f32 master params and f32 pre-softmax logits); opt-in for
    # the large-d stress regime where the MLP's own matmuls matter
    # (docs/KERNELS.md roofline)
    model_matmul_dtype: "str | None" = None
    # 'bfloat16' stores the Adadelta EMAs in bf16 (math stays f32): at
    # large d the fit is optimizer-state-HBM-traffic bound; halves it
    opt_state_dtype: "str | None" = None
    init_scheme_kl: str = REFERENCE_NORMAL
    init_scheme_no_kl: str = TORCH_DEFAULT
    # Generator binarization GRADIENT estimator (round-4 VERDICT item 1 —
    # the de-confounding knob for the geometry-vs-optimization finding):
    # 'reference' = upper_softmax's mask-as-constant gradient (zero grad
    # through selected coords, Generator.py:18-22 — the parity default);
    # 'st' = identical forward, straight-through softmax gradient;
    # 'gumbel_st' = Gumbel-softmax relaxation + straight-through snap at
    # temperature `gumbel_tau` (stochastic forward during training).
    # Inference/sampling always uses the deterministic upper_softmax
    # forward regardless (generator_module(train=False)).
    generator_grad: str = "reference"
    gumbel_tau: float = 1.0
    # inner batch-scan unroll factor: amortizes the per-iteration scan
    # overhead (~10% step-throughput win at the reference config); capped by
    # the number of batches per epoch
    scan_unroll: int = 4
    # Override of the reference latent-size rule max(d//16, 1)
    # (vgan.py:196) — a capacity knob for the stress-grid study; None
    # keeps reference parity.
    latent_override: "int | None" = None

    def _unroll(self, nb: int) -> int:
        return max(1, min(self.scan_unroll, nb))

    @property
    def latent_size(self) -> int:
        if self.latent_override is not None:
            return int(self.latent_override)
        return latent_size_for(self.ndims)

    @property
    def _compute_dtype(self):
        return (
            jnp.dtype(self.model_matmul_dtype).type
            if self.model_matmul_dtype is not None
            else None
        )

    def generator_module(self, kl: bool, train: bool = False) -> GeneratorBig:
        """Generator module; ``train=True`` applies ``generator_grad``.

        Inference paths (sampling, serving, export) construct the
        deterministic upper-softmax module: params are activation-agnostic
        (Dense layers only), so a generator trained under 'st'/'gumbel_st'
        samples deterministically through the reference binarization.
        """
        activation = "upper_softmax"
        if train and self.generator_grad != "reference":
            if self.generator_grad not in ("st", "gumbel_st"):
                raise ValueError(
                    f"unknown generator_grad {self.generator_grad!r} "
                    "(expected 'reference', 'st' or 'gumbel_st')"
                )
            activation = self.generator_grad
        return GeneratorBig(
            out_features=self.ndims,
            latent_size=self.latent_size,
            init_scheme=self.init_scheme_kl if kl else self.init_scheme_no_kl,
            compute_dtype=self._compute_dtype,
            activation=activation,
            gumbel_tau=self.gumbel_tau,
        )

    def detector_module(self) -> Detector:
        return Detector(
            latent_size=self.latent_size,
            in_features=self.ndims,
            init_scheme=self.init_scheme_kl,
            compute_dtype=self._compute_dtype,
        )

    def _adadelta(self, lr: float):
        return adadelta(
            lr,
            weight_decay=self.weight_decay,
            state_dtype=self.opt_state_dtype,
        )


class NoKLTrainState(NamedTuple):
    params: Any
    opt_state: AdadeltaState
    bw_value: jax.Array
    bw_is_set: jax.Array
    key: jax.Array


class KLTrainState(NamedTuple):
    gen_params: Any
    det_params: Any
    gen_opt: AdadeltaState
    det_opt: AdadeltaState
    bw_value: jax.Array
    bw_is_set: jax.Array
    encoder_active: jax.Array
    key: jax.Array


def _l2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Reference `__distance(..., 'L2')`: mean squared difference (vgan.py:58-59)."""
    return jnp.mean((x - y) ** 2)


def _batches_from_perm(
    x: jax.Array, perm: jax.Array, batch_size: int
) -> jax.Array:
    """Drop-last batching of a ready permutation: (nb, batch_size, d).

    The single guard + reshape for BOTH the in-scan shuffle and the
    precomputed-permutation path, so their semantics cannot diverge.
    """
    n = x.shape[0]
    if n < batch_size:
        raise ValueError(
            f"dataset has {n} rows < batch_size {batch_size}: drop-last "
            "batching would train zero batches (losses would be NaN)"
        )
    nb = n // batch_size
    return x[perm[: nb * batch_size]].reshape(nb, batch_size, x.shape[-1])


def _epoch_batches(x: jax.Array, key: jax.Array, batch_size: int) -> jax.Array:
    """Shuffle + drop-last batching: (nb, batch_size, d), all on device."""
    return _batches_from_perm(
        x, jax.random.permutation(key, x.shape[0]), batch_size
    )


# Batched-permutation precompute: one vmapped sort for all epochs is ~7x
# cheaper than a per-epoch sort inside the scan (sorts are the dominant
# per-epoch overhead at small problem sizes). Capped so the (epochs, n)
# int32 buffer stays modest.
PRECOMPUTE_PERM_LIMIT = 200_000_000  # elements


def _resolve_epoch_noise(noise_src, nb, batch_size, latent, dtype):
    """Epoch noise: drawn from a PRNG key, or a pre-drawn (nb, batch_size,
    latent) array (lockstep/parity injection of an external RNG stream,
    e.g. the torch reference's)."""
    if hasattr(noise_src, "ndim") and getattr(noise_src, "ndim") == 3:
        return noise_src.astype(dtype)
    return jax.random.normal(noise_src, (nb, batch_size, latent), dtype)


def _epoch_inputs(state_key, x, batch_size: int, rng):
    """Shared epoch setup: (batches, noise_src, next_key).

    ``rng=None`` consumes one split of the carried key (shuffle + noise);
    ``rng=(perm, noise_src)`` uses the precomputed permutation and leaves
    the carried key untouched (the caller installs the chain's final key).
    Any change here MUST keep the two paths' key consumption identical to
    _epoch_rng_chain's, or precompute and fallback fits diverge.
    """
    if rng is None:
        epoch_key, next_key = jax.random.split(state_key)
        perm_key, noise_src = jax.random.split(epoch_key)
        batches = _epoch_batches(x, perm_key, batch_size)
    else:
        perm, noise_src = rng
        next_key = state_key
        batches = _batches_from_perm(x, perm, batch_size)
    return batches, noise_src, next_key


def _gumbel_keys(noise_src, nb: int) -> jax.Array:
    """Per-batch Gumbel-noise keys for ``generator_grad='gumbel_st'``.

    Derived from the epoch's noise key via a fixed fold so the z-noise
    stream itself is untouched. Incompatible with external noise-array
    injection (the lockstep parity paths are reference-gradient only).
    """
    if hasattr(noise_src, "ndim") and getattr(noise_src, "ndim") == 3:
        raise ValueError(
            "generator_grad='gumbel_st' cannot be combined with external "
            "noise-array injection (lockstep/parity paths use the "
            "reference gradient estimator)"
        )
    return jax.random.split(jax.random.fold_in(noise_src, 0x475354), nb)


def _epoch_rng_chain(key: jax.Array, epochs: int):
    """Per-epoch (perm_key, noise_key) streams with the same split structure
    the epoch bodies use, plus the final carried key."""

    def body(k, _):
        epoch_key, k_next = jax.random.split(k)
        perm_key, noise_key = jax.random.split(epoch_key)
        return k_next, (perm_key, noise_key)

    final_key, (perm_keys, noise_keys) = jax.lax.scan(
        body, key, None, length=epochs
    )
    return perm_keys, noise_keys, final_key


# ---------------------------------------------------------------------------
# no-kl variant: generator only, MMD in raw data space (vgan.py:546-624)
# ---------------------------------------------------------------------------


def init_no_kl_state(config: TrainConfig, key: jax.Array) -> NoKLTrainState:
    gen = config.generator_module(kl=False)
    k_init, k_train = jax.random.split(key)
    params = gen.init(k_init, jnp.zeros((1, config.latent_size)))
    opt = config._adadelta(config.lr_g)
    return NoKLTrainState(
        params=params,
        opt_state=opt.init(params),
        bw_value=jnp.zeros((), jnp.float32),
        bw_is_set=jnp.zeros((), bool),
        key=k_train,
    )


def _no_kl_epoch_body(
    state: NoKLTrainState, x: jax.Array, config: TrainConfig, rng=None
) -> Tuple[NoKLTrainState, jax.Array]:
    """One full no-kl epoch (shuffle -> scan of per-batch Adadelta steps).

    Loss per batch: ``MMD(batch, U*batch, U) + 10 * coverage`` (vgan.py:615-616).
    Returns ``(new_state, mean_epoch_loss)``. Traceable (no jit) so it can be
    nested inside the whole-fit program. ``rng``: optional precomputed
    ``(perm, noise_key)`` from the epoch-batched RNG path (the carried key is
    then left untouched; the caller installs the chain's final key).
    """
    gen = config.generator_module(kl=False, train=True)
    opt = config._adadelta(config.lr_g)

    batches, noise_key, next_key = _epoch_inputs(
        state.key, x, config.batch_size, rng
    )
    nb = batches.shape[0]
    noise = _resolve_epoch_noise(
        noise_key, nb, config.batch_size, config.latent_size, x.dtype
    )
    use_gumbel = config.generator_grad == "gumbel_st"
    gkeys = _gumbel_keys(noise_key, nb) if use_gumbel else None

    def batch_step(carry, inp):
        params, opt_state, bw_value, bw_is_set = carry
        if use_gumbel:
            batch, z, gk = inp
        else:
            (batch, z), gk = inp, None

        def loss_fn(p):
            u = gen.apply(p, z) if gk is None else gen.apply(p, z, gk)
            loss, bw = mmd_ops.mmd_loss_constrained_stateful(
                batch,
                u * batch,
                u,
                weight=config.penalty_weight,
                bw_value=bw_value,
                bw_is_set=bw_is_set,
                impl=config.mmd_impl,
                matmul_dtype=config.gram_matmul_dtype,
            )
            return loss, bw

        # NOTE: jax.checkpoint(loss_fn) was tried here (round 2) and
        # REGRESSED the whole-fit program 36k -> 31k steps/s: inside the
        # epoch scan XLA's fusion already avoids materializing the m^2
        # residuals, so forced recompute only adds matmul work. (It helps
        # eager-style per-step loops, where residuals do hit HBM.)
        (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u_: p + u_, params, updates)
        new_is_set = bw_is_set | bool(config.freeze_bandwidth)
        return (new_params, new_opt, bw_used, new_is_set), loss

    carry0 = (state.params, state.opt_state, state.bw_value, state.bw_is_set)
    xs = (batches, noise, gkeys) if use_gumbel else (batches, noise)
    (params, opt_state, bw_value, bw_is_set), losses = jax.lax.scan(
        batch_step, carry0, xs, unroll=config._unroll(nb)
    )
    new_state = NoKLTrainState(params, opt_state, bw_value, bw_is_set, next_key)
    return new_state, jnp.mean(losses)


no_kl_epoch = partial(jax.jit, static_argnames=("config",))(_no_kl_epoch_body)


@partial(jax.jit, static_argnames=("config", "epochs"))
def no_kl_train_epochs(
    state: NoKLTrainState, x: jax.Array, config: TrainConfig, epochs: int
) -> Tuple[NoKLTrainState, jax.Array]:
    """``epochs`` no-kl epochs from an existing state (resume-friendly)."""
    n = x.shape[0]
    if epochs * n <= PRECOMPUTE_PERM_LIMIT:
        perm_keys, noise_keys, final_key = _epoch_rng_chain(state.key, epochs)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n))(perm_keys)

        def epoch_body(st, inp):
            st, loss = _no_kl_epoch_body(st, x, config, rng=inp)
            return st, loss

        state, losses = jax.lax.scan(epoch_body, state, (perms, noise_keys))
        return state._replace(key=final_key), losses

    def epoch_body(st, _):
        st, loss = _no_kl_epoch_body(st, x, config)
        return st, loss

    return jax.lax.scan(epoch_body, state, None, length=epochs)


@partial(jax.jit, static_argnames=("config", "epochs"))
def no_kl_fit_program(
    x: jax.Array, key: jax.Array, config: TrainConfig, epochs: int
) -> Tuple[NoKLTrainState, jax.Array]:
    """The ENTIRE no-kl fit as one XLA program: init + ``epochs`` epochs.

    One dispatch, one compile; the host fetches the per-epoch loss vector
    once at the end. This is the TPU-native restructuring of the reference's
    eager fit loop (vgan.py:546-624) — no per-epoch host round-trips (which
    cost 10s-100s of ms each over a TPU tunnel).
    """
    state = init_no_kl_state(config, key)
    return no_kl_train_epochs(state, x, config, epochs)


# ---------------------------------------------------------------------------
# kl variant: adversarial generator vs encoder/decoder detector
# (vgan.py:178-332)
# ---------------------------------------------------------------------------


def init_kl_state(config: TrainConfig, key: jax.Array) -> KLTrainState:
    gen = config.generator_module(kl=True)
    det = config.detector_module()
    kg, kd, k_train = jax.random.split(key, 3)
    gen_params = gen.init(kg, jnp.zeros((1, config.latent_size)))
    det_params = det.init(kd, jnp.zeros((1, config.ndims)))
    gen_opt = config._adadelta(config.lr_g)
    det_opt = config._adadelta(config.lr_d)
    return KLTrainState(
        gen_params=gen_params,
        det_params=det_params,
        gen_opt=gen_opt.init(gen_params),
        det_opt=det_opt.init(det_params),
        bw_value=jnp.zeros((), jnp.float32),
        bw_is_set=jnp.zeros((), bool),
        encoder_active=jnp.asarray(not config.elm),
        key=k_train,
    )


def _detector_active_mask(det_params, encoder_active):
    """Per-leaf step mask: decoder always steps; encoder only while active."""

    def mask_collection(coll):
        return {
            name: jax.tree.map(
                lambda _: (encoder_active if name == "encoder" else True), sub
            )
            for name, sub in coll.items()
        }

    return {"params": mask_collection(det_params["params"])}


def _kl_detector_epoch_body(
    state: KLTrainState, x: jax.Array, config: TrainConfig, rng=None
) -> Tuple[KLTrainState, jax.Array]:
    """One detector epoch: maximize MMD minus reconstruction penalties.

    Per batch (vgan.py:253-289): U = stop_grad(G(z)); loss_D =
    ``-(MMD(enc x, enc Ux, U) - 0.1 L2(x, dec x) - 0.1 L2(Ux, dec Ux))``.
    Encoder params step only while ``encoder_active`` (see module docstring).
    """
    gen = config.generator_module(kl=True, train=True)
    det = config.detector_module()
    det_opt = config._adadelta(config.lr_d)

    batches, noise_key, next_key = _epoch_inputs(
        state.key, x, config.batch_size, rng
    )
    noise = _resolve_epoch_noise(
        noise_key, batches.shape[0], config.batch_size, config.latent_size,
        x.dtype,
    )
    use_gumbel = config.generator_grad == "gumbel_st"
    gkeys = _gumbel_keys(noise_key, batches.shape[0]) if use_gumbel else None

    encoder_active = state.encoder_active | (not config.replicate_encoder_freeze)
    if config.elm:
        # __elm freezes the encoder unconditionally (vgan.py:248-250) — it is
        # independent of the encoder-freeze-leak quirk flag
        encoder_active = jnp.zeros((), bool)

    def batch_step(carry, inp):
        det_params, det_opt_state, bw_value, bw_is_set = carry
        if use_gumbel:
            batch, z, gk = inp
        else:
            (batch, z), gk = inp, None
        u = jax.lax.stop_gradient(
            gen.apply(state.gen_params, z) if gk is None
            else gen.apply(state.gen_params, z, gk)
        )

        def loss_fn(p):
            enc_x, dec_x = det.apply(p, batch)
            enc_ux, dec_ux = det.apply(p, u * batch)
            l2_x = _l2(batch, dec_x)
            l2_ux = _l2(u * batch, dec_ux)
            mmd, bw = mmd_ops.mmd_loss_constrained_stateful(
                enc_x,
                enc_ux,
                u,
                weight=config.temperature,
                bw_value=bw_value,
                bw_is_set=bw_is_set,
                impl=config.mmd_impl,
                matmul_dtype=config.gram_matmul_dtype,
            )
            return -(mmd - 0.1 * l2_x - 0.1 * l2_ux), bw

        (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(det_params)
        active = _detector_active_mask(det_params, encoder_active)
        updates, new_opt = det_opt.update(
            grads, det_opt_state, det_params, active=active
        )
        new_params = jax.tree.map(lambda p, u_: p + u_, det_params, updates)
        new_is_set = bw_is_set | bool(config.freeze_bandwidth)
        return (new_params, new_opt, bw_used, new_is_set), loss

    carry0 = (state.det_params, state.det_opt, state.bw_value, state.bw_is_set)
    xs = (batches, noise, gkeys) if use_gumbel else (batches, noise)
    (det_params, det_opt_state, bw_value, bw_is_set), losses = jax.lax.scan(
        batch_step, carry0, xs,
        unroll=config._unroll(batches.shape[0]),
    )
    new_state = state._replace(
        det_params=det_params,
        det_opt=det_opt_state,
        bw_value=bw_value,
        bw_is_set=bw_is_set,
        key=next_key,
    )
    return new_state, jnp.mean(losses)


def _kl_generator_epoch_body(
    state: KLTrainState, x: jax.Array, config: TrainConfig, rng=None
) -> Tuple[KLTrainState, jax.Array]:
    """One generator epoch: minimize MMD in the detector's embedding.

    Per batch (vgan.py:295-329): U = G(z); detector params frozen; loss_G =
    ``MMD(enc x, enc Ux, U) + temperature * coverage``. After this epoch the
    encoder becomes inactive (reference freeze leak).

    With ``config.replicate_generator_detach`` (default, reference-exact):
    the reference wraps ``generator(noise)`` in torch's ``Variable`` which
    DETACHES in torch 2.x, so its generator receives no gradients and this
    phase only evaluates the loss (and advances the bandwidth state) —
    parameters and optimizer state are untouched. With the flag off, the
    generator trains as the paper describes.
    """
    gen = config.generator_module(kl=True, train=True)
    det = config.detector_module()
    gen_opt = config._adadelta(config.lr_g)

    batches, noise_key, next_key = _epoch_inputs(
        state.key, x, config.batch_size, rng
    )
    noise = _resolve_epoch_noise(
        noise_key, batches.shape[0], config.batch_size, config.latent_size,
        x.dtype,
    )
    use_gumbel = config.generator_grad == "gumbel_st"
    gkeys = _gumbel_keys(noise_key, batches.shape[0]) if use_gumbel else None

    def batch_step(carry, inp):
        gen_params, gen_opt_state, bw_value, bw_is_set = carry
        if use_gumbel:
            batch, z, gk = inp
        else:
            (batch, z), gk = inp, None

        def loss_fn(p):
            u = gen.apply(p, z) if gk is None else gen.apply(p, z, gk)
            enc_x, _ = det.apply(state.det_params, batch)
            enc_ux, _ = det.apply(state.det_params, u * batch)
            loss, bw = mmd_ops.mmd_loss_constrained_stateful(
                enc_x,
                enc_ux,
                u,
                weight=config.temperature,
                bw_value=bw_value,
                bw_is_set=bw_is_set,
                impl=config.mmd_impl,
                matmul_dtype=config.gram_matmul_dtype,
            )
            return loss, bw

        if config.replicate_generator_detach:
            loss, bw_used = loss_fn(gen_params)
            new_params, new_opt = gen_params, gen_opt_state
        else:
            (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                gen_params
            )
            updates, new_opt = gen_opt.update(grads, gen_opt_state, gen_params)
            new_params = jax.tree.map(lambda p, u_: p + u_, gen_params, updates)
        new_is_set = bw_is_set | bool(config.freeze_bandwidth)
        return (new_params, new_opt, bw_used, new_is_set), loss

    carry0 = (state.gen_params, state.gen_opt, state.bw_value, state.bw_is_set)
    xs = (batches, noise, gkeys) if use_gumbel else (batches, noise)
    (gen_params, gen_opt_state, bw_value, bw_is_set), losses = jax.lax.scan(
        batch_step, carry0, xs,
        unroll=config._unroll(batches.shape[0]),
    )
    new_state = state._replace(
        gen_params=gen_params,
        gen_opt=gen_opt_state,
        bw_value=bw_value,
        bw_is_set=bw_is_set,
        encoder_active=jnp.zeros((), bool),
        key=next_key,
    )
    return new_state, jnp.mean(losses)


kl_detector_epoch = partial(jax.jit, static_argnames=("config",))(
    _kl_detector_epoch_body
)
kl_generator_epoch = partial(jax.jit, static_argnames=("config",))(
    _kl_generator_epoch_body
)

PHASE_DETECTOR, PHASE_GENERATOR, PHASE_IDLE = 0, 1, 2


@partial(jax.jit, static_argnames=("config",))
def kl_train_epochs(
    state: KLTrainState, x: jax.Array, phases: jax.Array, config: TrainConfig
) -> Tuple[KLTrainState, jax.Array, jax.Array]:
    """Run the epochs described by ``phases`` from an existing state.

    ``phases`` is the precomputed epoch-phase vector (int32: 0 detector,
    1 generator, 2 idle) from :class:`AlternationSchedule` — the reference's
    host-side counters (vgan.py:229-332) become data, and the whole
    alternating adversarial schedule compiles into a single ``lax.scan`` over
    ``lax.switch``. Returns ``(final_state, detector_history,
    generator_history)`` with the reference's history semantics: each epoch
    records the *most recent* loss of each kind, NaN before the first epoch
    of that kind (vgan.py:232-233, 336-337).
    """
    nan = jnp.asarray(jnp.nan, jnp.float32)
    epochs = phases.shape[0]
    n = x.shape[0]
    precompute = epochs * n <= PRECOMPUTE_PERM_LIMIT
    if precompute:
        perm_keys, noise_keys, final_key = _epoch_rng_chain(state.key, epochs)
        perms = jax.vmap(lambda k: jax.random.permutation(k, n))(perm_keys)
        xs = (phases, (perms, noise_keys))

    def epoch_body(carry, inp):
        state, last_det, last_gen = carry
        phase, rng = inp if precompute else (inp[0], None)

        def det_branch(operand):
            state, last_det, last_gen = operand
            state, loss = _kl_detector_epoch_body(state, x, config, rng=rng)
            return state, loss.astype(jnp.float32), last_gen

        def gen_branch(operand):
            state, last_det, last_gen = operand
            state, loss = _kl_generator_epoch_body(state, x, config, rng=rng)
            return state, last_det, loss.astype(jnp.float32)

        def idle_branch(operand):
            state, last_det, last_gen = operand
            # consume the same one split a real epoch would, so the
            # fallback path's stream matches _epoch_rng_chain's
            state = state._replace(key=jax.random.split(state.key)[1])
            return state, last_det, last_gen

        state, last_det, last_gen = jax.lax.switch(
            phase, [det_branch, gen_branch, idle_branch], (state, last_det, last_gen)
        )
        return (state, last_det, last_gen), (last_det, last_gen)

    if precompute:
        (state, _, _), (det_hist, gen_hist) = jax.lax.scan(
            epoch_body, (state, nan, nan), xs
        )
        state = state._replace(key=final_key)
    else:
        (state, _, _), (det_hist, gen_hist) = jax.lax.scan(
            epoch_body, (state, nan, nan), (phases,)
        )
    return state, det_hist, gen_hist


@partial(jax.jit, static_argnames=("config",))
def kl_fit_program(
    x: jax.Array, key: jax.Array, phases: jax.Array, config: TrainConfig
) -> Tuple[KLTrainState, jax.Array, jax.Array]:
    """The ENTIRE kl fit as one XLA program: init + the phased epochs."""
    state = init_kl_state(config, key)
    return kl_train_epochs(state, x, phases, config)


class AlternationSchedule:
    """Host-side replica of the reference's epoch-phase counters.

    vgan.py:229-332: detector phases run while ``iternum_d <= config`` then
    generator phases while ``iternum_g <= config``; the generator phase's
    completion resets the detector counter. Defaults (1, 5) produce the
    1-detector/5-generator epoch cycle.
    """

    DETECTOR = "detector"
    GENERATOR = "generator"
    IDLE = "idle"

    def __init__(self, iternum_d: int, iternum_g: int):
        self.iternum_d = iternum_d
        self.iternum_g = iternum_g
        self._d = 1
        self._g = 1

    def next_phase(self) -> str:
        if self._d <= self.iternum_d:
            self._d += 1
            self._g = 1
            return self.DETECTOR
        if self._g <= self.iternum_g:
            self._g += 1
            if self._g > self.iternum_g:
                self._d = 1
            return self.GENERATOR
        return self.IDLE

    def phase_array(self, epochs: int):
        """Phase codes for ``epochs`` epochs (input to kl_fit_program)."""
        import numpy as np

        codes = {self.DETECTOR: PHASE_DETECTOR, self.GENERATOR: PHASE_GENERATOR,
                 self.IDLE: PHASE_IDLE}
        return np.asarray(
            [codes[self.next_phase()] for _ in range(epochs)], dtype=np.int32
        )

    def get_state(self):
        """Counter snapshot for checkpoint metadata."""
        return {"d": self._d, "g": self._g}

    def set_state(self, state):
        self._d = state["d"]
        self._g = state["g"]
