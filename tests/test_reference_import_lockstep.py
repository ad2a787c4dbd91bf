"""Lockstep parity against the ACTUAL reference implementation.

Unlike test_lockstep*.py (which re-express the reference math in torch
inside the test), these tests import ``/root/reference/src`` directly and
run its real fit loops on CPU, capturing the init, the batch order, and the
noise stream via subclass instrumentation — then replay the identical
trajectory through vgan_tpu's jitted epoch programs and compare losses and
masks. A shared misreading of the reference cannot pass here.

Reference obligations exercised: VGAN_no_kl.fit (vgan.py:546-624),
VGAN.fit (vgan.py:178-353), frozen first-batch bandwidth
(Mmd_loss_constrained.py:16-22), torch-default vs N(0,0.1) init, the
Variable-detach kl-generator quirk (vgan.py:308-309), drop-last shuffled
batching (vgan.py:221-226, 578-583).

torch_two_sample is stubbed (not installed; only check_if_myopic needs it).
X must be float32: the reference crashes on CPU float64 input.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

if "torch_two_sample" not in sys.modules:
    _tts = types.ModuleType("torch_two_sample")
    _tts.MMDStatistic = object
    sys.modules["torch_two_sample"] = _tts
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

ref_vgan = pytest.importorskip("src.vgan")

from vgan_tpu.models.torch_import import (  # noqa: E402
    detector_params_from_torch_state_dict,
    generator_params_from_torch_state_dict,
)
from vgan_tpu.train.adadelta import adadelta  # noqa: E402
from vgan_tpu.train.steps import (  # noqa: E402
    KLTrainState,
    NoKLTrainState,
    TrainConfig,
    kl_detector_epoch,
    kl_generator_epoch,
    no_kl_epoch,
)


def _reset_shared_rbf():
    """The reference's MMDLossConstrained has a mutable-default RBF shared
    process-wide (Mmd_loss_constrained.py:35); its cached bandwidth leaks
    across fits. Reset it so each fit sees standalone semantics."""
    defaults = ref_vgan.MMDLossConstrained.__init__.__defaults__
    for obj in defaults or ():
        if hasattr(obj, "bandwidth"):
            obj.bandwidth = None


class _Capture:
    """Shared recorder for one instrumented reference fit."""

    def __init__(self):
        self.gen_init = None
        self.det_init = None
        self.noises = []       # every generator input (bs, L)
        self.batch_inputs = []  # every detector/loss data input (bs, d)


def _instrumented_classes(cap: _Capture):
    class RecGen(ref_vgan.Generator_big):
        def forward(self, x):
            if cap.gen_init is None:
                cap.gen_init = {
                    k: v.detach().clone() for k, v in self.state_dict().items()
                }
            cap.noises.append(x.detach().clone().cpu().numpy())
            return super().forward(x)

    class RecDet(ref_vgan.Detector):
        def forward(self, x):
            if cap.det_init is None:
                cap.det_init = {
                    k: v.detach().clone() for k, v in self.state_dict().items()
                }
            cap.batch_inputs.append(x.detach().clone().cpu().numpy())
            return super().forward(x)

    class RecLoss(ref_vgan.MMDLossConstrained):
        def forward(self, X, Y, U):
            cap.batch_inputs.append(X.detach().clone().cpu().numpy())
            return super().forward(X, Y, U)

    return RecGen, RecDet, RecLoss


def _perm_from_batches(x: np.ndarray, batches) -> np.ndarray:
    """Recover the epoch's row permutation by exact row matching (the
    DataLoader only permutes; no arithmetic touches the rows)."""
    index = {row.tobytes(): i for i, row in enumerate(x)}
    perm = [index[row.tobytes()] for b in batches for row in b]
    assert len(set(perm)) == len(perm)
    return np.asarray(perm, dtype=np.int32)


def test_no_kl_import_lockstep(rng, monkeypatch):
    n, d, bs, epochs = 32, 8, 16, 3
    nb = n // bs
    x = rng.normal(size=(n, d)).astype(np.float32)

    # --- run the real reference fit, instrumented ---
    cap = _Capture()
    RecGen, _, RecLoss = _instrumented_classes(cap)
    monkeypatch.setattr(ref_vgan, "Generator_big", RecGen)
    monkeypatch.setattr(ref_vgan, "MMDLossConstrained", RecLoss)
    _reset_shared_rbf()
    ref = ref_vgan.VGAN_no_kl(batch_size=bs, epochs=epochs, lr=0.01, seed=7)
    ref.fit(x)
    ref_epoch_losses = np.asarray(ref.train_history["generator_loss"], float)
    _reset_shared_rbf()

    assert len(cap.noises) == epochs * nb
    assert len(cap.batch_inputs) == epochs * nb
    # one batch input per loss call: X (the raw batch)
    perms = [
        _perm_from_batches(x, cap.batch_inputs[e * nb : (e + 1) * nb])
        for e in range(epochs)
    ]
    noises = [
        np.stack(cap.noises[e * nb : (e + 1) * nb]) for e in range(epochs)
    ]

    # --- replay through vgan_tpu with the captured init/perm/noise ---
    config = TrainConfig(ndims=d, batch_size=bs, lr_g=0.01, mmd_impl="jnp")
    params = generator_params_from_torch_state_dict(cap.gen_init)
    opt = adadelta(config.lr_g, weight_decay=config.weight_decay)
    state = NoKLTrainState(
        params=params,
        opt_state=opt.init(params),
        bw_value=jnp.zeros((), jnp.float32),
        bw_is_set=jnp.zeros((), bool),
        key=jax.random.PRNGKey(0),
    )
    xj = jnp.asarray(x)
    ours = []
    for e in range(epochs):
        state, loss = no_kl_epoch(
            state, xj, config, rng=(jnp.asarray(perms[e]), jnp.asarray(noises[e]))
        )
        ours.append(float(loss))

    np.testing.assert_allclose(ours, ref_epoch_losses, rtol=1e-3, atol=1e-5)

    # trained generators agree: same probe noise -> same masks
    probe = rng.normal(size=(64, config.latent_size)).astype(np.float32)
    gen = config.generator_module(kl=False)
    u_ours = np.asarray(gen.apply(state.params, jnp.asarray(probe)))
    with torch.no_grad():
        u_ref = ref.generator(torch.tensor(probe)).numpy()
    np.testing.assert_allclose(u_ours, u_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(u_ours >= 1.0 / d, u_ref >= 1.0 / d)


def test_kl_import_lockstep(rng, monkeypatch):
    n, d, bs, epochs = 32, 16, 16, 6  # phases: D G G G G G
    nb = n // bs
    x = rng.normal(size=(n, d)).astype(np.float32)

    cap = _Capture()
    RecGen, RecDet, _ = _instrumented_classes(cap)
    monkeypatch.setattr(ref_vgan, "Generator_big", RecGen)
    monkeypatch.setattr(ref_vgan, "Detector", RecDet)
    _reset_shared_rbf()
    ref = ref_vgan.VGAN(batch_size=bs, epochs=epochs, seed=7)
    ref.fit(x)
    ref_det = np.asarray(ref.train_history["detector_loss"], float)
    ref_gen = np.asarray(ref.train_history["generator_loss"], float)
    _reset_shared_rbf()

    # detector sees (batch, U*batch) per batch in BOTH phases; even entries
    # are the raw batches
    raw_batches = cap.batch_inputs[0::2]
    assert len(raw_batches) == epochs * nb
    assert len(cap.noises) == epochs * nb
    perms = [
        _perm_from_batches(x, raw_batches[e * nb : (e + 1) * nb])
        for e in range(epochs)
    ]
    noises = [
        np.stack(cap.noises[e * nb : (e + 1) * nb]) for e in range(epochs)
    ]

    config = TrainConfig(ndims=d, batch_size=bs, mmd_impl="jnp")
    gen_params = generator_params_from_torch_state_dict(cap.gen_init)
    det_params = detector_params_from_torch_state_dict(cap.det_init)
    gen_opt = adadelta(config.lr_g, weight_decay=config.weight_decay)
    det_opt = adadelta(config.lr_d, weight_decay=config.weight_decay)
    state = KLTrainState(
        gen_params=gen_params,
        det_params=det_params,
        gen_opt=gen_opt.init(gen_params),
        det_opt=det_opt.init(det_params),
        bw_value=jnp.zeros((), jnp.float32),
        bw_is_set=jnp.zeros((), bool),
        encoder_active=jnp.asarray(True),
        key=jax.random.PRNGKey(0),
    )
    xj = jnp.asarray(x)
    ours_det, ours_gen = [], []
    phases = ["D"] + ["G"] * 5
    for e, phase in enumerate(phases):
        rng_e = (jnp.asarray(perms[e]), jnp.asarray(noises[e]))
        if phase == "D":
            state, loss = kl_detector_epoch(state, xj, config, rng=rng_e)
            ours_det.append(float(loss))
        else:
            state, loss = kl_generator_epoch(state, xj, config, rng=rng_e)
            ours_gen.append(float(loss))

    # reference history records the most recent loss of each kind per epoch
    np.testing.assert_allclose(
        ours_det, ref_det[: len(ours_det)], rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        ours_gen, ref_gen[len(ref_gen) - len(ours_gen):], rtol=1e-3, atol=1e-5
    )

    # the kl generator must NOT have trained (Variable detach quirk):
    # its params still equal the captured init
    init_again = generator_params_from_torch_state_dict(cap.gen_init)
    for k in state.gen_params["params"]:
        np.testing.assert_array_equal(
            np.asarray(state.gen_params["params"][k]["kernel"]),
            init_again["params"][k]["kernel"],
        )


def test_gof_matches_reference_workflow(rng):
    """test.ipynb cell 14 parity: train the ACTUAL reference VGAN_no_kl on
    the notebook's correlated-Gaussian config, run the GoF workflow on its
    generated subspaces, and reproduce the stored p-value pattern —
    p = 1.0 at bandwidth 0.01 (null regime; requires double accumulation)
    and p = 0.0 at the recommended (training-frozen) bandwidth.
    Ref: /root/reference/src/vgan.py:661-708, test.ipynb cell 14 outputs.
    """
    from sklearn.preprocessing import normalize

    from vgan_tpu.ops.mmd_test import mmd_permutation_test_sweep_precise

    np_rng = np.random.RandomState(0)
    cov = np.eye(10)
    for i, j in [(0, 8), (0, 9), (8, 9)]:
        cov[i, j] = cov[j, i] = 500
    np.fill_diagonal(cov, 1)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = np_rng.multivariate_normal([0] * 10, cov, 2000).astype(np.float32)

    _reset_shared_rbf()
    ref = ref_vgan.VGAN_no_kl(epochs=15, lr=0.001)
    ref.fit(x)
    trained_bw = float(ref.bandwidth)
    _reset_shared_rbf()
    assert trained_bw > 100  # raw-data-space bandwidth on this config

    count = 500
    x_norm = normalize(x, axis=0)
    x_s = x_norm[np_rng.choice(2000, count, replace=False)].astype(np.float32)
    u = ref.generate_subspaces(count).cpu().numpy()
    ux = u * x_s + x_s.mean(axis=0) * ~u

    _, pvals = mmd_permutation_test_sweep_precise(
        x_s, ux, [0.01, trained_bw],
        rng=np.random.default_rng(0), n_permutations=500,
    )
    assert pvals[0] == 1.0, f"expected p=1.0 at bw 0.01, got {pvals[0]}"
    assert pvals[1] == 0.0, f"expected p=0.0 at recommended bw, got {pvals[1]}"


def test_api_check_if_myopic_reproduces_notebook_pattern(rng):
    """End-to-end through OUR public API: fit VGAN_no_kl on the notebook
    config and check_if_myopic (float64 default) reproduces the cell-14
    p-value pattern (1.0 @ 0.01, 0.0 @ recommended)."""
    from vgan_tpu import VGAN_no_kl

    np_rng = np.random.RandomState(0)
    cov = np.eye(10)
    for i, j in [(0, 8), (0, 9), (8, 9)]:
        cov[i, j] = cov[j, i] = 500
    np.fill_diagonal(cov, 1)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        x = np_rng.multivariate_normal([0] * 10, cov, 2000)

    model = VGAN_no_kl(epochs=15, lr=0.001, verbose=False)
    model.fit(x)
    # pin the count-row subsample: check_if_myopic's default rng is
    # unseeded (reference parity), and the cell-14 pattern, while holding
    # for almost all draws, is not a sure event — an unseeded draw made
    # this test flake ~1/200 suite runs
    frame = model.check_if_myopic(
        x, n_permutations=500, rng=np.random.default_rng(0)
    )
    assert frame[0.01].iloc[0] == 1.0, frame
    assert frame["recommended bandwidth"].iloc[0] == 0.0, frame
