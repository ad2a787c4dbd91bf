"""MMD loss parity: jnp implementation vs a PyTorch oracle of the documented
reference math (multi-bandwidth RBF V-statistic + coverage penalty,
Mmd_loss_constrained.py), including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vgan_tpu.ops.mmd import (
    bandwidth_multipliers,
    coverage_penalty,
    mmd2_biased,
    mmd_loss_constrained,
    pairwise_sq_dists,
    reference_bandwidth,
)


def torch_mmd_constrained(x, y, u, weight, bandwidth=None):
    """Oracle re-expressing Mmd_loss_constrained.py:24-50 semantics."""
    z = torch.vstack([x, y])
    d2 = torch.cdist(z, z) ** 2
    n = d2.shape[0]
    if bandwidth is None:
        bandwidth = d2.detach().sum() / (n**2 - n)
    mults = torch.tensor([0.25, 0.5, 1.0, 2.0, 4.0], dtype=d2.dtype)
    k = torch.exp(-d2[None] / (bandwidth * mults)[:, None, None]).sum(0)
    ns = x.shape[0]
    mmd2 = k[:ns, :ns].mean() - 2 * k[:ns, ns:].mean() + k[ns:, ns:].mean()
    penalty = torch.mean(torch.ones(u.shape[1]) - torch.topk(u, 1, 0).values)
    return mmd2 + weight * penalty, bandwidth


def test_bandwidth_multipliers():
    assert bandwidth_multipliers() == (0.25, 0.5, 1.0, 2.0, 4.0)
    assert bandwidth_multipliers(3, 3.0) == (1 / 3, 1.0, 3.0)


def test_pairwise_sq_dists_matches_naive(rng):
    x = rng.normal(size=(17, 5)).astype(np.float64)
    ours = np.asarray(pairwise_sq_dists(jnp.asarray(x)))
    naive = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(ours, naive, rtol=1e-9, atol=1e-9)


def test_pairwise_sq_dists_cross(rng):
    x = rng.normal(size=(6, 4))
    y = rng.normal(size=(9, 4))
    ours = np.asarray(pairwise_sq_dists(jnp.asarray(x), jnp.asarray(y)))
    naive = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(ours, naive, rtol=1e-6, atol=1e-6)


def test_reference_bandwidth_rule(rng):
    x = rng.normal(size=(10, 3))
    d2 = pairwise_sq_dists(jnp.asarray(x))
    bw = float(reference_bandwidth(d2))
    # zero diagonal included in the numerator; m^2 - m denominator
    expected = float(np.asarray(d2).sum() / (10 * 10 - 10))
    np.testing.assert_allclose(bw, expected, rtol=1e-6)


def test_mmd_loss_matches_torch_oracle(rng):
    x = rng.normal(size=(20, 6))
    y = rng.normal(size=(20, 6)) + 0.5
    u = rng.uniform(size=(20, 6))

    loss, bw = mmd_loss_constrained(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(u), weight=10.0, impl="jnp"
    )
    t_loss, t_bw = torch_mmd_constrained(
        torch.tensor(x), torch.tensor(y), torch.tensor(u), 10.0
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-9)
    np.testing.assert_allclose(float(bw), float(t_bw), rtol=1e-9)


def test_mmd_loss_frozen_bandwidth(rng):
    x = rng.normal(size=(12, 4))
    y = rng.normal(size=(12, 4))
    u = rng.uniform(size=(12, 4))
    frozen = jnp.asarray(3.21, dtype=jnp.float64)
    loss, bw = mmd_loss_constrained(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(u), 0.0, bandwidth=frozen
    )
    assert float(bw) == float(frozen)
    t_loss, _ = torch_mmd_constrained(
        torch.tensor(x), torch.tensor(y), torch.tensor(u), 0.0,
        bandwidth=torch.tensor(3.21, dtype=torch.float64),
    )
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=1e-5)


def test_mmd_gradient_matches_torch(rng):
    x = rng.normal(size=(8, 5))
    y = rng.normal(size=(8, 5)) + 0.3
    u = rng.uniform(size=(8, 5))

    def f(yy, uu):
        loss, _ = mmd_loss_constrained(jnp.asarray(x), yy, uu, 2.0, impl="jnp")
        return loss

    gy, gu = jax.grad(f, argnums=(0, 1))(jnp.asarray(y), jnp.asarray(u))

    yt = torch.tensor(y, requires_grad=True)
    ut = torch.tensor(u, requires_grad=True)
    t_loss, _ = torch_mmd_constrained(torch.tensor(x), yt, ut, 2.0)
    t_loss.backward()
    np.testing.assert_allclose(np.asarray(gy), yt.grad.numpy(), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gu), ut.grad.numpy(), rtol=1e-8, atol=1e-10)


def test_no_gradient_through_bandwidth(rng):
    # Reference detaches the bandwidth (`.data`); grad wrt inputs must not
    # include a bandwidth term. Compare grad with auto-bandwidth vs the same
    # bandwidth passed as a frozen constant.
    x = rng.normal(size=(6, 3)).astype(np.float32)
    y = rng.normal(size=(6, 3)).astype(np.float32)
    u = rng.uniform(size=(6, 3)).astype(np.float32)

    _, bw = mmd2_biased(jnp.asarray(x), jnp.asarray(y))

    g_auto = jax.grad(lambda yy: mmd2_biased(jnp.asarray(x), yy)[0])(jnp.asarray(y))
    g_frozen = jax.grad(lambda yy: mmd2_biased(jnp.asarray(x), yy, bandwidth=bw)[0])(
        jnp.asarray(y)
    )
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_frozen), rtol=1e-6)


def test_coverage_penalty(rng):
    u = rng.uniform(size=(7, 9)).astype(np.float32)
    ours = float(coverage_penalty(jnp.asarray(u)))
    expected = float(np.mean(1.0 - u.max(axis=0)))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_bf16_matmul_option_close_to_f32(rng):
    x = rng.normal(size=(40, 32)).astype(np.float32)
    y = (rng.normal(size=(40, 32)) + 0.3).astype(np.float32)
    u = rng.uniform(size=(40, 32)).astype(np.float32)
    bw = jnp.asarray(5.0, jnp.float32)
    from vgan_tpu.ops.mmd import mmd_loss_constrained_stateful

    f32, _ = mmd_loss_constrained_stateful(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(u), 1.0, bw, jnp.asarray(True)
    )
    bf16, _ = mmd_loss_constrained_stateful(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(u), 1.0, bw, jnp.asarray(True),
        matmul_dtype="bfloat16",
    )
    np.testing.assert_allclose(float(bf16), float(f32), rtol=5e-2)


def test_chunked_matches_jnp_values_and_grads(rng):
    """Row-blocked remat path == full-matrix path (values and gradients),
    including non-multiple-of-block sizes."""
    from vgan_tpu.ops.mmd import mmd2_biased_chunked, mmd2_biased_stateful

    x = jnp.asarray(rng.normal(size=(37, 6)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(29, 6)).astype(np.float32) + 0.4)
    bw0 = jnp.zeros((), jnp.float32)
    unset = jnp.asarray(False)

    ref, bw_ref = mmd2_biased_stateful(x, y, bw0, unset)
    chk, bw_chk = mmd2_biased_chunked(x, y, bw0, unset, row_block=16)
    np.testing.assert_allclose(float(chk), float(ref), rtol=2e-4)
    np.testing.assert_allclose(float(bw_chk), float(bw_ref), rtol=1e-3)

    bw = jnp.asarray(3.0, jnp.float32)
    g_ref = jax.grad(
        lambda y_: mmd2_biased_stateful(x, y_, bw, jnp.asarray(True))[0]
    )(y)
    g_chk = jax.grad(
        lambda y_: mmd2_biased_chunked(x, y_, bw, jnp.asarray(True), row_block=16)[0]
    )(y)
    np.testing.assert_allclose(np.asarray(g_chk), np.asarray(g_ref), rtol=1e-3, atol=1e-7)


def test_mmd_identical_samples_near_zero(rng):
    x = rng.normal(size=(15, 4)).astype(np.float32)
    mmd2, _ = mmd2_biased(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(float(mmd2), 0.0, atol=1e-5)


def test_unknown_impl_raises(rng):
    from vgan_tpu.ops.mmd import mmd2_biased_stateful

    x = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    import pytest

    with pytest.raises(ValueError, match="unknown impl"):
        mmd2_biased_stateful(
            x, x, jnp.zeros(()), jnp.asarray(False), impl="ring"
        )


def test_chunked_honors_matmul_dtype(rng):
    """matmul_dtype='bfloat16' must reach the chunked path's distance dots
    (review finding: it was silently dropped on the chunked route)."""
    from vgan_tpu.ops.mmd import mmd2_biased_stateful

    x = jnp.asarray(rng.normal(size=(24, 9)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(20, 9)).astype(np.float32) + 0.3)
    bw = jnp.asarray(5.0, jnp.float32)
    f32, _ = mmd2_biased_stateful(x, y, bw, jnp.asarray(True), impl="chunked")
    bf16, _ = mmd2_biased_stateful(
        x, y, bw, jnp.asarray(True), impl="chunked", matmul_dtype="bfloat16"
    )
    # close (f32 accumulation) but NOT bitwise equal (operands were cast)
    np.testing.assert_allclose(float(bf16), float(f32), rtol=2e-2)
    assert float(bf16) != float(f32)


def test_cross_impl_fuzz_value_and_grad(rng):
    """Randomized equivalence sweep: every impl route (dense jnp, chunked
    remat, pallas-interpret flash and S-path) must agree on loss value AND
    gradient for arbitrary shapes/bandwidth states."""
    from vgan_tpu.ops.mmd import mmd2_biased_stateful

    for trial in range(8):
        n1 = int(rng.integers(3, 40))
        n2 = int(rng.integers(3, 40))
        d = int(rng.integers(1, 30))
        x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
        y = jnp.asarray(
            (rng.normal(size=(n2, d)) * rng.uniform(0.5, 2.0)).astype(
                np.float32
            )
        )
        if rng.random() < 0.5:
            bw, is_set = jnp.asarray(float(rng.uniform(0.5, 50.0))), True
        else:
            bw, is_set = jnp.zeros(()), False
        args = (bw, jnp.asarray(is_set))

        def val(impl, y_):
            return mmd2_biased_stateful(x, y_, *args, impl=impl)[0]

        ref = float(val("jnp", y))
        g_ref = np.asarray(jax.grad(lambda y_: val("jnp", y_))(y))
        for impl in ("chunked", "pallas"):
            got = float(val(impl, y))
            np.testing.assert_allclose(
                got, ref, rtol=5e-4, atol=1e-7,
                err_msg=f"trial {trial} impl={impl} value",
            )
            g = np.asarray(jax.grad(lambda y_: val(impl, y_))(y))
            scale = np.abs(g_ref).max() + 1e-12
            np.testing.assert_allclose(
                g / scale, g_ref / scale, rtol=0, atol=5e-3,
                err_msg=f"trial {trial} impl={impl} grad",
            )
