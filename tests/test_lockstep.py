"""Lockstep training parity: with identical initial weights, batches, and
noise, N full no-kl training steps (generator forward -> upper-softmax ->
constrained MMD -> backward -> Adadelta) must track the PyTorch reference
math step for step. Run in float64 so the comparison is tight: any deviation
in gradient semantics (mask constancy, bandwidth freezing, weight-decay
coupling) would compound visibly over steps.

The torch side re-expresses the documented reference semantics
(Generator.py:58-70 architecture, Mmd_loss_constrained.py loss,
torch.optim.Adadelta(lr, weight_decay) as in vgan.py:567-568).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vgan_tpu.models.generator import GeneratorBig
from vgan_tpu.ops.mmd import mmd_loss_constrained_stateful
from vgan_tpu.train.adadelta import adadelta


def build_torch_generator(latent, d):
    return torch.nn.Sequential(
        torch.nn.Linear(latent, 2 * latent),
        torch.nn.Linear(2 * latent, 4 * latent),
        torch.nn.Linear(4 * latent, 8 * latent),
        torch.nn.Linear(8 * latent, d),
    ).double()


def torch_upper_softmax(x):
    s = torch.nn.functional.softmax(x, 1)
    return torch.less(s, 1 / s.shape[1]) * s + torch.greater_equal(s, 1 / s.shape[1])


def torch_loss(batch, u, weight, bandwidth):
    z = torch.vstack([batch, u * batch])
    d2 = torch.cdist(z, z) ** 2
    m = d2.shape[0]
    bw = d2.detach().sum() / (m * m - m) if bandwidth is None else bandwidth
    mults = torch.tensor([0.25, 0.5, 1.0, 2.0, 4.0], dtype=d2.dtype)
    k = torch.exp(-d2[None] / (bw * mults)[:, None, None]).sum(0)
    n = batch.shape[0]
    mmd2 = k[:n, :n].mean() - 2 * k[:n, n:].mean() + k[n:, n:].mean()
    penalty = torch.mean(
        torch.ones(u.shape[1], dtype=u.dtype) - torch.topk(u, 1, 0).values
    )
    return mmd2 + weight * penalty, bw


def flax_params_to_torch(params, net):
    with torch.no_grad():
        for i in range(4):
            k = np.asarray(params["params"][f"Dense_{i}"]["kernel"], dtype=np.float64)
            b = np.asarray(params["params"][f"Dense_{i}"]["bias"], dtype=np.float64)
            net[i].weight.copy_(torch.tensor(k.T))
            net[i].bias.copy_(torch.tensor(b))


def test_no_kl_lockstep_five_steps(rng):
    n, d, latent = 24, 16, 1
    lr, wd, weight = 0.007, 0.04, 10.0
    batch_np = rng.normal(size=(n, d))
    steps = 5
    noises = [rng.normal(size=(n, latent)) for _ in range(steps)]

    # --- our side (float64) ---
    gen = GeneratorBig(out_features=d, latent_size=latent, param_dtype=jnp.float64)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, latent), jnp.float64))
    params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
    opt = adadelta(lr, weight_decay=wd)
    opt_state = opt.init(params)
    batch = jnp.asarray(batch_np)
    bw_value = jnp.zeros((), jnp.float64)
    bw_is_set = jnp.asarray(False)

    # --- torch side, same weights ---
    tnet = build_torch_generator(latent, d)
    flax_params_to_torch(params, tnet)
    topt = torch.optim.Adadelta(tnet.parameters(), lr=lr, weight_decay=wd)
    tbatch = torch.tensor(batch_np)
    t_bw = None

    our_losses, torch_losses = [], []
    for step in range(steps):
        z = noises[step]

        def loss_fn(p):
            u = gen.apply(p, jnp.asarray(z))
            loss, bw = mmd_loss_constrained_stateful(
                batch, u * batch, u, weight, bw_value, bw_is_set, impl="jnp"
            )
            return loss, bw

        (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u_: p + u_, params, updates)
        bw_value, bw_is_set = bw_used, jnp.asarray(True)
        our_losses.append(float(loss))

        topt.zero_grad()
        h = tnet(torch.tensor(z))
        u_t = torch_upper_softmax(h)
        t_loss, t_bw_used = torch_loss(tbatch, u_t, weight, t_bw)
        if t_bw is None:
            t_bw = t_bw_used.detach()
        t_loss.backward()
        topt.step()
        torch_losses.append(float(t_loss))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-9)
    # final weights agree to fp64 tightness
    for i in range(4):
        ours = np.asarray(params["params"][f"Dense_{i}"]["kernel"])
        theirs = tnet[i].weight.detach().numpy().T
        np.testing.assert_allclose(ours, theirs, rtol=1e-8, atol=1e-12)
