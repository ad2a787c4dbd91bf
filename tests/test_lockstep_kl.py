"""Lockstep parity for the KERNEL-LEARNING adversarial loop.

With identical initial weights, batch, and noise, a D-D-G-G-D-D step
sequence (detector steps, generator steps, then detector steps after the
encoder-freeze leak) must track the PyTorch reference math step for step in
float64: detector loss ``-(MMD(enc x, enc Ux, U) - 0.1 L2(x, dec x) -
0.1 L2(Ux, dec Ux))`` with U detached (vgan.py:269-287), generator loss
``MMD(enc x, enc Ux, U)`` with detector frozen (vgan.py:306-327), frozen
bandwidth from the first detector batch, and torch's skip-frozen-params
Adadelta semantics (encoder trains only before the first generator phase).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vgan_tpu.models.detector import Detector
from vgan_tpu.models.generator import GeneratorBig
from vgan_tpu.ops.mmd import mmd_loss_constrained_stateful
from vgan_tpu.train.adadelta import adadelta
from vgan_tpu.train.steps import _detector_active_mask, _l2


def build_torch_stack(latent, d):
    gen = torch.nn.Sequential(
        torch.nn.Linear(latent, 2 * latent), torch.nn.Linear(2 * latent, 4 * latent),
        torch.nn.Linear(4 * latent, 8 * latent), torch.nn.Linear(8 * latent, d),
    ).double()
    enc = torch.nn.Sequential(
        torch.nn.Linear(d, 8 * latent), torch.nn.Linear(8 * latent, 4 * latent),
        torch.nn.Linear(4 * latent, 2 * latent), torch.nn.Linear(2 * latent, latent),
    ).double()
    dec = torch.nn.Sequential(
        torch.nn.Linear(latent, 2 * latent), torch.nn.Linear(2 * latent, 4 * latent),
        torch.nn.Linear(4 * latent, 8 * latent), torch.nn.Linear(8 * latent, d),
    ).double()
    return gen, enc, dec


def torch_upper_softmax(x):
    s = torch.nn.functional.softmax(x, 1)
    return torch.less(s, 1 / s.shape[1]) * s + torch.greater_equal(s, 1 / s.shape[1])


def torch_mmd(x, y, bandwidth):
    z = torch.vstack([x, y])
    d2 = torch.cdist(z, z) ** 2
    m = d2.shape[0]
    bw = d2.detach().sum() / (m * m - m) if bandwidth is None else bandwidth
    mults = torch.tensor([0.25, 0.5, 1.0, 2.0, 4.0], dtype=d2.dtype)
    k = torch.exp(-d2[None] / (bw * mults)[:, None, None]).sum(0)
    n = x.shape[0]
    return k[:n, :n].mean() - 2 * k[:n, n:].mean() + k[n:, n:].mean(), bw


def copy_flax_to_torch(params_list, nets):
    with torch.no_grad():
        for params, net in zip(params_list, nets):
            for i in range(4):
                k = np.asarray(params[f"Dense_{i}"]["kernel"], dtype=np.float64)
                b = np.asarray(params[f"Dense_{i}"]["bias"], dtype=np.float64)
                net[i].weight.copy_(torch.tensor(k.T))
                net[i].bias.copy_(torch.tensor(b))


def test_kl_lockstep_ddggdd(rng):
    n, d, latent = 16, 16, 1
    lr, wd = 0.007, 0.04
    batch_np = rng.normal(size=(n, d))
    noises = [rng.normal(size=(n, latent)) for _ in range(6)]

    # --- our side (float64) ---
    gen_m = GeneratorBig(out_features=d, latent_size=latent, param_dtype=jnp.float64)
    det_m = Detector(latent_size=latent, in_features=d, param_dtype=jnp.float64)
    gen_params = jax.tree.map(
        lambda a: a.astype(jnp.float64),
        gen_m.init(jax.random.PRNGKey(0), jnp.zeros((1, latent), jnp.float64)),
    )
    det_params = jax.tree.map(
        lambda a: a.astype(jnp.float64),
        det_m.init(jax.random.PRNGKey(1), jnp.zeros((1, d), jnp.float64)),
    )
    gen_opt = adadelta(lr, weight_decay=wd)
    det_opt = adadelta(lr, weight_decay=wd)
    gen_opt_state = gen_opt.init(gen_params)
    det_opt_state = det_opt.init(det_params)
    batch = jnp.asarray(batch_np)
    bw_value = jnp.zeros((), jnp.float64)
    bw_is_set = jnp.asarray(False)

    # --- torch side, same weights ---
    tgen, tenc, tdec = build_torch_stack(latent, d)
    copy_flax_to_torch(
        [gen_params["params"],
         det_params["params"]["encoder"],
         det_params["params"]["decoder"]],
        [tgen, tenc, tdec],
    )
    topt_g = torch.optim.Adadelta(tgen.parameters(), lr=lr, weight_decay=wd)
    topt_d = torch.optim.Adadelta(
        list(tenc.parameters()) + list(tdec.parameters()), lr=lr, weight_decay=wd
    )
    tbatch = torch.tensor(batch_np)
    t_bw = None

    ours_losses, torch_losses = [], []
    phases = ["D", "D", "G", "G", "D", "D"]
    encoder_active = True
    for step_i, phase in enumerate(phases):
        z_np = noises[step_i]
        z = jnp.asarray(z_np)
        tz = torch.tensor(z_np)

        if phase == "D":
            # ours
            u = jax.lax.stop_gradient(gen_m.apply(gen_params, z))

            def loss_fn(p):
                enc_x, dec_x = det_m.apply(p, batch)
                enc_ux, dec_ux = det_m.apply(p, u * batch)
                mmd, bw = mmd_loss_constrained_stateful(
                    enc_x, enc_ux, u, 0.0, bw_value, bw_is_set, impl="jnp"
                )
                return -(mmd - 0.1 * _l2(batch, dec_x) - 0.1 * _l2(u * batch, dec_ux)), bw

            (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(det_params)
            active = _detector_active_mask(det_params, jnp.asarray(encoder_active))
            updates, det_opt_state = det_opt.update(
                grads, det_opt_state, det_params, active=active
            )
            det_params = jax.tree.map(lambda p, u_: p + u_, det_params, updates)
            bw_value, bw_is_set = bw_used, jnp.asarray(True)

            # torch: encoder participates only while active
            for p_ in tenc.parameters():
                p_.requires_grad = encoder_active
            for p_ in tdec.parameters():
                p_.requires_grad = True
            topt_d.zero_grad()
            with torch.no_grad():
                ut = torch_upper_softmax(tgen(tz))
            enc_x, dec_x = tenc(tbatch), tdec(tenc(tbatch))
            enc_ux, dec_ux = tenc(ut * tbatch), tdec(tenc(ut * tbatch))
            mmd_t, t_bw_used = torch_mmd(enc_x, enc_ux, t_bw)
            if t_bw is None:
                t_bw = t_bw_used.detach()
            l2x = ((tbatch - dec_x) ** 2).mean()
            l2ux = ((ut * tbatch - dec_ux) ** 2).mean()
            t_loss = -(mmd_t - 0.1 * l2x - 0.1 * l2ux)
            t_loss.backward()
            topt_d.step()
        else:
            encoder_active = False  # freeze leak after first generator phase

            def loss_fn(p):
                u = gen_m.apply(p, z)
                enc_x, _ = det_m.apply(det_params, batch)
                enc_ux, _ = det_m.apply(det_params, u * batch)
                mmd, bw = mmd_loss_constrained_stateful(
                    enc_x, enc_ux, u, 0.0, bw_value, bw_is_set, impl="jnp"
                )
                return mmd, bw

            (loss, bw_used), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen_params)
            updates, gen_opt_state = gen_opt.update(grads, gen_opt_state, gen_params)
            gen_params = jax.tree.map(lambda p, u_: p + u_, gen_params, updates)
            bw_value, bw_is_set = bw_used, jnp.asarray(True)

            for p_ in list(tenc.parameters()) + list(tdec.parameters()):
                p_.requires_grad = False
            topt_g.zero_grad()
            ut = torch_upper_softmax(tgen(tz))
            enc_x = tenc(tbatch)
            enc_ux = tenc(ut * tbatch)
            t_loss, _ = torch_mmd(enc_x, enc_ux, t_bw)
            t_loss.backward()
            topt_g.step()

        ours_losses.append(float(loss))
        torch_losses.append(float(t_loss))

    np.testing.assert_allclose(ours_losses, torch_losses, rtol=1e-8)

    # final weights: generator, decoder moved; encoder identical to its state
    # after the first two detector steps
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(gen_params["params"][f"Dense_{i}"]["kernel"]),
            tgen[i].weight.detach().numpy().T, rtol=1e-7, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(det_params["params"]["decoder"][f"Dense_{i}"]["kernel"]),
            tdec[i].weight.detach().numpy().T, rtol=1e-7, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(det_params["params"]["encoder"][f"Dense_{i}"]["kernel"]),
            tenc[i].weight.detach().numpy().T, rtol=1e-7, atol=1e-12,
        )
