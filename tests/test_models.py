"""Model architecture, init-scheme, and torch-checkpoint-import tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vgan_tpu.models import (
    Decoder,
    Detector,
    Encoder,
    Generator,
    GeneratorBig,
    generator_params_from_torch_state_dict,
)
from vgan_tpu.models.generator import latent_size_for
from vgan_tpu.models.initializers import TORCH_DEFAULT


def test_latent_size_rule():
    assert latent_size_for(10) == 1
    assert latent_size_for(16) == 1
    assert latent_size_for(32) == 2
    assert latent_size_for(100) == 6
    assert latent_size_for(1) == 1


def test_generator_big_shapes_and_widths():
    d, latent = 64, 4
    model = GeneratorBig(out_features=d, latent_size=latent)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((3, latent)))
    kernels = {
        name: p["kernel"].shape for name, p in params["params"].items()
    }
    assert kernels == {
        "Dense_0": (4, 8),
        "Dense_1": (8, 16),
        "Dense_2": (16, 32),
        "Dense_3": (32, 64),
    }
    out = model.apply(params, jnp.ones((3, latent)))
    assert out.shape == (3, d)
    # output is upper-softmaxed: entries are softmax values or exactly 1.0
    o = np.asarray(out)
    assert np.all((o == 1.0) | (o < 1.0 / d))


def test_generator_square_variant():
    model = Generator(latent_size=6)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 6)))
    out = model.apply(params, jnp.zeros((2, 6)))
    assert out.shape == (2, 6)


def test_detector_shapes():
    d, latent = 48, 3
    model = Detector(latent_size=latent, in_features=d)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((5, d)))
    enc, dec = model.apply(params, jnp.ones((5, d)))
    assert enc.shape == (5, latent)
    assert dec.shape == (5, d)


def test_encoder_decoder_widths():
    enc = Encoder(latent_size=2, in_features=32)
    p = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
    shapes = [p["params"][f"Dense_{i}"]["kernel"].shape for i in range(4)]
    assert shapes == [(32, 16), (16, 8), (8, 4), (4, 2)]

    dec = Decoder(latent_size=2, out_features=32)
    p = dec.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)))
    shapes = [p["params"][f"Dense_{i}"]["kernel"].shape for i in range(4)]
    assert shapes == [(2, 4), (4, 8), (8, 16), (16, 32)]


def test_reference_normal_init_stats():
    # W ~ N(0, 0.1), b = 0 (vgan.py:76-78)
    model = GeneratorBig(out_features=256, latent_size=64)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64)))["params"]
    w = np.asarray(params["Dense_3"]["kernel"]).ravel()
    assert abs(w.std() - 0.1) < 0.01
    assert abs(w.mean()) < 0.01
    for i in range(4):
        assert np.all(np.asarray(params[f"Dense_{i}"]["bias"]) == 0.0)


def test_torch_default_init_bounds():
    model = GeneratorBig(out_features=256, latent_size=64, init_scheme=TORCH_DEFAULT)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64)))["params"]
    # layer 3 fan_in = 8 * 64 = 512 -> bound = 1/sqrt(512)
    w = np.asarray(params["Dense_3"]["kernel"])
    bound = 1.0 / np.sqrt(512)
    assert np.all(np.abs(w) <= bound)
    assert w.std() > 0.4 * bound  # actually uniform, not degenerate
    b = np.asarray(params["Dense_3"]["bias"])
    assert np.all(np.abs(b) <= bound)
    assert np.any(b != 0.0)


def _torch_generator_big(latent, d):
    return torch.nn.Sequential(
        torch.nn.Linear(latent, 2 * latent),
        torch.nn.Linear(2 * latent, 4 * latent),
        torch.nn.Linear(4 * latent, 8 * latent),
        torch.nn.Linear(8 * latent, d),
    )


def test_torch_import_forward_parity(rng):
    """A reference-layout torch generator imported into Flax produces
    identical outputs (pre-activation linear stack + upper_softmax)."""
    latent, d = 3, 40
    torch_net = _torch_generator_big(latent, d)
    sd = {f"main.{i}.{k}": v for i in range(4) for k, v in torch_net[i].state_dict().items()}

    params = generator_params_from_torch_state_dict(sd)
    model = GeneratorBig(out_features=d, latent_size=latent)

    z = rng.normal(size=(7, latent)).astype(np.float32)
    ours = np.asarray(model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(z)))

    with torch.no_grad():
        h = torch_net(torch.tensor(z))
        s = torch.nn.functional.softmax(h, 1)
        theirs = (torch.less(s, 1 / d) * s + torch.greater_equal(s, 1 / d)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_torch_import_roundtrip_file(tmp_path):
    latent, d = 2, 24
    torch_net = _torch_generator_big(latent, d)
    sd = {f"main.{i}.{k}": v for i in range(4) for k, v in torch_net[i].state_dict().items()}
    path = tmp_path / "generator_0.pt"
    torch.save(sd, path)

    from vgan_tpu.models import load_torch_generator_params

    params = load_torch_generator_params(path)
    assert params["params"]["Dense_0"]["kernel"].shape == (latent, 2 * latent)
