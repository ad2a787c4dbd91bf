"""AOT serving export: serialized sampler round-trips and matches the live
model, including for batch sizes unseen at export (symbolic batch dim)."""

import numpy as np

from vgan_tpu import VGAN_no_kl
from vgan_tpu.serving import export_sampler, load_sampler, sample_masks


def test_export_load_roundtrip(tmp_path, rng):
    x = rng.normal(size=(96, 10)).astype(np.float32)
    m = VGAN_no_kl(batch_size=32, epochs=2, verbose=False)
    m.fit(x)

    path = tmp_path / "sampler.bin"
    export_sampler(m, path)
    assert path.stat().st_size > 0

    fn = load_sampler(path)
    masks = sample_masks(fn, nsubs=16, latent_size=m._latent_size, seed=m.seed)
    np.testing.assert_array_equal(masks, m.generate_subspaces(16))

    # different batch size than anything traced before (symbolic dim)
    masks2 = sample_masks(fn, nsubs=7, latent_size=m._latent_size, seed=m.seed)
    assert masks2.shape == (7, 10)
