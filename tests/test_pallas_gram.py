"""Pallas MMD Gram kernel vs the jnp reference implementation.

On CPU these run through the Pallas interpreter (same kernel code path as
TPU, minus Mosaic compilation); shapes cover padding, unequal sample sizes,
and multi-d-chunk streaming. TPU-compiled parity is exercised by the bench /
verify flows on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vgan_tpu.ops import mmd as M
from vgan_tpu.ops.pallas.mmd_gram import (
    _closed_form_bandwidth,
    mmd2_biased_pallas,
    mmd2_biased_stateful_pallas,
    pallas_supported,
)


@pytest.mark.parametrize("n1,n2,d", [(20, 20, 7), (33, 17, 40)])
def test_forward_matches_jnp(rng, n1, n2, d):
    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.3)
    ref, bw_ref = M.mmd2_biased(x, y)
    pal, bw_pal = mmd2_biased_pallas(x, y)
    np.testing.assert_allclose(float(pal), float(ref), rtol=2e-4)
    np.testing.assert_allclose(float(bw_pal), float(bw_ref), rtol=2e-3)


def test_gradients_match_jnp(rng):
    n1, n2, d = 24, 20, 9
    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.3)
    _, bw = M.mmd2_biased(x, y)

    g_ref = jax.grad(lambda y_: M.mmd2_biased(x, y_, bandwidth=bw)[0])(y)
    g_pal = jax.grad(lambda y_: mmd2_biased_pallas(x, y_, bandwidth=bw)[0])(y)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), rtol=2e-3, atol=1e-7)

    gx_ref = jax.grad(lambda x_: M.mmd2_biased(x_, y, bandwidth=bw)[0])(x)
    gx_pal = jax.grad(lambda x_: mmd2_biased_pallas(x_, y, bandwidth=bw)[0])(x)
    np.testing.assert_allclose(np.asarray(gx_pal), np.asarray(gx_ref), rtol=2e-3, atol=1e-7)


def test_stateful_frozen_bandwidth(rng):
    x = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    frozen = jnp.asarray(3.0, jnp.float32)
    pal, bw = mmd2_biased_stateful_pallas(x, y, frozen, jnp.asarray(True))
    ref, _ = M.mmd2_biased_stateful(x, y, frozen, jnp.asarray(True))
    assert float(bw) == 3.0
    np.testing.assert_allclose(float(pal), float(ref), rtol=2e-4)


def test_closed_form_bandwidth_matches_quadratic(rng):
    z = jnp.asarray(rng.normal(size=(30, 8)).astype(np.float32))
    cf = float(_closed_form_bandwidth(z, 30))
    d2 = M.pairwise_sq_dists(z)
    ref = float(M.reference_bandwidth(d2))
    np.testing.assert_allclose(cf, ref, rtol=1e-3)


def test_random_shapes_forward_parity(rng):
    """Property-style sweep: random (n1, n2, d) shapes agree with the jnp
    reference (SURVEY.md section 4: kernel-vs-jnp equivalence on random
    shapes)."""
    for _ in range(4):
        n1 = int(rng.integers(2, 48))
        n2 = int(rng.integers(2, 48))
        d = int(rng.integers(1, 70))
        x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.2)
        ref, _ = M.mmd2_biased(x, y, bandwidth=jnp.asarray(2.0, jnp.float32))
        pal, _ = mmd2_biased_pallas(x, y, bandwidth=jnp.asarray(2.0, jnp.float32))
        np.testing.assert_allclose(
            float(pal), float(ref), rtol=5e-4,
            err_msg=f"shape ({n1},{n2},{d})",
        )


def test_pallas_supported_gates():
    from vgan_tpu.ops.pallas.mmd_gram import shape_supported

    x = jnp.zeros((10, 4))
    y = jnp.zeros((10, 4))
    # on CPU the fused kernel is never auto-selected
    assert not pallas_supported(x, y)
    # no (m, d) cap since round 3: the flash backward streams any m at
    # small d, and the rank-1 panel backward streams any m at large d
    assert shape_supported(20000, 20000, 4)
    assert shape_supported(100000, 100000, 2048)
    assert shape_supported(9000, 9000, 10240)
    assert shape_supported(100000, 100000, 10240)


def test_gradients_match_jnp_large_d(rng):
    """d past FLASH_D_MAX exercises the rank-1 panel backward path."""
    n1, n2, d = 10, 8, 2100
    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.1)
    bw = jnp.asarray(float(d), jnp.float32)

    ref, _ = M.mmd2_biased(x, y, bandwidth=bw)
    pal, _ = mmd2_biased_pallas(x, y, bandwidth=bw)
    np.testing.assert_allclose(float(pal), float(ref), rtol=2e-4)

    g_ref = jax.grad(lambda y_: M.mmd2_biased(x, y_, bandwidth=bw)[0])(y)
    g_pal = jax.grad(lambda y_: mmd2_biased_pallas(x, y_, bandwidth=bw)[0])(y)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=2e-3, atol=1e-8
    )


def test_panel_backward_multi_panel_parity(rng, monkeypatch):
    """Force the rank-1 panel backward to split into several row panels and
    check the gradient still matches the jnp reference (the regime that was
    capped at m<=16384 before round 3)."""
    import vgan_tpu.ops.pallas.mmd_gram as mg

    n1, n2, d = 300, 280, 2100  # padded M=768, D=2560 > FLASH_D_MAX
    # shrink the panel budget so M=768 splits into 3 panels of 256 rows
    monkeypatch.setattr(mg, "PANEL_BYTES", 768 * 4 * 256)
    assert mg._panel_rows(768, 256) == 256

    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.1)
    bw = jnp.asarray(float(d), jnp.float32)

    g_ref = jax.grad(lambda y_: M.mmd2_biased(x, y_, bandwidth=bw)[0])(y)
    g_pal = jax.grad(lambda y_: mmd2_biased_pallas(x, y_, bandwidth=bw)[0])(y)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=2e-3, atol=1e-8
    )


def test_panel_rows_sizing():
    from vgan_tpu.ops.pallas.mmd_gram import PANEL_BYTES, _panel_rows

    # small M: whole problem is one panel
    assert _panel_rows(512, 256) == 512
    # large M: panel capped by the byte budget, tile-aligned, >= one tile
    M = 65536
    r = _panel_rows(M, 512)
    assert r % 512 == 0
    assert r * M * 4 <= PANEL_BYTES
    assert _panel_rows(10**6, 256) == 256


def test_bf16_matmul_dtype_close_to_f32(rng):
    """The bf16 MXU fast path agrees with f32 at bf16 resolution, forward
    and gradient, and matches the jnp path's own bf16 option closely."""
    n1, n2, d = 24, 24, 40
    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.3)
    bw = jnp.asarray(20.0, jnp.float32)

    f32, _ = mmd2_biased_pallas(x, y, bandwidth=bw)
    b16, _ = mmd2_biased_pallas(x, y, bandwidth=bw, matmul_dtype="bfloat16")
    np.testing.assert_allclose(float(b16), float(f32), rtol=2e-2, atol=1e-4)

    g32 = jax.grad(lambda y_: mmd2_biased_pallas(x, y_, bandwidth=bw)[0])(y)
    g16 = jax.grad(
        lambda y_: mmd2_biased_pallas(
            x, y_, bandwidth=bw, matmul_dtype="bfloat16"
        )[0]
    )(y)
    np.testing.assert_allclose(
        np.asarray(g16), np.asarray(g32), rtol=5e-2, atol=2e-4
    )


def test_flash_backward_wide_row_tile_parity(rng):
    """Round 3: at small d the flash backward picks a row tile larger than
    the col tile (tile_i=1024, tile_j=512 at M=1024/D=128) to cut z
    re-fetch traffic; gradients must be unchanged."""
    from vgan_tpu.ops.pallas.mmd_gram import _flash_tiles

    assert _flash_tiles(1024, 128, 4) == (1024, 512)
    n1, n2, d = 520, 490, 100  # padded M=1024, D=128
    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.2)
    bw = jnp.asarray(float(d), jnp.float32)

    g_ref = jax.grad(lambda y_: M.mmd2_biased(x, y_, bandwidth=bw)[0])(y)
    g_pal = jax.grad(lambda y_: mmd2_biased_pallas(x, y_, bandwidth=bw)[0])(y)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=2e-3, atol=1e-7
    )


def test_stash_backward_matches_panel_recompute(rng, monkeypatch):
    """The K'-stashing backward (forward emits kp; backward is one fused
    (M, 1+D) matmul) is numerically identical to the rank-1 panel
    recompute it replaces, and both match the jnp oracle's gradients."""
    import vgan_tpu.ops.mmd as M
    from vgan_tpu.ops.pallas import mmd_gram as G

    n1, n2, d = 150, 110, 2100  # panel regime (d > FLASH_D_MAX)
    x = jnp.asarray(rng.normal(size=(n1, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n2, d)).astype(np.float32) + 0.1)
    bw = M.candidate_bandwidth(jnp.concatenate([x, y]))
    mults = M.bandwidth_multipliers()

    def grads():
        return jax.grad(
            lambda a, b: G.mmd2_pallas_core(a, b, bw, mults), argnums=(0, 1)
        )(x, y)

    assert G._stash_kprime(256, 2176), "shape must hit the stash path"
    gx_s, gy_s = grads()
    monkeypatch.setattr(G, "_KP_STASH_BYTES", 0)  # force panel recompute
    gx_p, gy_p = grads()
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_p),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy_p),
                               rtol=1e-5, atol=1e-7)

    # oracle: jnp autodiff of the generic implementation
    def jnp_mmd(a, b):
        v, _ = M.mmd2_biased(a, b, bandwidth=bw)
        return v

    gx_o, gy_o = jax.grad(jnp_mmd, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_o),
                               rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy_o),
                               rtol=2e-3, atol=1e-6)
