"""Sub-pixel transposed conv == dilated transposed conv (same params)."""

import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.components.common import ConvTranspose1d, SubPixelConvTranspose1d


@pytest.mark.parametrize("k,u,p", [(16, 8, 4), (4, 2, 1), (16, 16, 0), (5, 3, 1)])
def test_subpixel_matches_dilated(rng, k, u, p):
    cin, cout = 12, 6
    x = jnp.asarray(rng.normal(size=(2, 20, cin)).astype(np.float32))
    params = {"params": {
        "kernel": jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
    }}
    ref = ConvTranspose1d(cout, k, stride=u, padding=p).apply(params, x)
    got = SubPixelConvTranspose1d(cout, k, stride=u, padding=p).apply(params, x)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("k,u,p", [(16, 8, 4), (4, 2, 1), (12, 4, 4)])
def test_pallas_path_subpixel_helper_matches_dilated(rng, k, u, p):
    """The serving-path helper twin (hifigan_pallas._conv_transpose1d_subpixel)
    must match the lhs_dilation implementation on the converter's
    already-flipped kernel layout. Cases satisfy the helper's HiFi-GAN
    contract 2*padding == k - stride (it raises otherwise)."""
    from matcha_tpu.models.hifigan_pallas import (
        _conv_transpose1d,
        _conv_transpose1d_subpixel,
    )

    cin, cout = 12, 6
    x = jnp.asarray(rng.normal(size=(2, 20, cin)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = _conv_transpose1d(x, kern, bias, stride=u, padding=p)
    got = _conv_transpose1d_subpixel(x, kern, bias, stride=u, padding=p)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_generator_impls_agree(rng):
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),), num_mels=8,
    )
    import jax

    g_dil = Generator(cfg, upsample_impl="dilated")
    g_sub = Generator(cfg, upsample_impl="subpixel")
    params = g_dil.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 8)))
    x = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(g_sub.apply(params, x)), np.asarray(g_dil.apply(params, x)), atol=1e-5
    )
