"""Multi-speaker model path (VCTK-style): spk embedding concat in encoder
input and decoder conditioning (reference matcha_tts.py:50-51,111-113)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models import MatchaTTS

TINY_MS = dict(
    n_vocab=178, n_spks=4, spk_emb_dim=8, n_feats=16,
    enc_n_channels=32, enc_filter_channels=64, enc_filter_channels_dp=32,
    enc_n_heads=2, enc_n_layers=1, dec_channels=(32, 32),
    dec_num_mid_blocks=1, dec_num_heads=1, dec_attention_head_dim=16,
)


@pytest.fixture(scope="module")
def ms_model_and_params():
    model = MatchaTTS(**TINY_MS)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 178, size=(2, 16)))
    xl = jnp.array([16, 12])
    y = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    yl = jnp.array([64, 48])
    spks = jnp.array([1, 3])
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, x, xl, y, yl, jax.random.PRNGKey(0), spks
    )
    return model, params, (x, xl, y, yl, spks)


def test_multispeaker_losses(ms_model_and_params):
    model, params, (x, xl, y, yl, spks) = ms_model_and_params
    # spk embedding table exists with the right shape
    emb = params["params"]["spk_emb"]["embedding"]
    assert emb.shape == (4, 8)
    loss_fn = jax.jit(lambda p, k: model.apply(p, x, xl, y, yl, k, spks))
    dur, prior, diff, _ = loss_fn(params, jax.random.PRNGKey(2))
    for v in (dur, prior, diff):
        assert np.isfinite(float(v))


def test_multispeaker_synthesis_differs_by_speaker(ms_model_and_params):
    model, params, (x, xl, *_ ) = ms_model_and_params
    synth = jax.jit(
        functools.partial(model.apply, method=MatchaTTS.synthesise, n_timesteps=2, y_max_length=64)
    )
    key = jax.random.PRNGKey(3)
    out_a = synth(params, x, xl, key, spks=jnp.array([0, 0]))
    out_b = synth(params, x, xl, key, spks=jnp.array([2, 2]))
    # same text + same noise, different speaker -> different mel
    assert not np.allclose(np.asarray(out_a["mel"]), np.asarray(out_b["mel"]))
    assert np.isfinite(np.asarray(out_a["mel"])).all()
