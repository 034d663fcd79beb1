"""Deployment export/roundtrip + vocoder GAN training step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.hifigan import HiFiGANConfig

TINY_HIFI = HiFiGANConfig(
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
    num_mels=80,
    hop_size=8,
    n_fft=32,
    win_size=32,
    fmin=0.0,
    fmax=4000.0,
    segment_size=128,
)


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    """Serialize the fused synthesis graph and run the artifact."""
    from jax import export as jexport

    from matcha_tpu.deploy.export import get_exportable_fn
    from matcha_tpu.models import MatchaTTS

    tiny = dict(
        n_vocab=178, n_feats=8, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=8, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    x = jnp.zeros((1, 16), jnp.int32)
    xl = jnp.asarray([16], jnp.int32)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": jax.random.PRNGKey(1)}, x, xl, key,
                        n_timesteps=1, y_max_length=32, method=MatchaTTS.synthesise)

    fn = get_exportable_fn(model, None, n_timesteps=2, T_y=32)
    scales = jnp.asarray([0.667, 1.0], jnp.float32)
    exported = jexport.export(jax.jit(fn))(params, x, xl, scales, key)
    data = exported.serialize()
    assert len(data) > 1000

    reloaded = jexport.deserialize(bytearray(data))
    mel, mel_lengths = reloaded.call(params, x, xl, scales, key)
    direct_mel, direct_lengths = fn(params, x, xl, scales, key)
    np.testing.assert_allclose(np.asarray(mel), np.asarray(direct_mel), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mel_lengths), np.asarray(direct_lengths))


@pytest.mark.slow
def test_vocoder_gan_train_step():
    """One generator+discriminator update on a tiny HiFi-GAN: losses finite
    and parameters change."""
    from matcha_tpu.training.vocoder_trainer import init_vocoder_state, make_vocoder_train_step

    h = TINY_HIFI
    gen, mpd, msd, state = init_vocoder_state(jax.random.PRNGKey(0), h, segment_size=h.segment_size)
    rng = np.random.default_rng(0)
    T = h.segment_size // h.hop_size
    batch = {
        "mel": jnp.asarray(rng.normal(size=(2, T, h.num_mels)).astype(np.float32)),
        "mel_loss": jnp.asarray(rng.normal(size=(2, h.num_mels, T)).astype(np.float32).transpose(0, 2, 1)),
        "audio": jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, h.segment_size, 1)).astype(np.float32)),
    }
    step_fn = make_vocoder_train_step(gen, mpd, msd, h)
    before = jax.tree.leaves(state.gen_params)[0].copy()
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["mel_l1"]))
    after = jax.tree.leaves(state.gen_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert int(state.step) == 1
