"""HiFi-GAN vocoder training step (generator + MPD/MSD adversaries).

The reference ships the discriminators and GAN losses
(matcha/hifigan/models.py:209-368) but no training entry point. This
module completes the vocoder-training capability with the standard
HiFi-GAN objective as two jitted SPMD steps:

* discriminator step: LSGAN loss on real/generated waveforms;
* generator step: LSGAN adversarial + 2x feature-matching + 45x L1 mel
  loss (the canonical HiFi-GAN weights).

Optimizers follow the reference's vocoder protocol (AdamW-style Adam with
b1=0.8, b2=0.99, lr 2e-4-ish decaying — matcha/hifigan/config.py).
"""

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from matcha_tpu.audio.mel import mel_spectrogram
from matcha_tpu.models.hifigan import (
    Generator,
    HiFiGANConfig,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@flax.struct.dataclass
class VocoderTrainState:
    step: jnp.ndarray
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    gen_opt: Any
    disc_opt: Any


def make_vocoder_optimizers(h: HiFiGANConfig):
    gen_tx = optax.adam(h.learning_rate, b1=h.adam_b1, b2=h.adam_b2)
    disc_tx = optax.adam(h.learning_rate, b1=h.adam_b1, b2=h.adam_b2)
    return gen_tx, disc_tx


def init_vocoder_state(key, h: HiFiGANConfig, segment_size: int = 8192, weight_norm: bool = True):
    gen = Generator(h, weight_norm=weight_norm)
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    k1, k2, k3 = jax.random.split(key, 3)
    mel = jnp.zeros((1, segment_size // h.hop_size, h.num_mels))
    wav = jnp.zeros((1, segment_size, 1))
    gen_params = gen.init(k1, mel)
    mpd_params = mpd.init(k2, wav, wav)
    msd_params = msd.init(k3, wav, wav)
    gen_tx, disc_tx = make_vocoder_optimizers(h)
    return (
        gen,
        mpd,
        msd,
        VocoderTrainState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=gen_params,
            mpd_params=mpd_params,
            msd_params=msd_params,
            gen_opt=gen_tx.init(gen_params),
            disc_opt=disc_tx.init((mpd_params, msd_params)),
        ),
    )


def make_vocoder_train_step(gen: Generator, mpd, msd, h: HiFiGANConfig):
    gen_tx, disc_tx = make_vocoder_optimizers(h)

    def mel_of(wav):
        # wav (B, T, 1) -> (B, n_mels, frames)
        return mel_spectrogram(
            wav[..., 0], h.n_fft, h.num_mels, h.sampling_rate,
            h.hop_size, h.win_size, h.fmin, h.fmax,
        )

    def disc_loss_fn(disc_params, gen_params, batch):
        mpd_params, msd_params = disc_params
        y_hat = gen.apply(gen_params, batch["mel"])
        y = batch["audio"]
        y_df_r, y_df_g, _, _ = mpd.apply(mpd_params, y, jax.lax.stop_gradient(y_hat))
        loss_f, _, _ = discriminator_loss(y_df_r, y_df_g)
        y_ds_r, y_ds_g, _, _ = msd.apply(msd_params, y, jax.lax.stop_gradient(y_hat))
        loss_s, _, _ = discriminator_loss(y_ds_r, y_ds_g)
        return loss_f + loss_s

    def gen_loss_fn(gen_params, disc_params, batch):
        mpd_params, msd_params = disc_params
        y_hat = gen.apply(gen_params, batch["mel"])
        y = batch["audio"]
        mel_l1 = jnp.mean(jnp.abs(mel_of(y_hat) - jnp.swapaxes(batch["mel_loss"], 1, 2))) * 45.0
        _, y_df_g, fmap_f_r, fmap_f_g = mpd.apply(mpd_params, y, y_hat)
        _, y_ds_g, fmap_s_r, fmap_s_g = msd.apply(msd_params, y, y_hat)
        loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
        loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
        loss_gen_f, _ = generator_loss(y_df_g)
        loss_gen_s, _ = generator_loss(y_ds_g)
        total = loss_gen_f + loss_gen_s + loss_fm_f + loss_fm_s + mel_l1
        return total, {"gen_loss": total, "mel_l1": mel_l1}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: VocoderTrainState, batch):
        disc_params = (state.mpd_params, state.msd_params)
        d_loss, d_grads = jax.value_and_grad(disc_loss_fn)(disc_params, state.gen_params, batch)
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, disc_params)
        mpd_params, msd_params = optax.apply_updates(disc_params, d_updates)

        (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, (mpd_params, msd_params), batch
        )
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = VocoderTrainState(
            step=state.step + 1,
            gen_params=gen_params, mpd_params=mpd_params, msd_params=msd_params,
            gen_opt=gen_opt, disc_opt=disc_opt,
        )
        metrics = {"disc_loss": d_loss, **aux}
        return new_state, metrics

    return train_step
