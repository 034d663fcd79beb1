"""HiFi-GAN vocoder training step (generator + MPD/MSD adversaries).

The reference ships the discriminators and GAN losses
(matcha/hifigan/models.py:209-368) but no training entry point. This
module completes the vocoder-training capability with the standard
HiFi-GAN objective as one jitted SPMD step:

* discriminator step: LSGAN loss on real/generated waveforms;
* generator step: LSGAN adversarial + 2x feature-matching + 45x L1 mel
  loss (the canonical HiFi-GAN weights).

Training parity with the reference protocol (matcha/hifigan/config.py +
models.py:247-334):

* Adam(b1=0.8, b2=0.99, lr 2e-4) with ``ExponentialLR(gamma=0.999)``
  stepped per epoch (``steps_per_epoch`` sets the decay staircase);
* generator AND discriminators train in the weight-norm (g, v)
  parameterisation; the first MSD discriminator is spectral-normalised
  with a persistent running-u power-iteration buffer (the ``"spectral"``
  variable collection, threaded through the train state).

The runnable entry point is :mod:`matcha_tpu.training.vocoder_train`.
"""

import functools
from typing import Any, Optional

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
    msd_spectral: Any  # running-u buffers of the spectral-normed MSD scale
    gen_opt: Any
    disc_opt: Any


def make_vocoder_optimizers(h: HiFiGANConfig, steps_per_epoch: Optional[int] = None):
    """Adam(b1, b2) with the reference's per-epoch ExponentialLR decay
    (config.py ``lr_decay: 0.999``; constant lr when steps_per_epoch is
    unknown)."""
    if steps_per_epoch:
        schedule = optax.exponential_decay(
            init_value=h.learning_rate,
            transition_steps=int(steps_per_epoch),
            decay_rate=float(h.lr_decay),
            staircase=True,
        )
    else:
        schedule = h.learning_rate
    gen_tx = optax.adam(schedule, b1=h.adam_b1, b2=h.adam_b2)
    disc_tx = optax.adam(schedule, b1=h.adam_b1, b2=h.adam_b2)
    return gen_tx, disc_tx


def make_models(h: HiFiGANConfig, weight_norm: bool = True):
    gen = Generator(h, weight_norm=weight_norm)
    mpd = MultiPeriodDiscriminator(weight_norm=weight_norm)
    msd = MultiScaleDiscriminator(weight_norm=weight_norm, running_u=True)
    return gen, mpd, msd


def init_vocoder_state(
    key,
    h: HiFiGANConfig,
    segment_size: int = 8192,
    weight_norm: bool = True,
    steps_per_epoch: Optional[int] = None,
):
    gen, mpd, msd = make_models(h, weight_norm)
    k1, k2, k3 = jax.random.split(key, 3)
    mel = jnp.zeros((1, segment_size // h.hop_size, h.num_mels))
    wav = jnp.zeros((1, segment_size, 1))
    gen_params = gen.init(k1, mel)
    mpd_params = mpd.init(k2, wav, wav)
    msd_vars = msd.init(k3, wav, wav)
    msd_params = {"params": msd_vars["params"]}
    msd_spectral = msd_vars.get("spectral", {})
    gen_tx, disc_tx = make_vocoder_optimizers(h, steps_per_epoch)
    return (
        gen,
        mpd,
        msd,
        VocoderTrainState(
            step=jnp.asarray(0, jnp.int32),
            gen_params=gen_params,
            mpd_params=mpd_params,
            msd_params=msd_params,
            msd_spectral=msd_spectral,
            gen_opt=gen_tx.init(gen_params),
            disc_opt=disc_tx.init((mpd_params, msd_params)),
        ),
    )


def make_vocoder_train_step(gen: Generator, mpd, msd, h: HiFiGANConfig,
                            steps_per_epoch: Optional[int] = None):
    gen_tx, disc_tx = make_vocoder_optimizers(h, steps_per_epoch)

    def mel_of(wav):
        # wav (B, T, 1) -> (B, n_mels, frames)
        return mel_spectrogram(
            wav[..., 0], h.n_fft, h.num_mels, h.sampling_rate,
            h.hop_size, h.win_size, h.fmin, h.fmax,
        )

    def apply_msd(msd_params, spectral, y, y_hat, update_u: bool):
        variables = {**msd_params, "spectral": spectral}
        if update_u:
            (outs, new_vars) = msd.apply(variables, y, y_hat, mutable=["spectral"])
            return outs, new_vars["spectral"]
        return msd.apply(variables, y, y_hat), spectral

    def disc_loss_fn(disc_params, spectral, gen_params, batch):
        mpd_params, msd_params = disc_params
        y_hat = jax.lax.stop_gradient(gen.apply(gen_params, batch["mel"]))
        y = batch["audio"]
        y_df_r, y_df_g, _, _ = mpd.apply(mpd_params, y, y_hat)
        loss_f, _, _ = discriminator_loss(y_df_r, y_df_g)
        # the running-u buffer updates once per step, in the disc pass
        (y_ds_r, y_ds_g, _, _), new_spectral = apply_msd(
            msd_params, spectral, y, y_hat, update_u=True
        )
        loss_s, _, _ = discriminator_loss(y_ds_r, y_ds_g)
        return loss_f + loss_s, new_spectral

    def gen_loss_fn(gen_params, disc_params, spectral, batch):
        mpd_params, msd_params = disc_params
        y_hat = gen.apply(gen_params, batch["mel"])
        y = batch["audio"]
        mel_l1 = jnp.mean(jnp.abs(mel_of(y_hat) - jnp.swapaxes(batch["mel_loss"], 1, 2))) * 45.0
        _, y_df_g, fmap_f_r, fmap_f_g = mpd.apply(mpd_params, y, y_hat)
        (_, y_ds_g, fmap_s_r, fmap_s_g), _ = apply_msd(msd_params, spectral, y, y_hat, update_u=False)
        loss_fm_f = feature_loss(fmap_f_r, fmap_f_g)
        loss_fm_s = feature_loss(fmap_s_r, fmap_s_g)
        loss_gen_f, _ = generator_loss(y_df_g)
        loss_gen_s, _ = generator_loss(y_ds_g)
        total = loss_gen_f + loss_gen_s + loss_fm_f + loss_fm_s + mel_l1
        return total, {"gen_loss": total, "mel_l1": mel_l1}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: VocoderTrainState, batch):
        disc_params = (state.mpd_params, state.msd_params)
        (d_loss, new_spectral), d_grads = jax.value_and_grad(disc_loss_fn, has_aux=True)(
            disc_params, state.msd_spectral, state.gen_params, batch
        )
        d_updates, disc_opt = disc_tx.update(d_grads, state.disc_opt, disc_params)
        mpd_params, msd_params = optax.apply_updates(disc_params, d_updates)

        (g_loss, aux), g_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.gen_params, (mpd_params, msd_params), new_spectral, batch
        )
        g_updates, gen_opt = gen_tx.update(g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = VocoderTrainState(
            step=state.step + 1,
            gen_params=gen_params, mpd_params=mpd_params, msd_params=msd_params,
            msd_spectral=new_spectral,
            gen_opt=gen_opt, disc_opt=disc_opt,
        )
        metrics = {"disc_loss": d_loss, **aux}
        return new_state, metrics

    return train_step
