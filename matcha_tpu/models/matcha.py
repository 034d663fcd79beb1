"""MatchaTTS: top-level model wiring encoder + OT-CFM decoder.

TPU-native rebuild of the reference model (matcha/models/matcha_tts.py):
``synthesise`` runs text -> durations -> alignment expansion -> CFM Euler
sampling in one jittable graph with static bucket shapes (no host sync;
the reference breaks the graph per utterance at
matcha_tts.py:122/fix_len_compatibility), and ``losses`` computes the
three training losses (duration via on-device MAS, prior, CFM) without
the reference's GPU->CPU MAS round-trip (matcha_tts.py:191) or the
Python per-sample segment-cut loop (matcha_tts.py:204-218), which here is
a vmapped ``dynamic_slice``.
"""

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from matcha_tpu.models.components.decoder import Decoder
from matcha_tpu.models.components.flow_matching import cfm_loss, cfm_sample
from matcha_tpu.models.components.text_encoder import TextEncoder
from matcha_tpu.ops.mas import maximum_path
from matcha_tpu.ops.seq import denormalize, duration_loss, generate_path, sequence_mask

LOG_2PI = math.log(2 * math.pi)


class MatchaTTS(nn.Module):
    """Non-autoregressive TTS with OT-CFM decoding (channels-last)."""

    n_vocab: int = 178
    n_spks: int = 1
    spk_emb_dim: int = 64
    n_feats: int = 80
    # encoder
    enc_n_channels: int = 192
    enc_filter_channels: int = 768
    enc_filter_channels_dp: int = 256
    enc_n_heads: int = 2
    enc_n_layers: int = 6
    enc_kernel_size: int = 3
    enc_p_dropout: float = 0.1
    enc_prenet: bool = True
    dp_kernel_size: int = 3
    # decoder (CFM estimator U-Net)
    dec_channels: tuple = (256, 256)
    dec_dropout: float = 0.05
    dec_attention_head_dim: int = 64
    dec_n_blocks: int = 1
    dec_num_mid_blocks: int = 2
    dec_num_heads: int = 2
    dec_act_fn: str = "snakebeta"
    # "transformer" | "conformer" per U-Net stage (reference decoder.py:318)
    dec_down_block_type: str = "transformer"
    dec_mid_block_type: str = "transformer"
    dec_up_block_type: str = "transformer"
    # torch-faithful BatchNorm1d in conformer conv modules (checkpoint
    # conversion sets this when the state dict carries running stats)
    dec_conformer_batch_norm: bool = False
    # "additive_reference" keeps the reference/diffusers 0/1-additive mask
    # quirk (needed for converted checkpoints); "proper" masks padded keys.
    dec_mask_mode: str = "additive_reference"
    # cfm
    sigma_min: float = 1e-4
    # losses
    prior_loss: bool = True
    # rematerialize the CFM estimator in the backward pass (trade FLOPs
    # for HBM; enables bigger batches/longer mels than the reference's
    # out_size segment-cut hack)
    remat: bool = False
    # data statistics (stored with the model like the reference's buffers,
    # baselightningmodule.py:20-28)
    mel_mean: float = 0.0
    mel_std: float = 1.0

    def setup(self):
        self.encoder = TextEncoder(
            n_vocab=self.n_vocab,
            n_feats=self.n_feats,
            n_channels=self.enc_n_channels,
            filter_channels=self.enc_filter_channels,
            filter_channels_dp=self.enc_filter_channels_dp,
            n_heads=self.enc_n_heads,
            n_layers=self.enc_n_layers,
            kernel_size=self.enc_kernel_size,
            p_dropout=self.enc_p_dropout,
            prenet=self.enc_prenet,
            n_spks=self.n_spks,
            spk_emb_dim=self.spk_emb_dim,
            dp_kernel_size=self.dp_kernel_size,
            dp_p_dropout=self.enc_p_dropout,
        )
        in_channels = 2 * self.n_feats + (self.spk_emb_dim if self.n_spks > 1 else 0)
        self.decoder = Decoder(
            in_channels=in_channels,
            out_channels=self.n_feats,
            channels=tuple(self.dec_channels),
            dropout=self.dec_dropout,
            attention_head_dim=self.dec_attention_head_dim,
            n_blocks=self.dec_n_blocks,
            num_mid_blocks=self.dec_num_mid_blocks,
            num_heads=self.dec_num_heads,
            act_fn=self.dec_act_fn,
            mask_mode=self.dec_mask_mode,
            down_block_type=self.dec_down_block_type,
            mid_block_type=self.dec_mid_block_type,
            up_block_type=self.dec_up_block_type,
            conformer_batch_norm=self.dec_conformer_batch_norm,
        )
        if self.n_spks > 1:
            self.spk_emb = nn.Embed(self.n_spks, self.spk_emb_dim)

    def _estimator(self, deterministic: bool):
        def fn(x, mask, mu, t, spks):
            return self.decoder(x, mask, mu, t, spks, deterministic=deterministic)

        return fn

    def _speaker(self, spks: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
        if self.n_spks > 1:
            return self.spk_emb(spks.astype(jnp.int32))
        return None

    def __call__(self, x, x_lengths, y, y_lengths, key, spks=None, out_size=None):
        """Training entry (flax __call__ for init); returns the 3 losses."""
        return self.losses(x, x_lengths, y, y_lengths, key, spks, out_size)

    def encode(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        spks: Optional[jnp.ndarray] = None,
        length_scale: float = 1.0,
    ):
        """Stage 1: text -> (mu_x, scaled durations, predicted mel lengths).

        Jittable per x-bucket; the returned ``y_lengths`` is the only value
        the host needs to pick the mel bucket for :meth:`decode` (a single
        (B,) int transfer — the reference instead syncs to the host inside
        synthesise via fix_len_compatibility, matcha_tts.py:122).
        """
        spk_emb = self._speaker(spks)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[..., None]
        mu_x, logw = self.encoder(x, x_mask, spk_emb, deterministic=True)
        # Clamp durations so untrained/garbage weights can't overflow the
        # int32 length math (exp of a large logit -> inf).
        w = jnp.exp(jnp.minimum(logw, 11.0)) * x_mask
        w_ceil = jnp.ceil(w) * length_scale
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), min=1.0, max=2.0**30).astype(jnp.int32)
        return mu_x, w_ceil, y_lengths

    def decode(
        self,
        mu_x: jnp.ndarray,
        w_ceil: jnp.ndarray,
        x_lengths: jnp.ndarray,
        y_lengths: jnp.ndarray,
        key: jax.Array,
        n_timesteps: int = 10,
        temperature: float = 1.0,
        spks: Optional[jnp.ndarray] = None,
        y_max_length: int = 1024,
        compute_dtype: Optional[Any] = None,
    ) -> Dict[str, Any]:
        """Stage 2: expand durations to ``y_max_length`` frames and sample
        the CFM flow. Jittable per (x-bucket, y-bucket) pair.

        ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the CFM Euler loop —
        the latency-dominant 10 U-Net evaluations — in that dtype; pair it
        with a decoder param subtree cast to the same dtype (TTSPipeline
        ``bf16_latency``). Duration/alignment math stays f32 (frame counts
        above 256 are not exactly representable in bf16) and the returned
        mel is f32."""
        spk_emb = self._speaker(spks)
        x_mask = sequence_mask(x_lengths, mu_x.shape[1]).astype(jnp.float32)[..., None]
        y_lengths = jnp.minimum(y_lengths, y_max_length).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, y_max_length).astype(jnp.float32)[..., None]
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]
        attn = generate_path(w_ceil[:, :, 0], attn_mask)
        mu_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)

        estimator = self._estimator(deterministic=True)
        if self.is_initializing():
            # Create decoder params OUTSIDE the scan (params created inside
            # a lax.scan body leak tracers into the variable dict).
            decoder_outputs = estimator(mu_y, y_mask, mu_y, jnp.zeros((mu_y.shape[0],)), spk_emb)
        else:
            decoder_outputs = cfm_sample(
                estimator, key,
                mu_y if compute_dtype is None else mu_y.astype(compute_dtype),
                y_mask if compute_dtype is None else y_mask.astype(compute_dtype),
                n_timesteps, temperature,
                spk_emb if spk_emb is None or compute_dtype is None
                else spk_emb.astype(compute_dtype),
            ).astype(jnp.float32)
        mel = denormalize(jnp.swapaxes(decoder_outputs, 1, 2), self.mel_mean, self.mel_std)
        return {
            "encoder_outputs": jnp.swapaxes(mu_y, 1, 2),
            "decoder_outputs": jnp.swapaxes(decoder_outputs, 1, 2),
            "attn": attn,
            "mel": mel,
            "mel_lengths": y_lengths,
        }

    def synthesise(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        key: jax.Array,
        n_timesteps: int = 10,
        temperature: float = 1.0,
        spks: Optional[jnp.ndarray] = None,
        length_scale: float = 1.0,
        y_max_length: int = 1024,
        compute_dtype: Optional[Any] = None,
    ) -> Dict[str, Any]:
        """Generate mel-spectrograms from phoneme ids.

        Static shapes: (B, T_x) input bucket and ``y_max_length`` output
        bucket; true lengths are carried in ``x_lengths`` and the returned
        ``mel_lengths``. Everything here jits into a single XLA graph.

        Args:
            x: (B, T_x) phoneme ids.
            x_lengths: (B,) true lengths.
            key: PRNG key for the terminal-noise draw.
            n_timesteps: Euler steps (static).
            temperature: stddev of the terminal distribution.
            spks: (B,) speaker ids when n_spks > 1.
            length_scale: speaking-rate control (>1 = slower).
            y_max_length: static mel-frame bucket (multiple of 4).
            compute_dtype: optional dtype (e.g. bf16) for the CFM Euler
                loop — see :meth:`decode`. Encoder/duration math stays f32.

        Returns:
            dict with encoder_outputs, decoder_outputs, attn, mel (denormalized),
            mel_lengths — mirroring the reference's synthesise contract
            (matcha_tts.py:73-148), all channel-first (B, n_feats, T) at the
            boundary for drop-in compatibility.
        """
        spk_emb = self._speaker(spks)
        x_mask = sequence_mask(x_lengths, x.shape[1]).astype(jnp.float32)[..., None]
        mu_x, logw = self.encoder(x, x_mask, spk_emb, deterministic=True)

        # Same duration clamp as encode(): exp of an untrained/garbage logit
        # can overflow -> inf w_ceil -> generate_path cumsum saturation. The
        # fused and two-stage paths must harden identically (they are
        # asserted equivalent in tests/test_model_smoke.py).
        w = jnp.exp(jnp.minimum(logw, 11.0)) * x_mask
        w_ceil = jnp.ceil(w) * length_scale
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), min=1.0, max=2.0**30)
        y_lengths = jnp.minimum(y_lengths, float(y_max_length)).astype(jnp.int32)

        y_mask = sequence_mask(y_lengths, y_max_length).astype(jnp.float32)[..., None]
        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]  # (B, Tx, Ty)
        attn = generate_path(w_ceil[:, :, 0], attn_mask)

        mu_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)

        estimator = self._estimator(deterministic=True)
        if self.is_initializing():
            decoder_outputs = estimator(mu_y, y_mask, mu_y, jnp.zeros((mu_y.shape[0],)), spk_emb)
        else:
            decoder_outputs = cfm_sample(
                estimator, key,
                mu_y if compute_dtype is None else mu_y.astype(compute_dtype),
                y_mask if compute_dtype is None else y_mask.astype(compute_dtype),
                n_timesteps, temperature,
                spk_emb if spk_emb is None or compute_dtype is None
                else spk_emb.astype(compute_dtype),
            ).astype(jnp.float32)

        mel = denormalize(jnp.swapaxes(decoder_outputs, 1, 2), self.mel_mean, self.mel_std)
        return {
            "encoder_outputs": jnp.swapaxes(mu_y, 1, 2),
            "decoder_outputs": jnp.swapaxes(decoder_outputs, 1, 2),
            "attn": attn,
            "mel": mel,
            "mel_lengths": y_lengths,
        }

    def losses(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        y: jnp.ndarray,
        y_lengths: jnp.ndarray,
        key: jax.Array,
        spks: Optional[jnp.ndarray] = None,
        out_size: Optional[int] = None,
        mas_impl: Optional[str] = None,
        durations: Optional[jnp.ndarray] = None,
    ):
        """Compute (dur_loss, prior_loss, diff_loss) + the alignment.

        Args:
            x: (B, T_x) phoneme ids; x_lengths: (B,).
            y: (B, T_y, n_feats) normalized mel target; y_lengths: (B,).
            key: PRNG key (CFM t/z draws + segment offsets).
            out_size: static segment length (multiple of 4) or None.
            durations: optional (B, T_x) precomputed per-phoneme frame
                counts (datamodule ``load_durations``). When given, the
                alignment comes from ``generate_path`` on them and the MAS
                search (and its log-prior grid) is skipped entirely.
        """
        spk_emb = self._speaker(spks)
        T_x, T_y = x.shape[1], y.shape[1]
        x_mask = sequence_mask(x_lengths, T_x).astype(jnp.float32)[..., None]
        y_mask = sequence_mask(y_lengths, T_y).astype(jnp.float32)[..., None]

        mu_x, logw = self.encoder(x, x_mask, spk_emb, deterministic=not self.has_rng("dropout"))

        attn_mask = x_mask[:, :, 0][:, :, None] * y_mask[:, :, 0][:, None, :]  # (B, Tx, Ty)
        if durations is not None:
            # Supervised alignment from precomputed durations.
            attn = generate_path(durations.astype(jnp.float32) * x_mask[:, :, 0], attn_mask)
        else:
            # Gaussian log-prior grid and MAS (no gradients flow through,
            # reference matcha_tts.py:183-192).
            mu_sg = jax.lax.stop_gradient(mu_x)
            const = -0.5 * LOG_2PI * self.n_feats
            log_prior = (
                jnp.einsum("bxf,byf->bxy", mu_sg, y)
                - 0.5 * jnp.sum(y**2, axis=-1)[:, None, :]
                - 0.5 * jnp.sum(mu_sg**2, axis=-1)[:, :, None]
                + const
            )
            attn = maximum_path(log_prior, attn_mask, impl=mas_impl)  # (B, Tx, Ty)

        logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=-1))[..., None] * x_mask
        dur_loss = duration_loss(logw, logw_, x_lengths)

        # Random segment cut (training memory bound), vmapped dynamic_slice.
        if out_size is not None and out_size < T_y:
            k_seg, key = jax.random.split(key)
            max_offset = jnp.clip(y_lengths - out_size, min=0)
            offsets = jax.random.randint(
                k_seg, (y.shape[0],), 0, jnp.maximum(max_offset, 1)
            )
            y = jax.vmap(
                lambda yb, off: jax.lax.dynamic_slice(yb, (off, 0), (out_size, self.n_feats))
            )(y, offsets)
            attn = jax.vmap(
                lambda ab, off: jax.lax.dynamic_slice(ab, (0, off), (T_x, out_size))
            )(attn, offsets)
            y_cut_lengths = jnp.minimum(y_lengths, out_size)
            y_mask = sequence_mask(y_cut_lengths, out_size).astype(jnp.float32)[..., None]

        mu_y = jnp.einsum("bxy,bxf->byf", attn, mu_x)

        estimator = self._estimator(deterministic=not self.has_rng("dropout"))
        if self.remat and not self.is_initializing():
            estimator = jax.checkpoint(estimator)
        k_cfm = key
        diff_loss, _ = cfm_loss(
            estimator, k_cfm, y, y_mask, mu_y, spk_emb, sigma_min=self.sigma_min
        )

        if self.prior_loss:
            prior = jnp.sum(0.5 * ((y - mu_y) ** 2 + LOG_2PI) * y_mask)
            prior = prior / (jnp.sum(y_mask) * self.n_feats)
        else:
            prior = 0.0

        return dur_loss, prior, diff_loss, attn
