"""Text encoder: conv prenet + RoPE transformer + duration predictor.

TPU-native rebuild of the reference encoder
(matcha/models/components/text_encoder.py:328-410): same architecture —
scaled embedding, 3-layer conv prenet with residual, 6 post-norm
transformer layers with rotary position embeddings on half the head dims
and conv FFNs, a 1x1 projection to per-phoneme mel means, and a duration
predictor fed a stop-gradient copy — expressed channels-last in flax with
dense projections and einsum attention so the matmuls land on the MXU.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from matcha_tpu.models.components.common import ChannelLayerNorm, Conv1d


def apply_rope(x: jnp.ndarray, d_rope: int, base: float = 10_000.0) -> jnp.ndarray:
    """Rotary position embedding on the first ``d_rope`` feature dims.

    ``x`` is (B, H, T, D). Pair layout follows the labml/GPT-NeoX
    "rotate-half" convention the reference uses
    (text_encoder.py:147-172): dims [0, d/2) pair with [d/2, d).
    """
    B, H, T, D = x.shape
    x_rope, x_pass = x[..., :d_rope], x[..., d_rope:]
    half = d_rope // 2
    theta = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    pos = jnp.arange(T, dtype=jnp.float32)
    angles = pos[:, None] * theta[None, :]  # (T, half)
    cos = jnp.concatenate([jnp.cos(angles), jnp.cos(angles)], axis=-1)  # (T, d_rope)
    sin = jnp.concatenate([jnp.sin(angles), jnp.sin(angles)], axis=-1)
    neg_half = jnp.concatenate([-x_rope[..., half:], x_rope[..., :half]], axis=-1)
    x_rope = x_rope * cos[None, None] + neg_half * sin[None, None]
    return jnp.concatenate([x_rope, x_pass], axis=-1)


class MultiHeadAttention(nn.Module):
    """Self-attention with RoPE on half the head dims (reference
    text_encoder.py:175-246). Padded keys are masked with -1e4."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        k_channels = self.channels // self.n_heads
        q = nn.Dense(self.channels, name="conv_q")(x)
        k = nn.Dense(self.channels, name="conv_k")(x)
        v = nn.Dense(self.channels, name="conv_v")(x)

        def split_heads(t):
            B, T, _ = t.shape
            return t.reshape(B, T, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        d_rope = int(k_channels * 0.5)
        q = apply_rope(q, d_rope)
        k = apply_rope(k, d_rope)

        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(k_channels)
        scores = jnp.where(attn_mask == 0, -1e4, scores)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.p_dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], self.channels)
        return nn.Dense(self.out_channels, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward (k=3) with masking between convs."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = Conv1d(self.filter_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = Conv1d(self.out_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        return x * x_mask


class Encoder(nn.Module):
    """Stack of post-norm attention + conv-FFN layers."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_mask = x_mask[:, None, :, 0][:, :, None, :]  # (B, 1, 1, T) key mask
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            x = x * x_mask
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads, self.p_dropout,
                name=f"attn_layers_{i}",
            )(x, attn_mask, deterministic)
            y = drop(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_layers_1_{i}")(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size, self.p_dropout,
                name=f"ffn_layers_{i}",
            )(x, x_mask, deterministic)
            y = drop(y)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_layers_2_{i}")(x + y)
        return x * x_mask


class ConvReluNorm(nn.Module):
    """Residual conv prenet (3x k=5 conv + channel LN + relu/dropout)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x_org = x
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        for i in range(self.n_layers):
            x = Conv1d(
                self.hidden_channels, self.kernel_size, padding=self.kernel_size // 2,
                name=f"conv_layers_{i}",
            )(x * x_mask)
            x = ChannelLayerNorm(self.hidden_channels, name=f"norm_layers_{i}")(x)
            x = drop(jax.nn.relu(x))
        # Zero-init projection => prenet starts as identity.
        proj = nn.Dense(self.out_channels, kernel_init=nn.initializers.zeros, name="proj")
        x = x_org + proj(x)
        return x * x_mask


class DurationPredictor(nn.Module):
    """Two masked convs + channel LN -> scalar log-duration per token."""

    filter_channels: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        drop = nn.Dropout(self.p_dropout, deterministic=deterministic)
        x = Conv1d(self.filter_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_1")(x * x_mask)
        x = jax.nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name="norm_1")(x)
        x = drop(x)
        x = Conv1d(self.filter_channels, self.kernel_size, padding=self.kernel_size // 2, name="conv_2")(x * x_mask)
        x = jax.nn.relu(x)
        x = ChannelLayerNorm(self.filter_channels, name="norm_2")(x)
        x = drop(x)
        x = nn.Dense(1, name="proj")(x * x_mask)
        return x * x_mask


class TextEncoder(nn.Module):
    """Phoneme ids -> (mu_x, logw, x_mask); all (B, T, .) channels-last."""

    n_vocab: int
    n_feats: int
    n_channels: int = 192
    filter_channels: int = 768
    filter_channels_dp: int = 256
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    prenet: bool = True
    n_spks: int = 1
    spk_emb_dim: int = 64
    dp_kernel_size: int = 3
    dp_p_dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        x_mask: jnp.ndarray,
        spks: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """Args:
            x: (B, T) int phoneme ids.
            x_mask: (B, T, 1) float mask.
            spks: (B, spk_emb_dim) speaker embedding or None.

        Returns:
            mu: (B, T, n_feats), logw: (B, T, 1), both masked.
        """
        emb = nn.Embed(self.n_vocab, self.n_channels, name="emb",
                       embedding_init=nn.initializers.normal(self.n_channels**-0.5))
        h = emb(x) * math.sqrt(self.n_channels)

        if self.prenet:
            h = ConvReluNorm(
                self.n_channels, self.n_channels, kernel_size=5, n_layers=3, p_dropout=0.5,
                name="prenet",
            )(h, x_mask, deterministic)

        if self.n_spks > 1:
            assert spks is not None
            spk_tiled = jnp.broadcast_to(spks[:, None, :], (h.shape[0], h.shape[1], spks.shape[-1]))
            h = jnp.concatenate([h, spk_tiled], axis=-1)

        width = self.n_channels + (self.spk_emb_dim if self.n_spks > 1 else 0)
        h = Encoder(
            width, self.filter_channels, self.n_heads, self.n_layers,
            self.kernel_size, self.p_dropout, name="encoder",
        )(h, x_mask, deterministic)

        mu = nn.Dense(self.n_feats, name="proj_m")(h) * x_mask

        # Duration predictor sees a stop-gradient copy (reference
        # text_encoder.py:407 detaches before proj_w).
        h_dp = jax.lax.stop_gradient(h)
        logw = DurationPredictor(
            self.filter_channels_dp, self.dp_kernel_size, self.dp_p_dropout, name="proj_w",
        )(h_dp, x_mask, deterministic)

        return mu, logw
