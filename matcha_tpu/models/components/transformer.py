"""Decoder transformer block (diffusers-style) with snake-beta FFN.

Rebuild of the reference block (matcha/models/components/transformer.py):
pre-norm self-attention (inner dim = heads * head_dim, projected back to
``dim``) followed by a feed-forward whose input projection is the
SnakeBeta activation ``x + 1/b sin^2(a x)`` with per-channel log-scale
parameters.

Parity quirk, kept deliberately: the reference passes a raw 0/1 float
mask that diffusers *adds* to the attention scores (baddbmm with beta=1 —
see SURVEY.md §2 notes), i.e. valid keys get +1 and padded keys +0
instead of -inf. Converted checkpoints were trained under this behaviour,
so we reproduce it exactly.
"""

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class SnakeBeta(nn.Module):
    """Projection + snake-beta activation with log-scale alpha/beta."""

    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_features, name="proj")(x)
        alpha = self.param("alpha", nn.initializers.zeros, (self.out_features,))
        beta = self.param("beta", nn.initializers.zeros, (self.out_features,))
        a = jnp.exp(alpha)
        b = jnp.exp(beta)
        return x + (1.0 / (b + 1e-9)) * jnp.sin(x * a) ** 2


class GELU(nn.Module):
    out_features: int
    approximate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.out_features, name="proj")(x)
        return jax.nn.gelu(x, approximate=self.approximate)


class GEGLU(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.out_features * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0
    activation_fn: str = "snakebeta"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inner = self.dim * self.mult
        if self.activation_fn == "snakebeta":
            x = SnakeBeta(inner, name="act")(x)
        elif self.activation_fn == "gelu":
            x = GELU(inner, name="act")(x)
        elif self.activation_fn == "gelu-approximate":
            x = GELU(inner, approximate=True, name="act")(x)
        elif self.activation_fn == "geglu":
            x = GEGLU(inner, name="act")(x)
        else:
            raise ValueError(f"Unknown activation_fn {self.activation_fn!r}")
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.dim, name="proj_out")(x)


class Attention(nn.Module):
    """diffusers-compatible attention: q/k/v without bias, output proj with
    bias; scale 1/sqrt(head_dim); additive float mask (see module doc).

    ``mask_mode``:
      * "additive_reference" (default): the 0/1 mask is ADDED to the
        scores — bit-faithful to the reference/diffusers behaviour that
        converted checkpoints were trained under;
      * "proper": padded keys get -1e9 (recommended for models trained
        from scratch with this framework).
    """

    query_dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    mask_mode: str = "additive_reference"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)

        B, T, _ = x.shape

        def split(t):
            return t.reshape(B, T, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(self.dim_head)
        if attention_mask is not None:
            if self.mask_mode == "proper":
                scores = jnp.where(attention_mask[:, None, None, :] == 0, -1e9, scores)
            else:
                scores = scores + attention_mask[:, None, None, :]
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, inner)
        out = nn.Dense(self.query_dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class BasicTransformerBlock(nn.Module):
    dim: int
    num_attention_heads: int
    attention_head_dim: int
    dropout: float = 0.0
    activation_fn: str = "snakebeta"
    mask_mode: str = "additive_reference"

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        timestep: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        del timestep  # AdaLayerNorm variants are unused in the default config
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(hidden_states)
        attn_out = Attention(
            self.dim, self.num_attention_heads, self.attention_head_dim, self.dropout,
            mask_mode=self.mask_mode, name="attn1",
        )(h, attention_mask, deterministic)
        hidden_states = attn_out + hidden_states

        h = nn.LayerNorm(epsilon=1e-5, name="norm3")(hidden_states)
        ff_out = FeedForward(self.dim, dropout=self.dropout, activation_fn=self.activation_fn, name="ff")(
            h, deterministic
        )
        return ff_out + hidden_states
