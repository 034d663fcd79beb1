"""Conformer block (the reference decoder's optional block type).

The reference wraps the external ``conformer`` package's ConformerBlock
(matcha/models/components/decoder.py:161-198 ``ConformerWrapper``,
selected by ``down_block_type/mid_block_type/up_block_type='conformer'``,
:318 ``get_block``). This is a from-scratch flax implementation of the
same architecture (lucidrains conformer semantics):

    x = x + 0.5 * FF(x)          # half-step feed-forward
    x = x + MHSA(x)              # with Shaw-style relative position bias
    x = x + ConvModule(x)        # pointwise-GLU -> depthwise k=31 -> swish
    x = x + 0.5 * FF(x)
    x = LayerNorm(x)

TPU notes: by default the conv module's torch BatchNorm1d is replaced by
GroupNorm (channel-wise, stateless) — batch statistics are a poor fit for
masked variable-length sequences under jit, and no published Matcha
checkpoint uses the conformer path. For converting a torch conformer
checkpoint, ``use_batch_norm=True`` selects the torch-faithful
BatchNorm1d inference form instead (running stats frozen in the
``batch_stats`` collection — ``nn.BatchNorm(use_running_average=True)``;
conversion rule: utils/checkpoints.py ``_convert_conformer_block``).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(x)


class ConformerFeedForward(nn.Module):
    dim: int
    mult: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(self.dim * self.mult, name="ff1")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.dim, name="ff2")(h)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)


class ConformerAttention(nn.Module):
    """Pre-norm MHSA with Shaw relative-position bias on the scores.

    ``combined_mask``: lucidrains/torch semantics — mask query AND key
    positions (a fully-masked query row softmaxes to uniform attention
    over everything instead of attending to valid keys). The default
    masks keys only (padded queries attend to valid content; their rows
    are zeroed by the block's output mask anyway).
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    max_pos_emb: int = 512
    combined_mask: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B, T, _ = x.shape
        inner = self.heads * self.dim_head
        h = nn.LayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(h)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            return t.reshape(B, T, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        scale = self.dim_head ** -0.5
        scores = jnp.einsum("bhid,bhjd->bhij", q, k) * scale

        # Shaw-style relative positional bias: q_i . rel_emb[i - j]
        # (lucidrains conformer distance convention, which converted torch
        # checkpoints depend on)
        pos = jnp.arange(T)
        rel = jnp.clip(pos[:, None] - pos[None, :], -self.max_pos_emb, self.max_pos_emb) + self.max_pos_emb
        rel_emb = nn.Embed(2 * self.max_pos_emb + 1, self.dim_head, name="rel_pos_emb")(rel)
        scores = scores + jnp.einsum("bhid,ijd->bhij", q, rel_emb) * scale

        if mask is not None:
            big_neg = jnp.finfo(scores.dtype).min
            keep = (mask[:, None, :, None] * mask[:, None, None, :]
                    if self.combined_mask else mask[:, None, None, :])
            scores = jnp.where(keep > 0, scores, big_neg)
        attn = nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class ConformerConvModule(nn.Module):
    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0
    #: torch-faithful BatchNorm1d (inference running-stats form) instead of
    #: the stateless GroupNorm default — required for torch conformer
    #: checkpoint conversion (see module docstring)
    use_batch_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inner = self.dim * self.expansion_factor
        h = nn.LayerNorm(name="norm")(x)
        h = nn.Dense(inner * 2, name="pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * nn.sigmoid(b)  # GLU
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(inner, (self.kernel_size,), padding=[(pad, self.kernel_size - 1 - pad)],
                    feature_group_count=inner, name="depthwise")(h)
        if self.use_batch_norm:
            # torch BatchNorm1d eval semantics: frozen running mean/var
            # (batch_stats collection), eps 1e-5 — weight-compatible with
            # the reference's conv.net.5 (lucidrains ConformerConvModule)
            h = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             name="bn")(h)
        else:
            # stateless channel norm in place of torch BatchNorm1d (see
            # module docstring)
            h = nn.GroupNorm(num_groups=1, name="bn")(h)
        h = swish(h)
        h = nn.Dense(self.dim, name="pw2")(h)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)


class ConformerBlock(nn.Module):
    """Drop-in alternative to BasicTransformerBlock in the CFM U-Net
    (same (x, mask2d) -> x contract)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 1
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    use_batch_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask2d: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = x + 0.5 * ConformerFeedForward(self.dim, self.ff_mult, self.ff_dropout,
                                           name="ff1")(x, deterministic)
        x = x + ConformerAttention(self.dim, self.heads, self.dim_head, self.attn_dropout,
                                   combined_mask=self.use_batch_norm,
                                   name="attn")(x, mask2d, deterministic)
        x = x + ConformerConvModule(self.dim, self.conv_expansion_factor,
                                    self.conv_kernel_size, self.conv_dropout,
                                    use_batch_norm=self.use_batch_norm,
                                    name="conv")(x, deterministic)
        x = x + 0.5 * ConformerFeedForward(self.dim, self.ff_mult, self.ff_dropout,
                                           name="ff2")(x, deterministic)
        x = nn.LayerNorm(name="post_norm")(x)
        # torch-faithful (conversion) mode leaves padded rows unmasked like
        # the reference block stack (the surrounding U-Net masks at stage
        # boundaries, reference decoder.py:406,438-442); their values flow
        # into valid frames through the next block's depthwise conv, so
        # zeroing them here would break converted-checkpoint parity at
        # n_blocks > 1.
        if mask2d is not None and not self.use_batch_norm:
            x = x * mask2d[..., None]
        return x
