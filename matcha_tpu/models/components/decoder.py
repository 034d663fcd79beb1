"""CFM estimator: 1-D U-Net over mel frames with transformer blocks.

Rebuild of the reference decoder (matcha/models/components/decoder.py:200-443)
in channels-last flax: input is concat(x_t, mu[, spk]) along channels;
down path = ResnetBlock1D + transformer block(s) + stride-2 conv;
mid = 2x (ResnetBlock1D + transformer); up path mirrors with skip-concat
and transposed-conv upsampling; sinusoidal time embedding (scale 1000)
through a silu MLP conditions every resnet block. GroupNorm statistics
run over the full padded length, exactly like the reference (a parity
requirement for converted checkpoints).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from matcha_tpu.models.components.common import (
    Conv1d,
    ConvTranspose1d,
    SinusoidalPosEmb,
    TimestepEmbedding,
    mish,
)
from matcha_tpu.models.components.transformer import BasicTransformerBlock


class Block1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        h = Conv1d(self.dim_out, 3, padding=1, name="conv")(x * mask)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(h)
        return mish(h) * mask


class ResnetBlock1D(nn.Module):
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, time_emb: jnp.ndarray) -> jnp.ndarray:
        h = Block1D(self.dim_out, self.groups, name="block1")(x, mask)
        h = h + nn.Dense(self.dim_out, name="mlp")(mish(time_emb))[:, None, :]
        h = Block1D(self.dim_out, self.groups, name="block2")(h, mask)
        res = nn.Dense(self.dim_out, name="res_conv")(x * mask)
        return h + res


class Downsample1D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv1d(self.dim, 3, stride=2, padding=1, name="conv")(x)


class Upsample1D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return ConvTranspose1d(self.dim, 4, stride=2, padding=1, name="conv")(x)


class Decoder(nn.Module):
    """U-Net vector-field estimator for conditional flow matching."""

    in_channels: int
    out_channels: int
    channels: Tuple[int, ...] = (256, 256)
    dropout: float = 0.05
    attention_head_dim: int = 64
    n_blocks: int = 1
    num_mid_blocks: int = 2
    num_heads: int = 4
    act_fn: str = "snakebeta"
    mask_mode: str = "additive_reference"
    # block types per U-Net stage: "transformer" (default) or "conformer"
    # (reference decoder.py:318 get_block / ConformerWrapper :161-198)
    down_block_type: str = "transformer"
    mid_block_type: str = "transformer"
    up_block_type: str = "transformer"
    # torch-faithful BatchNorm1d (inference form) in conformer conv modules
    # — set when loading a converted torch conformer checkpoint
    conformer_batch_norm: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray,
        mu: jnp.ndarray,
        t: jnp.ndarray,
        spks: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Args:
            x: (B, T, n_feats) current sample along the flow.
            mask: (B, T, 1) float mask.
            mu: (B, T, n_feats) aligned encoder output.
            t: (B,) or scalar flow time in [0, 1].
            spks: (B, spk_emb_dim) or None.

        Returns:
            (B, T, out_channels) estimated vector field, masked.
        """
        channels = tuple(self.channels)
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (x.shape[0],))
        temb = SinusoidalPosEmb(self.in_channels, name="time_embeddings")(t)
        # The sinusoidal embedding is f32 by construction; cast the MLP
        # output to the activation dtype so a bf16 sampling path is not
        # silently promoted back to f32 at every ResnetBlock bias-add.
        temb = TimestepEmbedding(channels[0] * 4, name="time_mlp")(temb).astype(x.dtype)

        h = jnp.concatenate([x, mu], axis=-1)
        if spks is not None:
            spk_tiled = jnp.broadcast_to(spks[:, None, :], (h.shape[0], h.shape[1], spks.shape[-1]))
            h = jnp.concatenate([h, spk_tiled], axis=-1)

        def run_transformers(h, mask2d, prefix, block_type="transformer"):
            for j in range(self.n_blocks):
                if block_type == "conformer":
                    from matcha_tpu.models.components.conformer import ConformerBlock

                    h = ConformerBlock(
                        h.shape[-1], heads=self.num_heads, dim_head=self.attention_head_dim,
                        ff_mult=1, conv_expansion_factor=2, conv_kernel_size=31,
                        attn_dropout=self.dropout, ff_dropout=self.dropout,
                        conv_dropout=self.dropout,
                        use_batch_norm=self.conformer_batch_norm,
                        name=f"{prefix}_conformer_{j}",
                    )(h, mask2d, deterministic=deterministic)
                elif block_type == "transformer":
                    h = BasicTransformerBlock(
                        h.shape[-1], self.num_heads, self.attention_head_dim,
                        self.dropout, self.act_fn, mask_mode=self.mask_mode,
                        name=f"{prefix}_transformer_{j}",
                    )(h, mask2d, deterministic=deterministic)
                else:
                    raise ValueError(f"Unknown block type {block_type!r}")
            return h

        hiddens = []
        masks = [mask]
        for i, ch in enumerate(channels):
            mask_down = masks[-1]
            h = ResnetBlock1D(ch, name=f"down_{i}_resnet")(h, mask_down, temb)
            h = run_transformers(h, mask_down[:, :, 0], f"down_{i}", self.down_block_type)
            hiddens.append(h)
            is_last = i == len(channels) - 1
            if not is_last:
                h = Downsample1D(ch, name=f"down_{i}_downsample")(h * mask_down)
            else:
                h = Conv1d(ch, 3, padding=1, name=f"down_{i}_downsample")(h * mask_down)
            masks.append(mask_down[:, ::2, :])

        masks = masks[:-1]
        mask_mid = masks[-1]
        for i in range(self.num_mid_blocks):
            h = ResnetBlock1D(channels[-1], name=f"mid_{i}_resnet")(h, mask_mid, temb)
            h = run_transformers(h, mask_mid[:, :, 0], f"mid_{i}", self.mid_block_type)

        up_channels = channels[::-1] + (channels[0],)
        for i in range(len(up_channels) - 1):
            ch = up_channels[i + 1]
            mask_up = masks.pop()
            skip = hiddens.pop()
            h = ResnetBlock1D(ch, name=f"up_{i}_resnet")(
                jnp.concatenate([h, skip], axis=-1), mask_up, temb
            )
            h = run_transformers(h, mask_up[:, :, 0], f"up_{i}", self.up_block_type)
            is_last = i == len(up_channels) - 2
            if not is_last:
                h = Upsample1D(ch, name=f"up_{i}_upsample")(h * mask_up)
            else:
                h = Conv1d(ch, 3, padding=1, name=f"up_{i}_upsample")(h * mask_up)

        h = Block1D(up_channels[-1], name="final_block")(h, mask_up)
        out = nn.Dense(self.out_channels, name="final_proj")(h * mask_up)
        return out * mask
