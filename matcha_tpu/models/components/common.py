"""Shared neural blocks (flax.linen, channels-last).

All sequence tensors are (B, T, C) — channels on the 128-wide lane
dimension, the TPU-idiomatic layout (the reference uses torch
channels-first (B, C, T); see e.g. matcha/models/components/
text_encoder.py). Convolution wrappers are defined so that torch
Conv1d/ConvTranspose1d weights convert by a pure transpose, which the
checkpoint converter relies on.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Conv1d(nn.Module):
    """1-D convolution over (B, T, C), torch-Conv1d-compatible.

    Torch weight (out, in, k) maps to our kernel (k, in, out) by
    ``w.transpose(2, 1, 0)``.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )
        return conv(x)


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution matching torch.nn.ConvTranspose1d.

    Implemented as an input-dilated convolution with a flipped kernel:
    out_len = (T - 1) * stride - 2 * padding + kernel_size.
    Torch weight (in, out, k) maps to our kernel (k, in, out) by
    ``w[:, :, ::-1].transpose(2, 0, 1)`` (flip + transpose), which the
    converter performs.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
        )
        pad = self.kernel_size - 1 - self.padding
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


def _subpixel_plan(kernel_size: int, stride: int, padding: int):
    """Phase decomposition of a stride-u transposed conv.

    Our ConvTranspose1d computes y[j] = sum_h K[h] * xd[j + h - A] with
    A = k-1-p and xd the u-dilated input. For output phase r = j % u the
    valid taps are h with (r + h - A) % u == 0, reading input offset
    d = (r + h - A) / u. Returns (d_min, L, placements) where placements
    maps (phase, slot_in_L) -> kernel tap h.
    """
    u, k, A = stride, kernel_size, kernel_size - 1 - padding
    placements = []
    d_all = []
    for r in range(u):
        taps = []
        for h in range(k):
            if (r + h - A) % u == 0:
                d = (r + h - A) // u
                taps.append((d, h))
                d_all.append(d)
        placements.append(taps)
    d_min, d_max = min(d_all), max(d_all)
    return d_min, d_max - d_min + 1, placements


def subpixel_conv_transpose1d(x, kernel, bias, stride: int, padding: int,
                              dtype=None):
    """Functional subpixel transposed conv — the shared core of
    :class:`SubPixelConvTranspose1d` and the serving-path helper
    (models/hifigan_pallas.py): one dense conv producing all ``stride``
    output phases along the channel axis, then a depth-to-space
    interleave. Avoids ``lhs_dilation`` zero-stuffing.

    Depth-to-space emits exactly T*stride samples, which equals the
    transposed conv's (T-1)*stride - 2*padding + k only when
    2*padding == k - stride — true for every HiFi-GAN upsample; raises
    otherwise. ``bias=None`` skips the bias add.
    """
    dtype = dtype or x.dtype
    k, cin, cout = kernel.shape
    u = stride
    if 2 * padding != k - u:
        raise ValueError(
            f"subpixel transposed conv requires 2*padding == k - stride "
            f"(got k={k}, stride={u}, padding={padding})")
    d_min, L, placements = _subpixel_plan(k, u, padding)
    # Pack phase sub-kernels along the output-channel axis:
    # W_all[l, :, r*out + o] = kernel[h, :, o] for (d, h) with d-d_min==l.
    # One einsum against a constant 0/1 placement tensor (not a loop of
    # .at[].set()): when the kernel is a traced jit argument — the
    # serving graph passes vocoder params per call — scatter packing
    # would embed up to k dynamic-update-slices per upsample per call.
    M = np.zeros((k, L, u), np.float32)
    for r, taps in enumerate(placements):
        for d, h in taps:
            M[h, d - d_min, r] = 1.0
    # w_all[l, i, (r, o)] = sum_h M[h, l, r] * kernel[h, i, o]
    w_all = jnp.einsum("hlr,hio->liro", jnp.asarray(M, kernel.dtype), kernel)
    w_all = w_all.reshape(L, cin, u * cout)
    x_pad = jnp.pad(x, ((0, 0), (-d_min, L - 1 + d_min), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x_pad.astype(dtype), w_all.astype(dtype), window_strides=(1,),
        padding=[(0, 0)], dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, T, u*cout)
    B, T, _ = y.shape
    y = y.reshape(B, T, u, cout).reshape(B, T * u, cout)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


class SubPixelConvTranspose1d(nn.Module):
    """Transposed conv as a regular conv + depth-to-space interleave.

    Numerically identical to :class:`ConvTranspose1d` (same 'kernel'/'bias'
    params, so converted checkpoints are interchangeable) but avoids
    ``lhs_dilation``, which XLA:TPU executes far less efficiently than a
    dense conv (the vocoder's upsampling path is the hot spot).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return subpixel_conv_transpose1d(
            x, kernel, bias, stride=self.stride, padding=self.padding)


class WNConv1d(nn.Module):
    """Weight-normalised Conv1d: w = g * v / ||v|| (torch weight_norm dim=0).

    Used for vocoder training (the reference trains HiFi-GAN with weight
    norm, matcha/hifigan/models.py); inference folds to a plain Conv1d.
    Torch weight_v (out, in, k) maps to ours (k, in, out); weight_g
    (out, 1, 1) maps to (out,).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        v = self.param(
            "weight_v", nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
        )
        g = self.param("weight_g", nn.initializers.ones, (self.features,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True) + 1e-12)
        w = v * (g[None, None, :] / norm)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalised ConvTranspose1d (torch weight_norm dim=0, which on
    a transposed conv normalises per *input* channel). Torch weight_v
    (in, out, k) maps to ours (k, in, out) flipped; weight_g (in, 1, 1)
    maps to (in,)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        v = self.param(
            "weight_v", nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
        )
        g = self.param("weight_g", nn.initializers.ones, (in_features,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 2), keepdims=True) + 1e-12)
        w = v * (g[None, :, None] / norm)
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis with the reference's eps=1e-4
    (matcha text encoder convention)."""

    channels: int
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return x * gamma + beta


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


class SinusoidalPosEmb(nn.Module):
    """Diffusion-style sinusoidal time embedding (scale 1000)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray, scale: float = 1000.0) -> jnp.ndarray:
        if t.ndim < 1:
            t = t[None]
        half_dim = self.dim // 2
        emb = jnp.log(10000.0) / (half_dim - 1)
        emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        emb = scale * t[:, None] * emb[None, :]
        return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over the sinusoidal embedding (silu in between)."""

    time_embed_dim: int

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        sample = nn.Dense(self.time_embed_dim, name="linear_1")(sample)
        sample = jax.nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, name="linear_2")(sample)
        return sample


def sequence_mask_btc(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T, 1) float mask for channels-last sequence tensors."""
    m = jnp.arange(max_length)[None, :] < lengths[:, None]
    return m[..., None].astype(dtype)
