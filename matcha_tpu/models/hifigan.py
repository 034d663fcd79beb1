"""HiFi-GAN vocoder (generator + discriminators + GAN losses) in flax.

Rebuild of the reference vocoder (matcha/hifigan/models.py) channels-last:
Generator = conv_pre(80 -> 512, k7) -> 4x [leaky_relu -> transposed-conv
upsample x(8,8,2,2)] each followed by a multi-receptive-field fusion
(mean of 3 ResBlock1 with k in {3,7,11}, dilations (1,3,5)) -> leaky_relu
-> conv_post -> tanh. Weight norm is folded into plain conv weights at
checkpoint-conversion time (the reference's remove_weight_norm path,
models.py:199-206), which is the inference-optimal form for XLA.

Note the reference's final activation before conv_post uses torch's
default leaky-relu slope 0.01, not 0.1 (models.py:193) — kept.
"""

from dataclasses import dataclass, field
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from matcha_tpu.models.components.common import (
    Conv1d,
    ConvTranspose1d,
    SubPixelConvTranspose1d,
    WNConv1d,
    WNConvTranspose1d,
    leaky_relu,
)

LRELU_SLOPE = 0.1


@dataclass
class HiFiGANConfig:
    """v1 hyperparameters (reference matcha/hifigan/config.py:1-28)."""

    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 22050
    hop_size: int = 256
    segment_size: int = 8192
    n_fft: int = 1024
    win_size: int = 1024
    fmin: float = 0.0
    fmax: float = 8000.0
    # vocoder-training protocol (reference config.py)
    batch_size: int = 16
    learning_rate: float = 0.0004
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    seed: int = 1234


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    """MRF residual block: 3x (dilated conv -> plain conv), each pair in a
    leaky-relu sandwich with a residual."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = WNConv1d if self.weight_norm else Conv1d
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = conv(
                self.channels, self.kernel_size, dilation=d,
                padding=get_padding(self.kernel_size, d), name=f"convs1_{i}",
            )(xt)
            xt = leaky_relu(xt, LRELU_SLOPE)
            xt = conv(
                self.channels, self.kernel_size, dilation=1,
                padding=get_padding(self.kernel_size, 1), name=f"convs2_{i}",
            )(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv = WNConv1d if self.weight_norm else Conv1d
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x, LRELU_SLOPE)
            xt = conv(
                self.channels, self.kernel_size, dilation=d,
                padding=get_padding(self.kernel_size, d), name=f"convs_{i}",
            )(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """Mel (B, T, 80) -> waveform (B, T*256, 1), tanh output.

    ``weight_norm=True`` uses the (g, v) parameterisation for training
    (the reference trains with weight norm and folds it for inference,
    models.py:199-206); the default is the folded/plain form.
    """

    config: HiFiGANConfig = field(default_factory=HiFiGANConfig)
    weight_norm: bool = False
    # 'dilated' = lhs_dilation conv transpose; 'subpixel' = dense conv +
    # depth-to-space interleave (numerically identical; measured within 5%
    # of each other on v5e — the vocoder is bandwidth-bound in the MRF
    # stacks, not upsample-bound; see PERFORMANCE.md).
    upsample_impl: str = "dilated"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.config
        num_kernels = len(h.resblock_kernel_sizes)
        resblock_cls = ResBlock1 if h.resblock == "1" else ResBlock2
        conv = WNConv1d if self.weight_norm else Conv1d
        if self.weight_norm:
            conv_t = WNConvTranspose1d
        else:
            conv_t = SubPixelConvTranspose1d if self.upsample_impl == "subpixel" else ConvTranspose1d

        x = conv(h.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            x = leaky_relu(x, LRELU_SLOPE)
            ch = h.upsample_initial_channel // (2 ** (i + 1))
            x = conv_t(ch, k, stride=u, padding=(k - u) // 2, name=f"ups_{i}")(x)
            xs = None
            for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
                block = resblock_cls(ch, rk, tuple(rd), weight_norm=self.weight_norm,
                                     name=f"resblocks_{i * num_kernels + j}")
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope here
        x = conv(1, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)


class Conv2dNCHW(nn.Module):
    """2-D conv over (B, H, W, C) matching torch Conv2d semantics.

    ``weight_norm=True`` uses the torch weight_norm(dim=0) (g, v)
    parameterisation — the reference's MPD convs train weight-normed
    (models.py:251-262)."""

    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if not self.weight_norm:
            return nn.Conv(
                self.features,
                kernel_size=self.kernel_size,
                strides=self.stride,
                padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
                name="conv",
            )(x)
        kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        v = self.param("weight_v", nn.initializers.lecun_normal(), (kh, kw, in_ch, self.features))
        g = self.param("weight_g", nn.initializers.ones, (self.features,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1, 2), keepdims=True))
        w = g * v / norm
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias


class WNGroupedConv1d(nn.Module):
    """Grouped 1-D conv with torch weight_norm(dim=0) parameterisation
    (the reference's non-spectral MSD convs, models.py:311-324)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_per_group = x.shape[-1] // self.groups
        v = self.param(
            "weight_v", nn.initializers.lecun_normal(),
            (self.kernel_size, in_per_group, self.features),
        )
        g = self.param("weight_g", nn.initializers.ones, (self.features,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True))
        w = g * v / norm
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=[(self.padding, self.padding)],
            feature_group_count=self.groups, dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias


class DiscriminatorP(nn.Module):
    """Period discriminator: fold time into (T/p, p) and run 2-D convs."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        # x: (B, T, 1)
        fmap = []
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)  # (B, H, W, C)

        channels = (32, 128, 512, 1024)
        for i, ch in enumerate(channels):
            x = Conv2dNCHW(
                ch, (self.kernel_size, 1), (self.stride, 1),
                (get_padding(5, 1), 0), weight_norm=self.weight_norm, name=f"convs_{i}",
            )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = Conv2dNCHW(1024, (self.kernel_size, 1), (1, 1), (2, 0),
                       weight_norm=self.weight_norm, name="convs_4")(x)
        x = leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = Conv2dNCHW(1, (3, 1), (1, 1), (1, 0), weight_norm=self.weight_norm, name="conv_post")(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


def _spectral_normalize(kernel: jnp.ndarray, n_iters: int = 7) -> jnp.ndarray:
    """Divide a conv kernel by its spectral norm (largest singular value of
    the (out, rest) matricisation), estimated by stateless power iteration
    from a fixed start — the pure-functional analog of torch
    spectral_norm's running-u estimate."""
    out_dim = kernel.shape[-1]
    w = kernel.reshape(-1, out_dim)  # (rest, out)
    u = jnp.full((out_dim,), 1.0 / jnp.sqrt(out_dim), dtype=kernel.dtype)
    for _ in range(n_iters):
        v = w @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w.T @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = v @ (w @ u)
    return kernel / (sigma + 1e-12)


class SNConv1d(nn.Module):
    """Spectral-normalised 1-D conv (grouped).

    ``running_u=False`` (default): stateless 7-iteration power method from
    a fixed start — exact enough for inference/conversion.
    ``running_u=True``: torch-parity training mode — a persistent ``u``
    vector in the ``"spectral"`` variable collection, ONE power iteration
    per forward, updated when the collection is mutable (the analog of
    torch spectral_norm's buffer update under no_grad,
    reference models.py:311)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    groups: int = 1
    running_u: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_per_group = x.shape[-1] // self.groups
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, in_per_group, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.running_u:
            out_dim = kernel.shape[-1]
            u_var = self.variable(
                "spectral", "u",
                lambda: jnp.full((out_dim,), 1.0 / jnp.sqrt(out_dim), dtype=kernel.dtype),
            )
            wmat = jax.lax.stop_gradient(kernel).reshape(-1, out_dim)  # (rest, out)
            u = u_var.value
            v = wmat @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = wmat.T @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
            if not self.is_initializing() and self.is_mutable_collection("spectral"):
                u_var.value = u
            # sigma keeps the gradient path through the kernel (u, v are
            # detached buffers, like torch)
            sigma = v @ (kernel.reshape(-1, out_dim) @ u)
            w = kernel / (sigma + 1e-12)
        else:
            w = _spectral_normalize(kernel)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(self.stride,), padding=[(self.padding, self.padding)],
            feature_group_count=self.groups, dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias


class DiscriminatorS(nn.Module):
    """Scale discriminator: grouped 1-D convs on the raw waveform.

    The reference's first MSD discriminator is spectral-normalised
    (models.py:311); the rest use weight norm (models.py:311-324 —
    ``weight_norm=True`` for training, folded/plain for inference)."""

    use_spectral_norm: bool = False
    weight_norm: bool = False
    running_u: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        fmap = []
        specs = [
            (128, 15, 1, 7, 1),
            (128, 41, 2, 20, 4),
            (256, 41, 2, 20, 16),
            (512, 41, 4, 20, 16),
            (1024, 41, 4, 20, 16),
            (1024, 41, 1, 20, 16),
            (1024, 5, 1, 2, 1),
        ]
        for i, (ch, k, s, p, g) in enumerate(specs):
            if self.use_spectral_norm:
                x = SNConv1d(ch, k, s, p, g, running_u=self.running_u, name=f"convs_{i}")(x)
            elif self.weight_norm:
                x = WNGroupedConv1d(ch, k, s, p, g, name=f"convs_{i}")(x)
            else:
                x = nn.Conv(
                    ch, (k,), strides=(s,), padding=[(p, p)], feature_group_count=g,
                    name=f"convs_{i}",
                )(x)
            x = leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        if self.use_spectral_norm:
            x = SNConv1d(1, 3, 1, 1, running_u=self.running_u, name="conv_post")(x)
        elif self.weight_norm:
            x = WNGroupedConv1d(1, 3, 1, 1, name="conv_post")(x)
        else:
            x = nn.Conv(1, (3,), padding=[(1, 1)], name="conv_post")(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def avg_pool1d(x: jnp.ndarray, window: int = 4, stride: int = 2, padding: int = 2) -> jnp.ndarray:
    """torch AvgPool1d(count_include_pad=True) on (B, T, C)."""
    x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    n_out = (x.shape[1] - window) // stride + 1
    idx = jnp.arange(n_out)[:, None] * stride + jnp.arange(window)[None, :]
    return x[:, idx, :].mean(axis=2)


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    weight_norm: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, weight_norm=self.weight_norm, name=f"discriminators_{i}")
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class MultiScaleDiscriminator(nn.Module):
    weight_norm: bool = False
    running_u: bool = False

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = avg_pool1d(y)
                y_hat = avg_pool1d(y_hat)
            d = DiscriminatorS(use_spectral_norm=(i == 0), weight_norm=self.weight_norm,
                               running_u=self.running_u, name=f"discriminators_{i}")
            y_d_r, fmap_r = d(y)
            y_d_g, fmap_g = d(y_hat)
            y_d_rs.append(y_d_r)
            fmap_rs.append(fmap_r)
            y_d_gs.append(y_d_g)
            fmap_gs.append(fmap_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r: List, fmap_g: List) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real_outputs: List, disc_generated_outputs: List):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean((1 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: List):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - dg) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
