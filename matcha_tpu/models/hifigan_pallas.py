"""HiFi-GAN generator forward with Pallas-fused MRF stages (serving path).

Functionally identical to ``Generator.apply`` on folded (inference-form)
params, but each multi-receptive-field stage runs as ONE Pallas kernel
(matcha_tpu/ops/mrf_pallas.py) instead of 18 XLA conv round trips. The
conv_pre / transposed-conv upsamples / conv_post remain XLA (they are
MXU-bound and already efficient); the MRF stacks are the HBM-bandwidth
bottleneck this path removes (PERFORMANCE.md).

Usage (serving): ``wav = generator_apply_pallas(params, config, mel)``
with the same params pytree the flax Generator uses. Selected in the CLI
with ``--pallas-vocoder``. Parity vs the flax path is tested in
tests/test_mrf_pallas.py.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from matcha_tpu.models.hifigan import HiFiGANConfig
from matcha_tpu.ops.mrf_pallas import fused_mrf_stage, mrf_weights_from_params


def _conv1d(x, kernel, bias, padding: int, dtype=None):
    """(B, T, C) 'torch-same' conv with flax kernel (k, in, out)."""
    dtype = dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1,),
        padding=[(padding, padding)], dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + bias.astype(dtype)


def _conv_transpose1d(x, kernel, bias, stride: int, padding: int, dtype=None):
    """Input-dilated transposed conv; kernel already flipped+transposed
    (the converter's ConvTranspose1d layout, checkpoints.py)."""
    dtype = dtype or x.dtype
    k = kernel.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype), window_strides=(1,),
        padding=[(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + bias.astype(dtype)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _xla_mrf_stage(x, blocks, h):
    """Flax-equivalent MRF stage via plain lax convs (fallback for wide
    stages whose weights exceed the Pallas VMEM budget)."""
    num_kernels = len(h.resblock_kernel_sizes)
    xs = None
    for j, (k, dils) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
        p = blocks[j]
        xb = x
        for i, d in enumerate(dils):
            xt = _leaky(xb, 0.1)
            pad = (k * d - d) // 2
            xt = jax.lax.conv_general_dilated(
                xt, p[f"convs1_{i}"]["conv"]["kernel"], (1,), [(pad, pad)],
                rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
            ) + p[f"convs1_{i}"]["conv"]["bias"]
            xt = _leaky(xt, 0.1)
            pad = (k - 1) // 2
            xt = jax.lax.conv_general_dilated(
                xt, p[f"convs2_{i}"]["conv"]["kernel"], (1,), [(pad, pad)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            ) + p[f"convs2_{i}"]["conv"]["bias"]
            xb = xt + xb
        xs = xb if xs is None else xs + xb
    return xs / num_kernels


def generator_apply_pallas(
    variables: dict,
    h: Optional[HiFiGANConfig] = None,
    mel: jnp.ndarray = None,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    max_pallas_channels: int = 128,
    t_tile: Optional[int] = None,
) -> jnp.ndarray:
    """Mel (B, T, num_mels) -> waveform (B, T*hop, 1), tanh output.

    Drop-in for ``Generator(h).apply(variables, mel)`` on folded params.
    Stages wider than ``max_pallas_channels`` fall back to XLA convs
    (their stacked weights alone exceed the 16 MB VMEM budget; they are
    also short in time, so fusion buys little there).
    ``compute_dtype=jnp.bfloat16`` runs the fused matmuls at the MXU's
    bf16 rate (waveform deviation ~1e-3, same as --bf16-vocoder).
    """
    h = h or HiFiGANConfig()
    p = variables["params"]
    num_kernels = len(h.resblock_kernel_sizes)
    lrelu = 0.1

    from matcha_tpu.ops.mrf_pallas import pick_t_tile

    x = _conv1d(mel, p["conv_pre"]["conv"]["kernel"], p["conv_pre"]["conv"]["bias"], padding=3)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        x = _leaky(x, lrelu)
        up = p[f"ups_{i}"]
        x = _conv_transpose1d(x, up["kernel"], up["bias"], stride=u, padding=(k - u) // 2)
        blocks = [p[f"resblocks_{i * num_kernels + j}"] for j in range(num_kernels)]
        C = x.shape[-1]
        if C > max_pallas_channels:
            x = _xla_mrf_stage(x, blocks, h)
            continue
        weights = mrf_weights_from_params(blocks, n_dil=len(h.resblock_dilation_sizes[0]))
        # The Pallas stage computes in f32 VMEM regardless of the serving
        # dtype: Mosaic cannot lower sub-32-bit minor-dim broadcasts (the
        # bias add), and in-kernel bf16 measured no faster anyway (the
        # stage is layout/DMA-bound, not MXU-bound — PERFORMANCE.md). With
        # --bf16-vocoder, only the XLA stages (conv_pre, upsamples, wide
        # MRFs, conv_post) keep the bf16 bandwidth saving.
        act_dtype = x.dtype
        weights = tuple(w.astype(jnp.float32) for w in weights)
        # Pallas stage runs (C, T) lane-major
        x_cf = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
        x_cf = fused_mrf_stage(
            x_cf, weights,
            kernel_sizes=tuple(h.resblock_kernel_sizes),
            dilations=tuple(tuple(d) for d in h.resblock_dilation_sizes),
            t_tile=t_tile or pick_t_tile(C), interpret=interpret,
            compute_dtype=compute_dtype,
        )
        x = jnp.swapaxes(x_cf, 1, 2).astype(act_dtype)
    x = _leaky(x, 0.01)  # torch default slope before conv_post (models.py:193)
    x = _conv1d(x, p["conv_post"]["conv"]["kernel"], p["conv_post"]["conv"]["bias"], padding=3)
    return jnp.tanh(x)
