"""HiFi-GAN generator forward with Pallas-fused MRF stages (serving path).

Functionally identical to ``Generator.apply`` on folded (inference-form)
params, but the NARROW multi-receptive-field stages (C <= 64) run as ONE
Pallas kernel each (matcha_tpu/ops/mrf_pallas.py). Where each stage goes
is measured, not assumed (scripts/profile_vocoder_stages.py, honest
in-graph prefix deltas at B=8):

  * C >= 128 stages stay XLA — XLA's conv pipeline runs them at
    ~80-94% of the MXU bf16 rate (mrf_0 C=256: 5.8 ms; mrf_1 C=128:
    13.7 ms XLA vs 19.3 ms Pallas), so fusing them is a LOSS.
  * C in {32, 64} stages are MXU-geometry-bound (a conv's matmul has
    M = C_out rows, so a 32-channel conv fills 25% of the 128x128
    systolic array) — there XLA collapses (mrf_3 C=32: 51.5 ms) and
    the fused Pallas kernel wins 1.3-2.7x (18.3 / 19.1 ms).

conv_pre / transposed-conv upsamples / conv_post remain XLA (0.5-2 ms
each; a phase-decomposed "subpixel" transposed conv measured neutral —
XLA strength-reduces lhs_dilation fine; kept opt-in for reference).

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


def _conv_transpose1d_subpixel(x, kernel, bias, stride: int, padding: int, dtype=None):
    """Same math as :func:`_conv_transpose1d` but phase-decomposed (no
    ``lhs_dilation`` zero-stuffing) — delegates to the shared functional
    core in components/common.py (also used by SubPixelConvTranspose1d)."""
    from matcha_tpu.models.components.common import subpixel_conv_transpose1d

    return subpixel_conv_transpose1d(x, kernel, bias, stride=stride,
                                     padding=padding, dtype=dtype)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _xla_mrf_stage(x, blocks, h):
    """Flax-equivalent MRF stage via plain lax convs (fallback for wide
    stages whose weights exceed the Pallas VMEM budget). Kernels follow
    x's dtype like the other helpers here, so mixed f32-params/bf16-mel
    callers of generator_apply_pallas don't trip lax's same-dtype check
    (the CLI casts params and mel together; direct callers may not)."""
    num_kernels = len(h.resblock_kernel_sizes)
    dt = x.dtype
    xs = None
    for j, (k, dils) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
        p = blocks[j]
        xb = x
        for i, d in enumerate(dils):
            xt = _leaky(xb, 0.1)
            pad = (k * d - d) // 2
            xt = jax.lax.conv_general_dilated(
                xt, p[f"convs1_{i}"]["conv"]["kernel"].astype(dt), (1,), [(pad, pad)],
                rhs_dilation=(d,), dimension_numbers=("NHC", "HIO", "NHC"),
            ) + p[f"convs1_{i}"]["conv"]["bias"].astype(dt)
            xt = _leaky(xt, 0.1)
            pad = (k - 1) // 2
            xt = jax.lax.conv_general_dilated(
                xt, p[f"convs2_{i}"]["conv"]["kernel"].astype(dt), (1,), [(pad, pad)],
                dimension_numbers=("NHC", "HIO", "NHC"),
            ) + p[f"convs2_{i}"]["conv"]["bias"].astype(dt)
            xb = xt + xb
        xs = xb if xs is None else xs + xb
    return xs / num_kernels


def generator_apply_pallas(
    variables: dict,
    h: Optional[HiFiGANConfig] = None,
    mel: jnp.ndarray = None,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    max_pallas_channels: int = 64,
    t_tile: Optional[int] = None,
    upsample_impl: str = "dilated",
    narrow_impl: str = "plain",
    n_stages: Optional[int] = None,
    skip_last_mrf: bool = False,
    with_post: bool = True,
) -> jnp.ndarray:
    """Mel (B, T, num_mels) -> waveform (B, T*hop, 1), tanh output.

    Drop-in for ``Generator(h).apply(variables, mel)`` on folded params.
    Stages wider than ``max_pallas_channels`` run as XLA convs — measured
    FASTER there (see module docstring); the Pallas kernel is for the
    narrow stages where conv matmul geometry (M = C_out) starves the MXU.
    ``compute_dtype`` is moot on TPU: JAX's default matmul precision
    already truncates f32 dot inputs to bf16 (one MXU pass), which is how
    the C=128 stages exceed the f32 peak rate.

    ``n_stages``/``skip_last_mrf``/``with_post`` truncate the forward for
    the prefix-graph profiler (scripts/profile_vocoder_stages.py) so its
    per-stage deltas time THIS function's exact graph, not a re-typed
    copy: stop after upsample+MRF stage ``n_stages``-1 (``skip_last_mrf``
    stops after just its upsample), and ``with_post=False`` drops the
    final leaky+conv_post+tanh. Serving always uses the defaults (full
    forward).
    """
    h = h or HiFiGANConfig()
    p = variables["params"]
    num_kernels = len(h.resblock_kernel_sizes)
    lrelu = 0.1

    from matcha_tpu.ops.mrf_pallas import pick_t_tile

    n_stages = len(h.upsample_rates) if n_stages is None else n_stages
    x = _conv1d(mel, p["conv_pre"]["conv"]["kernel"], p["conv_pre"]["conv"]["bias"], padding=3)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        if i >= n_stages:
            break
        x = _leaky(x, lrelu)
        up = p[f"ups_{i}"]
        up_fn = _conv_transpose1d_subpixel if upsample_impl == "subpixel" else _conv_transpose1d
        x = up_fn(x, up["kernel"], up["bias"], stride=u, padding=(k - u) // 2)
        if skip_last_mrf and i == n_stages - 1:
            break
        blocks = [p[f"resblocks_{i * num_kernels + j}"] for j in range(num_kernels)]
        C = x.shape[-1]
        if C > max_pallas_channels:
            x = _xla_mrf_stage(x, blocks, h)
            continue
        weights = mrf_weights_from_params(blocks, n_dil=len(h.resblock_dilation_sizes[0]))
        # The Pallas stage stores activations in f32 VMEM regardless of
        # the serving dtype (Mosaic cannot lower sub-32-bit minor-dim
        # broadcasts — the bias add); the matmuls themselves already run
        # at the MXU bf16 rate via JAX's default matmul precision. With
        # --bf16-vocoder, only the XLA stages (conv_pre, upsamples, wide
        # MRFs, conv_post) keep the bf16 bandwidth saving.
        act_dtype = x.dtype
        weights = tuple(w.astype(jnp.float32) for w in weights)
        if narrow_impl == "phase" and 128 // C >= 2:
            # Phase-packed kernel: full 128-row MXU fill at C in {32, 64}.
            # Measured NEUTRAL in-graph vs "plain" (see fused_mrf_stage_phase
            # docstring); kept as the documented experiment, not the default.
            from matcha_tpu.ops.mrf_pallas import fused_mrf_stage_phase

            phase_kwargs = {}
            if t_tile is not None:
                phase_kwargs["t_tile"] = t_tile  # counts PACKED lanes here
            x = fused_mrf_stage_phase(
                x.astype(jnp.float32), weights,
                kernel_sizes=tuple(h.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in h.resblock_dilation_sizes),
                interpret=interpret, **phase_kwargs,
            ).astype(act_dtype)
            continue
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
    if not with_post:
        return x
    x = _leaky(x, 0.01)  # torch default slope before conv_post (models.py:193)
    x = _conv1d(x, p["conv_post"]["conv"]["kernel"], p["conv_post"]["conv"]["bias"], padding=3)
    return jnp.tanh(x)
