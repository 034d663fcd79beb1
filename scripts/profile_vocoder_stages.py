"""In-graph stage decomposition of the B=8 Pallas-path vocoder.

Isolated per-stage timings are misleading on the tunnel backend (fixed
per-dispatch cost ~tens of ms at n<=30 dwarfs small stages). Instead,
time PREFIX graphs of the generator (conv_pre, ..through ups_i+mrf_i..,
full) and difference consecutive rows: since the generator is a
sequential chain, row deltas are honest in-graph stage costs (modulo
XLA overlap at boundaries).

Usage: python scripts/profile_vocoder_stages.py [--narrow-impl plain|phase]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from matcha_tpu.models.hifigan import Generator, HiFiGANConfig
from matcha_tpu.models.hifigan_pallas import (
    _conv1d,
    _conv_transpose1d,
    _conv_transpose1d_subpixel,
    _leaky,
    _xla_mrf_stage,
)
from matcha_tpu.ops.mrf_pallas import (
    fused_mrf_stage,
    fused_mrf_stage_phase,
    mrf_weights_from_params,
    pick_t_tile,
)


from _timing import timeit  # noqa: E402  (shared queued-dispatch protocol)


def make_prefix(variables, h, n_stages, narrow_impl, upsample_impl, with_post,
                skip_last_mrf=False, mrf_dtype=jnp.float32):
    """Generator forward truncated after ups+mrf stage n_stages-1 (or after
    just ups_{n_stages-1} when ``skip_last_mrf`` — separates upsample cost
    from MRF cost in the row deltas)."""
    p = variables["params"]
    num_kernels = len(h.resblock_kernel_sizes)

    def fn(mel):
        x = _conv1d(mel, p["conv_pre"]["conv"]["kernel"], p["conv_pre"]["conv"]["bias"], padding=3)
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            if i >= n_stages:
                break
            x = _leaky(x, 0.1)
            up = p[f"ups_{i}"]
            up_fn = (_conv_transpose1d_subpixel if upsample_impl == "subpixel"
                     else _conv_transpose1d)
            x = up_fn(x, up["kernel"], up["bias"], stride=u, padding=(k - u) // 2)
            if skip_last_mrf and i == n_stages - 1:
                break
            blocks = [p[f"resblocks_{i * num_kernels + j}"] for j in range(num_kernels)]
            C = x.shape[-1]
            if C > 128 or narrow_impl == "xla":
                x = _xla_mrf_stage(x, blocks, h)
                continue
            weights = mrf_weights_from_params(blocks, n_dil=len(h.resblock_dilation_sizes[0]))
            weights = tuple(w.astype(jnp.float32) for w in weights)
            if narrow_impl == "phase" and 128 // C >= 2:
                x = fused_mrf_stage_phase(
                    x.astype(jnp.float32), weights,
                    kernel_sizes=tuple(h.resblock_kernel_sizes),
                    dilations=tuple(tuple(d) for d in h.resblock_dilation_sizes))
                continue
            x_cf = jnp.swapaxes(x, 1, 2).astype(jnp.float32)
            x_cf = fused_mrf_stage(
                x_cf, weights,
                kernel_sizes=tuple(h.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in h.resblock_dilation_sizes),
                t_tile=pick_t_tile(C), compute_dtype=mrf_dtype)
            x = jnp.swapaxes(x_cf, 1, 2)
        if with_post:
            x = _leaky(x, 0.01)
            x = _conv1d(x, p["conv_post"]["conv"]["kernel"], p["conv_post"]["conv"]["bias"], padding=3)
            x = jnp.tanh(x)
        # reduce to a tiny fetchable value so payload transfer never
        # pollutes the timing. MUST be a full reduction: a strided slice
        # here lets XLA fold the slice back through the conv chain
        # (windowed/strided convs -> most of the work dead-code-eliminated,
        # EXCEPT below Pallas calls, which block folding) — that bug made
        # all-XLA prefixes time at the host floor while Pallas-terminated
        # prefixes timed honestly.
        return jnp.sum(x)

    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mel-frames", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--narrow-impl", default="plain", choices=["plain", "phase", "xla"])
    ap.add_argument("--upsample-impl", default="dilated", choices=["dilated", "subpixel"])
    ap.add_argument("--mrf-dtype", default="float32", choices=["float32", "bfloat16"])
    args = ap.parse_args()

    from matcha_tpu.utils.utils import enable_compilation_cache
    enable_compilation_cache()

    h = HiFiGANConfig()
    B, T = args.batch, args.mel_frames
    gen = Generator(h)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, h.num_mels)))
    mels = [
        jax.device_put(jax.random.normal(jax.random.PRNGKey(i), (B, T, h.num_mels)))
        for i in range(3)
    ]
    jax.block_until_ready(mels)
    n = args.steps
    n_up = len(h.upsample_rates)
    print(f"# B={B} T_mel={T} steps={n} narrow={args.narrow_impl} "
          f"ups={args.upsample_impl} mrf_dtype={args.mrf_dtype}", flush=True)

    # First-timed-function wall is ~13 ms/call regardless of content
    # (per-process tunnel warmup); burn it on a trivial graph so row 1
    # is honest.
    trivial = jax.jit(lambda m: jnp.sum(m))
    timeit(trivial, mels, n)

    prev = 0.0
    rows = [(0, False, False, "conv_pre")]
    for i in range(n_up):
        rows.append((i + 1, False, True, f"+ ups_{i}"))
        rows.append((i + 1, False, False, f"+ mrf_{i}"))
    rows.append((n_up, True, False, "+ conv_post/tanh"))
    for n_stages, with_post, skip_mrf, label in rows:
        fn = make_prefix(variables, h, n_stages, args.narrow_impl,
                         args.upsample_impl, with_post, skip_last_mrf=skip_mrf,
                         mrf_dtype=jnp.dtype(args.mrf_dtype).type)
        dt = timeit(fn, mels, n)
        print(f"{label:20s} cum {dt*1e3:7.2f} ms   delta {(dt-prev)*1e3:7.2f} ms",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
