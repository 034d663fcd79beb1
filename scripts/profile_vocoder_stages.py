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
from matcha_tpu.models.hifigan_pallas import generator_apply_pallas


from _timing import timeit  # noqa: E402  (shared queued-dispatch protocol)


def make_prefix(variables, h, n_stages, narrow_impl, upsample_impl, with_post,
                skip_last_mrf=False, mrf_dtype=jnp.float32):
    """Generator forward truncated after ups+mrf stage n_stages-1 (or after
    just ups_{n_stages-1} when ``skip_last_mrf`` — separates upsample cost
    from MRF cost in the row deltas).

    Delegates to ``generator_apply_pallas`` itself (its n_stages/
    skip_last_mrf/with_post hooks) so the prefix deltas time the exact
    serving graph — the profiler explores a wider space than serving
    defaults via max_pallas_channels: 'xla' disables the Pallas kernel
    entirely (0), the Pallas impls raise the cap to 128 to expose the
    C=128 placement experiment."""
    max_pallas = 0 if narrow_impl == "xla" else 128

    def fn(mel):
        x = generator_apply_pallas(
            variables, h, mel,
            compute_dtype=mrf_dtype, max_pallas_channels=max_pallas,
            upsample_impl=upsample_impl,
            narrow_impl=narrow_impl if narrow_impl != "xla" else "plain",
            n_stages=n_stages, skip_last_mrf=skip_last_mrf,
            with_post=with_post)
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
