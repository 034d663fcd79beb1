"""Decompose the B=8 throughput-shape vocoder (the corpus protocol's
dominant stage, ~78 ms/batch) into its device-time components on the
real chip, and A/B the candidate optimizations:

  * full generator: Pallas-MRF path (serving default) vs XLA dilated vs
    XLA subpixel vs Pallas-MRF + subpixel upsamples
  * per-upsample: lhs_dilation transposed conv vs phase-decomposed
    (subpixel) dense conv, at each stage's real shape
  * the (B,T,C)<->(B,C,T) swapaxes relayouts around each Pallas stage
  * per-MRF-stage Pallas kernel time (for the narrow-stage fill question)

Timing protocol: device-resident varied inputs, K dispatches queued
back-to-back, ONE forcing data fetch (see scripts/mfu.py notes on the
tunnel backend). CAVEAT: the per-upsample / per-MRF / phase sections
time small (0.5-20 ms) standalone jits, which the tunnel's per-dispatch
floor overstates 2-3x — treat them as A/B comparisons at the same shape
only; per-stage ABSOLUTE costs come from the prefix-graph deltas in
scripts/profile_vocoder_stages.py (PERFORMANCE.md "Pitfalls").

Usage: python scripts/profile_vocoder.py [--steps 10] [--mel-frames 1024] [--batch 8]
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
    _conv_transpose1d,
    _conv_transpose1d_subpixel,
    generator_apply_pallas,
)
from matcha_tpu.ops.mrf_pallas import fused_mrf_stage, mrf_weights_from_params, pick_t_tile


from _timing import timeit  # noqa: E402  (shared queued-dispatch protocol)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mel-frames", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma list of sections/names: full_pallas_dilated,"
                         "full_pallas_subpixel,full_xla_dilated,full_xla_subpixel,"
                         "full_pallas_phase,full_pallas_phase_subpixel,"
                         "ups,swap,mrf,phase")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from matcha_tpu.utils.utils import enable_compilation_cache
    enable_compilation_cache()  # reuse compiles across invocations

    def want(name):
        return not only or name in only

    h = HiFiGANConfig()
    B, T = args.batch, args.mel_frames
    rng = jax.random.PRNGKey(0)
    gen = Generator(h)
    variables = gen.init(rng, jnp.zeros((1, 64, h.num_mels)))
    mels = [
        jax.device_put(jax.random.normal(jax.random.PRNGKey(i), (B, T, h.num_mels)))
        for i in range(3)
    ]
    jax.block_until_ready(mels)

    n = args.steps
    print(f"# B={B} T_mel={T} steps={n}", flush=True)

    # --- full generator variants -------------------------------------
    full = {
        "full_pallas_dilated": jax.jit(lambda m: generator_apply_pallas(variables, h, m)),
        "full_pallas_subpixel": jax.jit(
            lambda m: generator_apply_pallas(variables, h, m, upsample_impl="subpixel")
        ),
        "full_xla_dilated": jax.jit(lambda m: gen.apply(variables, m)),
        "full_xla_subpixel": jax.jit(
            lambda m: Generator(h, upsample_impl="subpixel").apply(variables, m)
        ),
        "full_pallas_phase": jax.jit(
            lambda m: generator_apply_pallas(variables, h, m, narrow_impl="phase")
        ),
        "full_pallas_phase_subpixel": jax.jit(
            lambda m: generator_apply_pallas(
                variables, h, m, narrow_impl="phase", upsample_impl="subpixel")
        ),
    }
    for name, fn in full.items():
        if want(name):
            print(f"{name:34s} {timeit(fn, mels, n)*1e3:8.2f} ms", flush=True)

    # --- per-stage shapes ---------------------------------------------
    p = variables["params"]
    num_kernels = len(h.resblock_kernel_sizes)
    shapes = []  # (i, u, k, C_in, C_out, T_in)
    t_in, c_in = T, h.upsample_initial_channel
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        c_out = h.upsample_initial_channel // (2 ** (i + 1))
        shapes.append((i, u, k, c_in, c_out, t_in))
        t_in *= u
        c_in = c_out

    # --- upsamples: dilated vs subpixel -------------------------------
    for (i, u, k, cin, cout, tin) in shapes:
        if not want("ups"):
            break
        up = p[f"ups_{i}"]
        xs = [
            jax.device_put(jax.random.normal(jax.random.PRNGKey(10 + j), (B, tin, cin)))
            for j in range(2)
        ]
        jax.block_until_ready(xs)
        pad = (k - u) // 2
        f_dil = jax.jit(lambda x, up=up, u=u, pad=pad: _conv_transpose1d(x, up["kernel"], up["bias"], u, pad))
        f_sub = jax.jit(lambda x, up=up, u=u, pad=pad: _conv_transpose1d_subpixel(x, up["kernel"], up["bias"], u, pad))
        d1, d2 = timeit(f_dil, xs, n), timeit(f_sub, xs, n)
        # parity check
        a, b = np.asarray(f_dil(xs[0])), np.asarray(f_sub(xs[0]))
        dev = float(np.abs(a - b).max())
        print(f"ups_{i} (C{cin}->{cout}, T{tin}->{tin*u}, k{k}/u{u}): dilated {d1*1e3:7.2f} ms  subpixel {d2*1e3:7.2f} ms  maxdev {dev:.2e}", flush=True)

    # --- swapaxes relayout cost per Pallas stage -----------------------
    # An optimization_barrier stands in for the opaque pallas_call the
    # real relayouts bracket: without it XLA cancels transpose(transpose)
    # outright and f_t compiles to the same HLO as f_0 (measuring 0).
    for (i, u, k, cin, cout, tin) in shapes:
        if not want("swap"):
            break
        if cout > 128:
            continue
        tout = tin * u
        xs = [
            jax.device_put(jax.random.normal(jax.random.PRNGKey(20 + j), (B, tout, cout)))
            for j in range(2)
        ]
        jax.block_until_ready(xs)
        f_t = jax.jit(lambda x: jnp.swapaxes(
            jax.lax.optimization_barrier(jnp.swapaxes(x, 1, 2) + 1.0), 1, 2))
        f_0 = jax.jit(lambda x: jax.lax.optimization_barrier(x + 1.0))
        dt = timeit(f_t, xs, n) - timeit(f_0, xs, n)
        print(f"swapaxes roundtrip stage {i} (C={cout}, T={tout}): {dt*1e3:7.2f} ms", flush=True)

    # --- per-MRF-stage Pallas kernel -----------------------------------
    for (i, u, k, cin, cout, tin) in shapes:
        if not want("mrf"):
            break
        tout = tin * u
        blocks = [p[f"resblocks_{i * num_kernels + j}"] for j in range(num_kernels)]
        if cout > 128:
            print(f"mrf_{i} (C={cout}, T={tout}): XLA fallback (see mfu.py)", flush=True)
            continue
        weights = mrf_weights_from_params(blocks, n_dil=len(h.resblock_dilation_sizes[0]))
        xs = [
            jax.device_put(jax.random.normal(jax.random.PRNGKey(30 + j), (B, cout, tout)))
            for j in range(2)
        ]
        jax.block_until_ready(xs)
        fn = jax.jit(
            lambda x, w=weights, C=cout: fused_mrf_stage(
                x, w, kernel_sizes=tuple(h.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in h.resblock_dilation_sizes),
                t_tile=pick_t_tile(C),
            )
        )
        dt = timeit(fn, xs, n)
        taps = 2 * len(h.resblock_dilation_sizes[0]) * sum(h.resblock_kernel_sizes)
        gflop = 2 * cout * cout * tout * taps * B / 1e9
        print(f"mrf_{i} (C={cout}, T={tout}): {dt*1e3:7.2f} ms  {gflop/dt/1e3:6.1f} TFLOP/s", flush=True)

    # --- phase-packed narrow-stage kernel (channels-last in/out) -------
    from matcha_tpu.ops.mrf_pallas import fused_mrf_stage_phase

    for (i, u, k, cin, cout, tin) in shapes:
        if not want("phase"):
            break
        tout = tin * u
        if 128 // cout < 2:
            continue
        blocks = [p[f"resblocks_{i * num_kernels + j}"] for j in range(num_kernels)]
        weights = mrf_weights_from_params(blocks, n_dil=len(h.resblock_dilation_sizes[0]))
        xs = [
            jax.device_put(jax.random.normal(jax.random.PRNGKey(40 + j), (B, tout, cout)))
            for j in range(2)
        ]
        jax.block_until_ready(xs)
        fn = jax.jit(
            lambda x, w=weights: fused_mrf_stage_phase(
                x, w, kernel_sizes=tuple(h.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in h.resblock_dilation_sizes),
            )
        )
        dt = timeit(fn, xs, n)
        taps = 2 * len(h.resblock_dilation_sizes[0]) * sum(h.resblock_kernel_sizes)
        gflop = 2 * cout * cout * tout * taps * B / 1e9
        print(f"mrf_phase_{i} (C={cout}, T={tout}): {dt*1e3:7.2f} ms  {gflop/dt/1e3:6.1f} TFLOP/s (true-work flops)", flush=True)


if __name__ == "__main__":
    main()
