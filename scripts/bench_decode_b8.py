"""A/B the corpus-protocol decode stage (B=8) in f32 vs bf16 compute.

Motivation (PERFORMANCE.md MFU table): at B=1 the decode stage is
overhead-bound (4-7% of roofline) and bf16 measured neutral; at the
throughput shape (B=8, T_y=1024) decode runs ~20 ms for 10 Euler steps at
~35% of the HBM roofline — bandwidth-bound territory where halving
activation bytes could be a real win for the headline corpus protocol.

Measures, steady-state (queued dispatches, one forcing fetch):
  * decode f32            (what synthesise_corpus runs today)
  * decode bf16           (decoder param subtree bf16 + compute_dtype=bf16)
and reports XLA cost-analysis bytes for both, plus the mel deviation
between the two paths (durations are f32/bit-identical in both).

Usage: python scripts/bench_decode_b8.py [--iters K] [--ty 1024]
(--iters is the number of timed dispatch iterations; the Euler step count
is fixed at the protocol's 10 steps)
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import cost_of, timeit_dispatch as timeit  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10,
                    help="timed dispatch iterations (NOT Euler steps; those are fixed at 10)")
    ap.add_argument("--ty", type=int, default=1024)
    ap.add_argument("--tx", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
    from bench import build_pipeline
    from matcha_tpu.models.matcha import MatchaTTS

    print(f"# devices: {jax.devices()}", flush=True)
    pipeline = build_pipeline()
    model, params = pipeline.model, pipeline.params
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    B, Tx, Ty = args.batch, args.tx, args.ty

    x = rng.integers(1, 178, size=(B, Tx)).astype(np.int32)
    xl = jnp.asarray(np.full((B,), Tx, np.int32))
    enc = pipeline._encode_fn(Tx, 3.5)
    mu_x, w_ceil, y_lengths = enc(params, jnp.asarray(x), xl, None)
    jax.block_until_ready(mu_x)

    results = {}
    mels = {}
    for label, p, cdt in (
        ("f32", params, None),
        ("bf16", pipeline._latency_params(), jnp.bfloat16),
    ):
        dec = jax.jit(functools.partial(
            model.apply, method=MatchaTTS.decode, n_timesteps=10,
            temperature=0.667, y_max_length=Ty, compute_dtype=cdt))
        flops, byts = cost_of(
            dec.lower(p, mu_x, w_ceil, xl, y_lengths, key, spks=None).compile())
        out = dec(p, mu_x, w_ceil, xl, y_lengths, key, spks=None)
        mels[label] = np.asarray(out["mel"])
        keys = list(jax.random.split(key, 2 * args.iters))
        jax.block_until_ready(keys)

        def disp(i, dec=dec, p=p, keys=keys):
            return dec(p, mu_x, w_ceil, xl, y_lengths, keys[i], spks=None)

        secs = timeit(disp, lambda o: float(o["mel"][0, 0, 0]), args.iters)
        results[label] = {
            "time_ms": round(secs * 1e3, 2),
            "gflops": round(flops / 1e9, 1),
            "mbytes": round(byts / 1e6, 1),
            "gb_s": round(byts / secs / 1e9, 1),
        }
        print(json.dumps({label: results[label]}), flush=True)

    dev = float(np.max(np.abs(mels["f32"] - mels["bf16"])))
    speedup = results["f32"]["time_ms"] / results["bf16"]["time_ms"]
    print(json.dumps({
        "shape": f"B={B} Tx={Tx} Ty={Ty}",
        "speedup_bf16": round(speedup, 3),
        "mel_max_abs_dev": round(dev, 4),
    }), flush=True)


if __name__ == "__main__":
    main()
