"""Decompose the B=1 single-sentence serving latency (bench.py p50 path).

Measures, with per-call result fetches (the only honest sync through the
remote-device tunnel — see PERFORMANCE.md):

  * floor: dispatch+fetch of a trivial jitted scalar op (tunnel RTT)
  * fused: the full text->wav graph at T_y=512 (the bench.py latency config)
  * mel:   encoder + 10-step CFM decode only
  * voc:   vocoder-only jits at B=1 (pallas f32 / pallas bf16 / XLA f32)
  * den:   denoiser-only jit

Run on the TPU:  python scripts/profile_latency.py [--sections voc,den]
(first compiles are slow through the remote-compile tunnel; select
sections to stay inside a shell timeout).
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, n=20):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(ts, 50))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_pipeline  # also enables the persistent compile cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default="floor,fused,mel,voc,den",
                    help="comma list: floor,fused,mel,voc,den")
    sections = set(ap.parse_args().sections.split(","))

    pipeline = build_pipeline()
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(7)
    x = rng.integers(1, 178, size=(1, 110)).astype(np.int32)
    x_lengths = np.asarray([110], np.int32)
    T_x, T_y = 128, 512

    if "floor" in sections:
        one = jnp.float32(1.0)
        tiny = jax.jit(lambda a: a + 1.0)
        print(f"tunnel floor (tiny jit + fetch): {timeit(lambda: float(tiny(one))):.2f} ms",
              flush=True)

    if "fused" in sections:
        def fused_call(i=0):
            out = pipeline.synthesise_batch(
                x, x_lengths, jax.random.fold_in(key, i), n_timesteps=10,
                temperature=0.667, length_scale=3.5, fixed_y_bucket=512)
            return float(out["waveform"][0, 0])

        print(f"fused text->wav (T_y=512):       {timeit(fused_call):.2f} ms", flush=True)

    if "mel" in sections:
        x_pad = np.zeros((1, T_x), np.int32)
        x_pad[:, :110] = x
        x_pad = jnp.asarray(x_pad)
        xl = jnp.asarray(x_lengths)
        mdl = pipeline.model

        def mel_graph(params, xp, xlen, k):
            out = mdl.apply(params, xp, xlen, k, n_timesteps=10,
                            temperature=0.667, length_scale=3.5,
                            y_max_length=T_y, method=type(mdl).synthesise)
            return out["mel"]

        mel_jit = jax.jit(mel_graph)
        print(f"  mel stage only (enc+10xCFM):   "
              f"{timeit(lambda: float(mel_jit(pipeline.params, x_pad, xl, key)[0, 0, 0])):.2f} ms",
              flush=True)

    if "voc" in sections:
        mel = jnp.zeros((1, T_y, 80), jnp.float32)
        voc_apply = pipeline._voc_apply()
        voc_jit = jax.jit(lambda vp, m: voc_apply(vp, m))
        print(f"  vocoder only (pallas, f32):    "
              f"{timeit(lambda: float(voc_jit(pipeline.vocoder_params, mel)[0, 0, 0])):.2f} ms",
              flush=True)

        vp_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), pipeline.vocoder_params)
        voc_bf16 = jax.jit(lambda vp, m: voc_apply(vp, m.astype(jnp.bfloat16)))
        try:
            print(f"  vocoder only (pallas, bf16):   "
                  f"{timeit(lambda: float(voc_bf16(vp_bf16, mel)[0, 0, 0])):.2f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  vocoder bf16 failed: {e}", flush=True)

        voc_xla = jax.jit(lambda vp, m: pipeline.vocoder.apply(vp, m))
        print(f"  vocoder only (XLA, f32):       "
              f"{timeit(lambda: float(voc_xla(pipeline.vocoder_params, mel)[0, 0, 0])):.2f} ms",
              flush=True)

    if "den" in sections:
        from matcha_tpu.models.denoiser import denoise
        wav = jnp.zeros((1, T_y * 256), jnp.float32)
        den_jit = jax.jit(lambda w: denoise(w, pipeline.denoiser_bias, 0.00025))
        print(f"  denoiser only:                 "
              f"{timeit(lambda: float(den_jit(wav)[0, 0])):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
