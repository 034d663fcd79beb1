"""Benchmark: batched text->wav synthesis throughput on one TPU chip.

Protocol follows the reference's measurement conventions (BASELINE.md):
22050 Hz, hop 256, 10 Euler steps, temperature 0.667, and the reference's
RTF formula inverted into x-realtime throughput. The full serving path
runs: text encoder -> duration expand -> 10-step CFM U-Net (lax.scan) ->
HiFi-GAN vocoder -> waveform, as one jit per stage at fixed bucket shapes
(B=32, T_x=256, T_y=1024 mel frames = ~11.9 s of audio per utterance).

Weights are randomly initialised (pretrained ckpts are not downloadable in
this environment); compute cost is identical to trained weights. Durations
are overridden to fill the mel bucket so the measured work equals the
padded-graph work the serving path performs.

Prints ONE JSON line:
  {"metric": "batched_synthesis_throughput", "value": X, "unit":
   "x_realtime_per_chip", "vs_baseline": X / 200}
(vs_baseline: BASELINE.json north-star target is >200x realtime/chip.)
"""

import json
import time

import numpy as np


def _wait_for_devices(retries: int = 5, delay_s: float = 20.0):
    """The remote-TPU registration is occasionally flaky at process start;
    retry before giving up so the benchmark run survives transients."""
    import jax

    for attempt in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:
            if attempt == retries - 1:
                raise
            print(f"# devices unavailable ({e}); retrying in {delay_s}s", flush=True)
            time.sleep(delay_s)


def main() -> None:
    _wait_for_devices()
    import jax
    import jax.numpy as jnp

    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig
    from matcha_tpu.models.matcha import MatchaTTS

    # B=8 keeps the HiFi-GAN activation footprint (512ch x 8x upsampled
    # frames) inside one chip's 16G HBM; throughput is reported per chip.
    B, T_x, T_y = 8, 256, 1024
    N_STEPS = 10
    SR, HOP = 22050, 256

    rng = np.random.default_rng(0)
    model = MatchaTTS()  # flagship LJSpeech-scale config
    x = jnp.asarray(rng.integers(1, 178, size=(B, T_x)), jnp.int32)
    x_lengths = jnp.full((B,), T_x, jnp.int32)
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": jax.random.PRNGKey(1)}, x[:1, :32], x_lengths[:1], key,
        n_timesteps=1, y_max_length=64, method=MatchaTTS.synthesise,
    )

    vocoder = Generator(HiFiGANConfig())
    voc_params = vocoder.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 80)))

    frames_per_token = T_y // T_x
    w_fill = jnp.full((B, T_x, 1), float(frames_per_token))
    y_lengths = jnp.full((B,), T_y, jnp.int32)

    # Fused single-jit text->wav graph (the BASELINE.json headline config):
    # encoder + duration expand + 10-step CFM scan + HiFi-GAN in ONE
    # executable — one dispatch per batch, no intermediate host hops.
    @jax.jit
    def run(key):
        mu_x, _w, _yl = model.apply(params, x, x_lengths, method=MatchaTTS.encode)
        out = model.apply(
            params, mu_x, w_fill, x_lengths, y_lengths, key,
            n_timesteps=N_STEPS, temperature=0.667, y_max_length=T_y,
            method=MatchaTTS.decode,
        )
        mel_btc = jnp.swapaxes(out["mel"], 1, 2)
        wav = vocoder.apply(voc_params, mel_btc)[..., 0]
        return wav

    # Warmup / compile. NOTE: completion is forced by fetching a scalar
    # from the result — block_until_ready() can return before the remote
    # device finishes on tunnel-attached TPUs, which silently turns the
    # benchmark into a dispatch-rate measurement.
    wav = run(key)
    float(wav[0, 0])

    n_iters = 10
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for i in range(n_iters):
        wav = run(jax.random.fold_in(key, i))
        acc = acc + wav[0, 0]  # chains every iteration into one dependency
    float(acc)  # forces the whole chain
    wall = time.perf_counter() - t0

    audio_seconds = n_iters * B * T_y * HOP / SR
    throughput = audio_seconds / wall
    print(json.dumps({
        "metric": "batched_synthesis_throughput",
        "value": round(float(throughput), 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(float(throughput) / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
