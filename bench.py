"""Benchmark: the REAL serving protocol on one TPU chip.

Measures the BASELINE.json headline config end to end:

* **Throughput**: a 128-utterance filelist with length-bucketed padding,
  batched (B=8, sorted by length), driven through the live serving class
  (``matcha_tpu.cli.TTSPipeline.synthesise_corpus`` — the staged filelist
  protocol: all encoder passes dispatched first, one host transfer of the
  predicted mel lengths, then per-bucket decode+vocode), including the
  padding waste of real (varying) utterance lengths. Accounting credits
  only TRUE audio seconds (sum of mel_lengths x hop / sr), not padded
  frames.
* **p50 / p90 single-sentence latency**: B=1 through the fused single-jit
  text->wav graph (``--fixed-y-bucket`` serving mode), per-call result
  fetch.

Protocol follows the reference conventions (BASELINE.md): 22050 Hz,
hop 256, 10 Euler steps, temperature 0.667. Weights are randomly
initialised (pretrained ckpts are not downloadable in this environment);
compute cost is identical to trained weights. Durations under random
weights collapse to ~1 frame/token, so ``length_scale=3.5`` restores the
realistic ~3.5 frames/token of trained models — through the exact code
path real serving uses (the speaking-rate control). Utterance lengths are
drawn from a spread (64-192 tokens) so batches land in DIFFERENT mel
buckets, exercising the bucket-cache machinery the way a real filelist
does. jit caches are warmed first (steady-state serving measurement).

Prints ONE JSON line:
  {"metric": "serving_throughput_128utt_bucketed", "value": X,
   "unit": "x_realtime_per_chip", "vs_baseline": X / 200, ...}
(vs_baseline: BASELINE.json north-star target is >200x realtime/chip;
extra keys report p50/p90 latency vs the <=50 ms target.)
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


N_UTTS = 128
BATCH = 8  # B=16 at the 1024-frame bucket exhausts the 16G HBM (vocoder MRF)
N_STEPS = 10
SR, HOP = 22050, 256
LENGTH_SCALE = 3.5
TEMPERATURE = 0.667


def build_pipeline():
    import jax
    import jax.numpy as jnp

    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()  # compiles only affect (untimed) warmup

    from matcha_tpu.cli import TTSPipeline
    from matcha_tpu.models.denoiser import compute_bias_spec
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig
    from matcha_tpu.models.matcha import MatchaTTS

    model = MatchaTTS()  # flagship LJSpeech-scale config
    # Init on the host CPU backend, then transfer both trees: initializer
    # kernels (dozens of truncated_normal shapes) are minutes of
    # remote-compile through the tunnel on a cold cache, and their values
    # don't matter to the measurement (random weights either way). If the
    # process was launched with JAX_PLATFORMS restricted to the TPU
    # platform there is no CPU backend — init on the default device then.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        params = model.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((1, 32), jnp.int32), jnp.full((1,), 32, jnp.int32),
            jax.random.PRNGKey(0), n_timesteps=1, y_max_length=64,
            method=MatchaTTS.synthesise,
        )
        vocoder = Generator(HiFiGANConfig())
        voc_params = vocoder.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 80)))
    dev = jax.devices()[0]
    params, voc_params = jax.device_put((params, voc_params), dev)
    print("# params initialized (CPU) + transferred", flush=True)
    bias = compute_bias_spec(lambda mel: vocoder.apply(voc_params, mel))
    print("# denoiser bias spec ready", flush=True)
    return TTSPipeline(model, params, vocoder, voc_params, bias)


def make_corpus(rng):
    """128 synthetic utterances with a realistic token-length spread
    (interspersed phoneme ids, like process_text output)."""
    lengths = rng.integers(64, 193, size=N_UTTS)
    return [rng.integers(1, 178, size=(int(n),)).astype(np.int32) for n in lengths]


def run_batched(pipeline, utts, key, timed: bool):
    """One full sweep over the corpus through the staged batched serving
    protocol (``TTSPipeline.synthesise_corpus``): sorted by length ->
    B=8 batches -> ALL encoder passes dispatched -> ONE host transfer of
    the predicted mel lengths -> decode+vocode per bucket. The per-batch
    path pays ~2 blocking ~28 ms host round trips per batch through the
    remote-attached chip; the staged path pays one total."""
    import jax
    import jax.numpy as jnp

    audio_seconds = 0.0
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _chunk, out in pipeline.synthesise_corpus(
        utts, key, n_timesteps=N_STEPS, temperature=TEMPERATURE,
        length_scale=LENGTH_SCALE, batch_size=BATCH,
    ):
        # chain completion of the waveform into one scalar dependency (the
        # fused stage returns a ready-made scalar handle; the getitem on
        # the split path is an extra eager dispatch)
        fs = out.get("first_sample")
        acc = acc + (fs if fs is not None else out["waveform"][0, 0])
        audio_seconds += float(out["mel_lengths_host"].sum()) * HOP / SR
    # Force the whole chain: block_until_ready() can return before the
    # tunnel-attached device finishes — only a data fetch is honest.
    float(acc)
    wall = time.perf_counter() - t0
    return audio_seconds, wall


def run_latency(pipeline, key, n_calls: int = 30):
    """B=1 single-sentence latency through the AUTO-bucketed fused graph.

    No hand-tuned bucket flag: ``fixed_y_bucket="auto"`` self-calibrates
    the tightest fused mel bucket from observed durations (first call runs
    the largest bucket, then tightens), and the result is guaranteed
    truncation-free — unlike round 2's hand-picked ``--fixed-y-bucket
    448``, which silently clipped this corpus's durations (553 predicted
    frames) and flattered the latency number. Per call the pipeline pays
    exactly ONE host sync: the fused graph packs mel_lengths into the wav
    transfer. Two sentences are measured: a typical ~3.4 s-audio sentence
    (the headline number) and a long ~6.4 s one; plus the per-call tunnel
    floor (trivial jitted dispatch + scalar fetch) so the percentiles
    decompose into device work vs transport."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    sentences = {
        "typical": rng.integers(1, 178, size=(1, 58)).astype(np.int32),
        "long": rng.integers(1, 178, size=(1, 110)).astype(np.int32),
    }

    def call(x, i):
        # per-call key derived IN-GRAPH from the base key + call index
        # (key_fold; an eager fold_in is 1-2 tunnel dispatches), result
        # delivered as the packed 24-bit PCM rows + lengths — the exact
        # frames write_wav/serving emit, i.e. the complete deliverable
        # (raw_pcm24 skips the ~1.6 ms host f32 unpack).
        out = pipeline.synthesise_batch(
            x, np.asarray([x.shape[-1]], np.int32), key,
            n_timesteps=N_STEPS, temperature=TEMPERATURE,
            length_scale=LENGTH_SCALE, fixed_y_bucket="auto",
            key_fold=1000 + i, raw_pcm24=True,
        )
        # the single packed sync already delivered the samples host-side
        assert out["pcm24_bytes_host"] is not None
        return out

    from matcha_tpu.cli import _unpack_pcm24

    result = {}
    for name, x in sentences.items():
        call(x, 0)  # largest bucket (uncalibrated) / calibration update
        out = call(x, 1)  # calibrated tight-bucket compile
        bucket = int(out["mel"].shape[-1])
        ml = int(out["mel_lengths_host"][0])
        assert ml < bucket, "auto bucket must not truncate"
        times = []
        for i in range(n_calls):
            t0 = time.perf_counter()
            out = call(x, 2 + i)  # distinct fold per call (identical calls dedupe)
            times.append((time.perf_counter() - t0) * 1e3)
        # delivered-bytes validity check (outside the timed region: byte
        # consumers never decode — write_wav/serve pass the frames through)
        wav, _ = _unpack_pcm24(out["pcm24_bytes_host"])
        assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0
        result[name] = {
            "p50": float(np.percentile(times, 50)),
            "p90": float(np.percentile(times, 90)),
            "histogram_ms": {f"p{p}": round(float(np.percentile(times, p)), 2)
                             for p in (10, 25, 50, 75, 90, 99)},
            "auto_bucket": bucket,
            "audio_seconds": round(ml * HOP / SR, 2),
        }

    # Tunnel floor: dispatch + scalar fetch of a trivial jitted op. The
    # difference p50 - floor approximates on-device + runtime time.
    tiny = jax.jit(lambda a: a + 1.0)
    float(tiny(jnp.float32(0)))  # compile
    rtts = []
    for i in range(n_calls):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(i)))  # varied input (identical calls dedupe)
        rtts.append((time.perf_counter() - t0) * 1e3)
    rtt50 = float(np.percentile(rtts, 50))
    result["tunnel_rtt_ms_p50"] = round(rtt50, 2)

    # Payload-rate probe: fetch a buffer the size of the typical packed
    # result THE WAY THE PIPELINE DOES — split into <=72 KB parts pulled
    # over concurrent streams (cli._fetch_parts_host; each stream rides
    # the tunnel's flat <=128 KB region and they overlap). The trivial-RTT
    # probe can't see per-MB transfer-rate degradation (tunnel weather
    # moves it hour to hour), so without this a slow hour reads as
    # "device got slower". device ~= p50 - payload fetch (the payload
    # probe itself includes one RTT). A serial single-stream fetch of the
    # same bytes is also recorded so the stream win stays visible.
    from matcha_tpu.cli import _fetch_parts_host, _n_fetch_parts, _split_parts

    typ_bucket = result["typical"]["auto_bucket"]
    n_bytes = (typ_bucket * HOP + 1) * 3  # pcm24 rows the fused graph ships
    k = _n_fetch_parts(n_bytes)
    buf_fn = jax.jit(
        lambda s: _split_parts(jnp.full((1, n_bytes), s, jnp.uint8), k))
    _fetch_parts_host(buf_fn(jnp.uint8(0)))  # compile
    fetches, serial = [], []
    for i in range(n_calls):
        parts = buf_fn(jnp.uint8(i % 251))
        t0 = time.perf_counter()
        _fetch_parts_host(parts)
        fetches.append((time.perf_counter() - t0) * 1e3)
        parts = buf_fn(jnp.uint8((i + 1) % 251))
        t0 = time.perf_counter()
        np.concatenate([np.asarray(p) for p in parts], axis=1)
        serial.append((time.perf_counter() - t0) * 1e3)
    fetch50 = float(np.percentile(fetches, 50))
    result["payload_fetch_ms_p50"] = round(fetch50, 2)
    result["payload_fetch_serial_ms_p50"] = round(float(np.percentile(serial, 50)), 2)
    result["payload_fetch_streams"] = k
    result["payload_kb"] = round(n_bytes / 1024.0, 1)
    for name in sentences:
        result[name]["device_ms_p50_estimate"] = round(
            result[name]["p50"] - fetch50, 2)

    # Pure device time of the typical fused graph: queue N dispatches
    # back-to-back (fixed int bucket — no per-call host sync; the same
    # compiled graph 'auto' settled on) and force with ONE fetch. This is
    # what the chip does per call independent of the tunnel hour: on a
    # locally-attached TPU the e2e call is ~this plus PCIe-scale
    # transfers, so it is the number that carries the <=50 ms target to
    # real deployments even when the link inflates e2e here.
    x_t = sentences["typical"]
    xl_t = np.asarray([x_t.shape[-1]], np.int32)
    bkt = result["typical"]["auto_bucket"]

    def call_fixed(i):
        return pipeline.synthesise_batch(
            x_t, xl_t, key, key_fold=5000 + i,
            n_timesteps=N_STEPS, temperature=TEMPERATURE,
            length_scale=LENGTH_SCALE, fixed_y_bucket=bkt)

    from matcha_tpu.cli import fetch_fused_host

    fetch_fused_host(call_fixed(0))
    n_q = 10
    t0 = time.perf_counter()
    outs = [call_fixed(1 + i) for i in range(n_q)]
    fetch_fused_host(outs[-1])
    queued = (time.perf_counter() - t0) * 1e3
    # one payload fetch forces the chain; amortize the rest over the calls
    result["typical"]["fused_device_ms_queued"] = round(
        max(0.0, queued - fetch50) / n_q, 2)
    return result


def main() -> None:
    _wait_for_devices()
    import jax

    pipeline = build_pipeline()
    rng = np.random.default_rng(0)
    utts = make_corpus(rng)
    key = jax.random.PRNGKey(0)

    # Warmup sweep: compiles every (x-bucket, y-bucket) pair the corpus
    # hits, exactly as a warmed-up serving process would hold them.
    print("# warmup sweep (compiles land here; cold cache = minutes/bucket "
          "through the remote-compile tunnel)", flush=True)
    run_batched(pipeline, utts, key, timed=False)

    print("# timed corpus sweep", flush=True)
    audio_seconds, wall = run_batched(pipeline, utts, jax.random.fold_in(key, 1), timed=True)
    throughput = audio_seconds / wall

    print("# latency probes", flush=True)
    lat = run_latency(pipeline, key)

    print(json.dumps({
        "metric": "serving_throughput_128utt_bucketed",
        "value": round(float(throughput), 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(float(throughput) / 200.0, 3),
        "audio_seconds": round(audio_seconds, 1),
        "wall_seconds": round(wall, 3),
        "p50_single_sentence_latency_ms": round(lat["typical"]["p50"], 2),
        "p90_single_sentence_latency_ms": round(lat["typical"]["p90"], 2),
        "latency_typical": lat["typical"],
        "latency_long_sentence": lat["long"],
        "tunnel_rtt_ms_p50": lat["tunnel_rtt_ms_p50"],
        "payload_fetch_ms_p50": lat["payload_fetch_ms_p50"],
        "payload_fetch_serial_ms_p50": lat["payload_fetch_serial_ms_p50"],
        "payload_fetch_streams": lat["payload_fetch_streams"],
        "payload_kb": lat["payload_kb"],
        "latency_target_ms": 50.0,
        "protocol": "128-utt filelist, sorted B=8, staged corpus serving (one host sync), dynamic mel buckets + finer vocoder buckets, 10 Euler steps, full text->wav incl. vocoder+denoiser; latency via the AUTO-bucketed fused graph (fixed_y_bucket='auto', truncation-free, ONE packed host sync per call shipping device-quantized 24-bit PCM — the written-WAV encoding — over parallel <=72KB fetch streams), typical ~3.4s-audio sentence headline + long ~6.4s secondary",
    }))


if __name__ == "__main__":
    main()
