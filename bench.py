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

Robustness contract (the round-4 lesson — BENCH_r04 died rc=124 inside
the latency probes when changed HLO missed the persistent XLA cache and
recompiled cold through the remote-compile tunnel):

* EVERY graph a timed/probed region touches is compiled in an explicit
  warmup phase first; a compile-event counter verifies the timed regions
  stayed compile-free and the count is reported in the record
  (``compile_events``; tests/test_bench_guard.py pins it to zero).
* A wall-clock budget (``MATCHA_BENCH_BUDGET_S``, default 2100 s) gates
  every optional probe; a slow hour degrades the record (``skipped`` +
  ``errors`` keys) instead of erasing it.
* The one-line JSON record ALWAYS prints: probes run under per-probe
  try/except, and SIGTERM/SIGALRM are converted to exceptions so even an
  external ``timeout`` produces a partial record on stdout.

Prints ONE JSON line:
  {"metric": "serving_throughput_128utt_bucketed", "value": X,
   "unit": "x_realtime_per_chip", "vs_baseline": X / 200, ...}
(vs_baseline: BASELINE.json north-star target is >200x realtime/chip;
extra keys report p50/p90 latency vs the <=50 ms target.)
"""

import json
import os
import signal
import time

import numpy as np

N_UTTS = 128
BATCH = 8  # B=16 at the 1024-frame bucket exhausts the 16G HBM (vocoder MRF)
N_STEPS = 10
SR, HOP = 22050, 256
LENGTH_SCALE = 3.5
TEMPERATURE = 0.667
#: token lengths of the two latency sentences (~3.4 s / ~6.4 s of audio)
SENTENCE_TOKENS = {"typical": 58, "long": 110}

#: self-imposed wall-clock budget. The driver wraps bench.py in its own
#: (unknown) timeout; staying under OUR budget and printing a partial
#: record beats being SIGKILLed with nothing on stdout.
BUDGET_S = float(os.environ.get("MATCHA_BENCH_BUDGET_S", "2100"))


class BudgetExceeded(Exception):
    pass


class Budget:
    """Wall-clock budget: probes check in before running; SIGALRM/SIGTERM
    raise so ``main``'s finally-print still emits the JSON record."""

    def __init__(self, total_s: float):
        self.t0 = time.perf_counter()
        self.total = total_s
        self.skipped = []

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def remaining(self) -> float:
        return self.total - self.elapsed()

    def gate(self, name: str, need_s: float) -> bool:
        """True if ``name`` may run; records the skip otherwise."""
        if self.remaining() >= need_s:
            return True
        self.skipped.append(name)
        print(f"# skipping {name}: {self.remaining():.0f}s left < {need_s:.0f}s needed",
              flush=True)
        return False

    def install_signal_handlers(self):
        """Install SIGTERM/SIGALRM -> BudgetExceeded; returns the previous
        handlers so callers can restore them (bench.main() runs inside the
        test suite, and a leaked process-wide handler would convert an
        external SIGTERM into a spurious failure of whatever unrelated test
        happens to be running — observed once with a session-kill SIGTERM)."""
        def _raise(signum, frame):
            raise BudgetExceeded(f"signal {signum} at t={self.elapsed():.0f}s")

        old = {sig: signal.signal(sig, _raise)
               for sig in (signal.SIGTERM, signal.SIGALRM)}
        # leave ~45 s of slack to run the finally-print + flush
        signal.alarm(max(30, int(self.total)))
        return old


# ---------------------------------------------------------------------------
# compile-event accounting: the timed/probed regions must never compile.
# /jax/compilation_cache/compile_requests_use_cache fires once per XLA
# compile REQUEST (persistent-cache hits included — those still cost a
# cache load, which through the remote-compile tunnel is not free), and
# never on in-memory executable reuse — exactly the "no new graphs after
# warmup" invariant. tests/test_bench_guard.py pins regions to zero.
# ---------------------------------------------------------------------------

_COMPILE_EVENTS = {"n": 0, "armed": False}


def _install_compile_counter():
    from jax._src import monitoring

    def _listener(name, **kw):
        if _COMPILE_EVENTS["armed"] and name == "/jax/compilation_cache/compile_requests_use_cache":
            _COMPILE_EVENTS["n"] += 1

    monitoring.register_event_listener(_listener)


class count_compiles:
    """Context manager: counts compile requests inside the block."""

    def __enter__(self):
        self.start = _COMPILE_EVENTS["n"]
        _COMPILE_EVENTS["armed"] = True
        return self

    def __exit__(self, *exc):
        _COMPILE_EVENTS["armed"] = False
        self.count = _COMPILE_EVENTS["n"] - self.start
        return False


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


def make_sentences():
    """The two fixed latency-probe sentences (deterministic)."""
    rng = np.random.default_rng(7)
    return {name: rng.integers(1, 178, size=(1, n)).astype(np.int32)
            for name, n in SENTENCE_TOKENS.items()}


def run_batched(pipeline, utts, key):
    """One full sweep over the corpus through the staged batched serving
    protocol (``TTSPipeline.synthesise_corpus``): sorted by length ->
    B=8 batches -> ALL encoder passes dispatched -> ONE host transfer of
    the predicted mel lengths -> decode+vocode per bucket. The per-batch
    path pays ~2 blocking ~28 ms host round trips per batch through the
    remote-attached chip; the staged path pays one total.

    Returns (audio_seconds, wall_seconds).
    """
    import jax.numpy as jnp

    audio_seconds = 0.0
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for chunk, out in pipeline.synthesise_corpus(
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


def calibrate_probe_ratio(pipeline, sentences, key):
    """Seed the fused auto-bucket calibration from the latency sentences'
    OWN predicted mel lengths, via the cheap encode stage (its (T_x,
    length_scale) graphs are already warm from the corpus sweep; one tiny
    host sync each). This keeps the first auto call off the largest
    (2048-frame) bucket — the cold compile that blew round 4's driver
    budget — while picking the same tight bucket per-sentence calibration
    would. (Seeding from the CORPUS ratio instead was measured to
    over-size the buckets badly: the max frames-per-token over 128 random
    utterances is ~2x a typical sentence's own ratio, which inflated the
    typical bucket 384 -> 768 and p50 by ~10 ms.)
    """
    import jax.numpy as jnp

    from matcha_tpu.cli import X_BUCKETS, pick_bucket

    ratio = 0.0
    for x in sentences.values():
        n = x.shape[-1]
        T_x = pick_bucket(n, X_BUCKETS)
        x_pad = np.zeros((1, T_x), np.int32)
        x_pad[:, :n] = x
        _, _, y_lengths = pipeline._encode_fn(T_x, LENGTH_SCALE)(
            pipeline.params, jnp.asarray(x_pad),
            jnp.asarray([n], jnp.int32), None)
        ratio = max(ratio, float(y_lengths[0]) / (n * LENGTH_SCALE))
    pipeline._dur_ratio = ratio


# ---------------------------------------------------------------------------
# latency probes. Each probe is warm-started by warm_probes() so the timed
# loops never compile; each returns plain dict entries for the record.
# ---------------------------------------------------------------------------


def _call_auto(pipeline, x, key, i):
    """One fused auto-bucket call, raw pcm24 delivery (per-call key derived
    IN-GRAPH from the base key + call index — key_fold; an eager fold_in
    is 1-2 tunnel dispatches). The packed 24-bit PCM rows + lengths are the
    exact frames write_wav/serving emit, i.e. the complete deliverable
    (raw_pcm24 skips the ~1.6 ms host f32 unpack)."""
    out = pipeline.synthesise_batch(
        x, np.asarray([x.shape[-1]], np.int32), key,
        n_timesteps=N_STEPS, temperature=TEMPERATURE,
        length_scale=LENGTH_SCALE, fixed_y_bucket="auto",
        key_fold=1000 + i, raw_pcm24=True,
    )
    # the single packed sync already delivered the samples host-side
    assert out["pcm24_bytes_host"] is not None
    return out


def warm_probes(pipeline, sentences, key):
    """Compile EVERY graph the probes touch (the round-4 fix: new probe
    graphs must never compile inside timed regions). Per sentence: the
    fused auto graph is called until its bucket choice stabilises (the
    calibration ratio is a running max, so one non-saturated call pins
    it). Also warms: the trivial RTT probe, the payload split/fetch
    graphs, and the fixed-bucket queue/pipeline graph (identical HLO to
    the auto graph once the bucket matches).

    Returns {"buckets": {name: bucket}, "tiny": fn, "buf_fn": fn, "k": n}.
    """
    import jax
    import jax.numpy as jnp

    from matcha_tpu.cli import _fetch_parts_host, _n_fetch_parts, _split_parts

    # The calibration ratio is a RUNNING MAX shared across sentences, so a
    # later sentence can raise it and shift an earlier sentence's auto
    # bucket — sweep all sentences repeatedly until a full pass changes no
    # bucket (mel lengths are duration-deterministic, so the final ratio is
    # reached after one pass and pass 2 warms any escalated bucket).
    buckets = {name: {"bucket": None} for name in sentences}
    for sweep in range(4):  # stabilises after <=2 full passes
        changed = False
        for name, x in sentences.items():
            out = _call_auto(pipeline, x, key, 10 * sweep)
            b = int(out["mel"].shape[-1])
            ml = int(out["mel_lengths_host"][0])
            assert ml < b, "auto bucket must not truncate"
            if b != buckets[name]["bucket"]:
                changed = True
                print(f"# warmed fused graph: {name} bucket={b}", flush=True)
            buckets[name] = {"bucket": b, "mel_frames": ml}
        if not changed:
            break

    # trivial-RTT probe graph
    tiny = jax.jit(lambda a: a + 1.0)
    float(tiny(jnp.float32(0)))

    # payload probe graph: a buffer the size of the typical packed result,
    # split into the same <=72 KB fetch parts the pipeline ships
    typ_bucket = buckets["typical"]["bucket"]
    n_bytes = (typ_bucket * HOP + 1) * 3  # pcm24 rows the fused graph ships
    k = _n_fetch_parts(n_bytes)
    buf_fn = jax.jit(
        lambda s: _split_parts(jnp.full((1, n_bytes), s, jnp.uint8), k))
    _fetch_parts_host(buf_fn(jnp.uint8(0)))
    return {"buckets": buckets, "tiny": tiny, "buf_fn": buf_fn, "k": k,
            "payload_bytes": n_bytes}


def probe_sentence(pipeline, x, key, n_calls: int = 30):
    """Timed per-call latency through the fused auto graph (warm)."""
    times = []
    for i in range(n_calls):
        t0 = time.perf_counter()
        out = _call_auto(pipeline, x, key, 2 + i)  # distinct fold per call
        times.append((time.perf_counter() - t0) * 1e3)
    # delivered-bytes validity check (outside the timed region: byte
    # consumers never decode — write_wav/serve pass the frames through)
    from matcha_tpu.cli import _unpack_pcm24

    wav, _ = _unpack_pcm24(out["pcm24_bytes_host"])
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0
    ml = int(out["mel_lengths_host"][0])
    return {
        "p50": float(np.percentile(times, 50)),
        "p90": float(np.percentile(times, 90)),
        "histogram_ms": {f"p{p}": round(float(np.percentile(times, p)), 2)
                         for p in (10, 25, 50, 75, 90, 99)},
        "auto_bucket": int(out["mel"].shape[-1]),
        "audio_seconds": round(ml * HOP / SR, 2),
    }


def probe_rtt(tiny, n_calls: int = 30):
    """Tunnel floor: dispatch + scalar fetch of a trivial jitted op. The
    difference p50 - floor approximates on-device + runtime time."""
    import jax.numpy as jnp

    rtts = []
    for i in range(n_calls):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(i)))  # varied input (identical calls dedupe)
        rtts.append((time.perf_counter() - t0) * 1e3)
    return round(float(np.percentile(rtts, 50)), 2)


def probe_payload(buf_fn, k, n_calls: int = 30):
    """Payload-rate probe: fetch a buffer the size of the typical packed
    result THE WAY THE PIPELINE DOES — split into <=72 KB parts pulled
    over concurrent streams (cli._fetch_parts_host; each stream rides
    the tunnel's flat <=128 KB region and they overlap). The trivial-RTT
    probe can't see per-MB transfer-rate degradation (tunnel weather
    moves it hour to hour), so without this a slow hour reads as
    "device got slower". device ~= p50 - payload fetch (the payload
    probe itself includes one RTT). A serial single-stream fetch of the
    same bytes is also recorded so the stream win stays visible."""
    import jax.numpy as jnp

    from matcha_tpu.cli import _fetch_parts_host

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
    return (round(float(np.percentile(fetches, 50)), 2),
            round(float(np.percentile(serial, 50)), 2))


def _call_fixed(pipeline, x, key, bkt, i):
    """Dispatch-only fused call at a fixed integer bucket (same compiled
    graph the auto mode settled on — no per-call host sync)."""
    return pipeline.synthesise_batch(
        x, np.asarray([x.shape[-1]], np.int32), key, key_fold=5000 + i,
        n_timesteps=N_STEPS, temperature=TEMPERATURE,
        length_scale=LENGTH_SCALE, fixed_y_bucket=bkt)


def probe_queued(pipeline, x, key, bkt, payload_fetch_ms: float, n_q: int = 10):
    """Pure device time of the typical fused graph: queue N dispatches
    back-to-back (fixed int bucket — no per-call host sync) and force
    with ONE fetch. This is what the chip does per call independent of
    the tunnel hour: on a locally-attached TPU the e2e call is ~this plus
    PCIe-scale transfers, so it is the number that carries the <=50 ms
    target to real deployments even when the link inflates e2e here."""
    from matcha_tpu.cli import fetch_fused_host

    t0 = time.perf_counter()
    outs = [_call_fixed(pipeline, x, key, bkt, 1 + i) for i in range(n_q)]
    fetch_fused_host(outs[-1])
    queued = (time.perf_counter() - t0) * 1e3
    # one payload fetch forces the chain; amortize the rest over the calls
    return round(max(0.0, queued - payload_fetch_ms) / n_q, 2)


def probe_pipelined(pipeline, x, key, bkt, n_calls: int = 30):
    """Double-buffered steady-state latency: keep TWO fused calls in
    flight — dispatch call N+1 before fetching call N — and measure the
    inter-completion interval. If device exec overlaps dispatch/transfer,
    this beats the unloaded per-call number; if the tunnel serialises it
    (like prior pipelining A/Bs), the negative result is the evidence
    that the unloaded latency is a structural floor."""
    from matcha_tpu.cli import fetch_fused_host

    prev = _call_fixed(pipeline, x, key, bkt, 100)
    intervals = []
    t_last = time.perf_counter()
    for i in range(1, n_calls + 1):
        cur = _call_fixed(pipeline, x, key, bkt, 100 + i)  # dispatch N+1
        fetch_fused_host(prev)                             # complete N
        now = time.perf_counter()
        intervals.append((now - t_last) * 1e3)
        t_last = now
        prev = cur
    fetch_fused_host(prev)
    return {
        "pipelined_steady_ms_p50": round(float(np.percentile(intervals, 50)), 2),
        "pipelined_steady_ms_p90": round(float(np.percentile(intervals, 90)), 2),
    }


def main() -> None:
    budget = Budget(BUDGET_S)
    old_handlers = budget.install_signal_handlers()
    _install_compile_counter()

    record = {
        "metric": "serving_throughput_128utt_bucketed",
        "value": None,
        "unit": "x_realtime_per_chip",
        "vs_baseline": None,
        "latency_target_ms": 50.0,
        "protocol": (
            "128-utt filelist, sorted B=8, staged corpus serving (one host "
            "sync), dynamic mel buckets + finer vocoder buckets, 10 Euler "
            "steps, full text->wav incl. vocoder+denoiser; latency via the "
            "AUTO-bucketed fused graph (fixed_y_bucket='auto', truncation-"
            "free, ONE packed host sync per call shipping device-quantized "
            "24-bit PCM — the written-WAV encoding — over parallel <=72KB "
            "fetch streams), typical ~3.4s-audio sentence headline + long "
            "~6.4s secondary"),
    }
    errors = []
    compile_counts = {}

    def stage(name):
        print(f"# {name} (t={budget.elapsed():.0f}s)", flush=True)

    try:
        _wait_for_devices()
        import jax

        pipeline = build_pipeline()
        utts = make_corpus(np.random.default_rng(0))
        key = jax.random.PRNGKey(0)

        # Warmup sweep: compiles every (x-bucket, y-bucket) pair the corpus
        # hits, exactly as a warmed-up serving process would hold them.
        stage("warmup sweep (compiles land here; cold cache = minutes/bucket "
              "through the remote-compile tunnel)")
        run_batched(pipeline, utts, key)

        stage("timed corpus sweep")
        with count_compiles() as cc:
            audio_seconds, wall = run_batched(
                pipeline, utts, jax.random.fold_in(key, 1))
        compile_counts["timed_corpus"] = cc.count
        throughput = audio_seconds / wall
        record.update({
            "value": round(float(throughput), 2),
            "vs_baseline": round(float(throughput) / 200.0, 3),
            "audio_seconds": round(audio_seconds, 1),
            "wall_seconds": round(wall, 3),
        })

        sentences = make_sentences()
        # Seed the fused auto-bucket calibration from the sentences' own
        # predicted lengths so the latency warmup skips the largest-bucket
        # (2048) compile entirely; the saturation-escalation path still
        # guards correctness if the estimate is ever low.
        calibrate_probe_ratio(pipeline, sentences, key)

        if budget.gate("latency_probes", 240):
            stage("latency warmup (fused auto graphs + probe graphs)")
            warm = warm_probes(pipeline, sentences, key)

            stage("latency probes")
            for name, x in sentences.items():
                if not budget.gate(f"latency_{name}", 90):
                    continue
                try:
                    with count_compiles() as cc:
                        record[f"latency_{name}" if name != "typical"
                               else "latency_typical"] = probe_sentence(
                            pipeline, x, key)
                    compile_counts[f"latency_{name}"] = cc.count
                except Exception as e:  # noqa: BLE001 — record, keep going
                    errors.append(f"latency_{name}: {type(e).__name__}: {e}")
            if "latency_long" in record:  # key parity with earlier rounds
                record["latency_long_sentence"] = record.pop("latency_long")
            lt = record.get("latency_typical")
            if lt:
                record["p50_single_sentence_latency_ms"] = round(lt["p50"], 2)
                record["p90_single_sentence_latency_ms"] = round(lt["p90"], 2)

            probes = [
                ("tunnel_rtt", 60,
                 lambda: {"tunnel_rtt_ms_p50": probe_rtt(warm["tiny"])}),
                ("payload_fetch", 90, lambda: dict(zip(
                    ("payload_fetch_ms_p50", "payload_fetch_serial_ms_p50"),
                    probe_payload(warm["buf_fn"], warm["k"])),
                    payload_fetch_streams=warm["k"],
                    payload_kb=round(warm["payload_bytes"] / 1024.0, 1))),
            ]
            for pname, need, fn in probes:
                if not budget.gate(pname, need):
                    continue
                try:
                    with count_compiles() as cc:
                        record.update(fn())
                    compile_counts[pname] = cc.count
                except Exception as e:  # noqa: BLE001
                    errors.append(f"{pname}: {type(e).__name__}: {e}")

            fetch50 = record.get("payload_fetch_ms_p50")
            if lt and fetch50 is not None:
                for k2 in ("latency_typical", "latency_long_sentence"):
                    if k2 in record:
                        record[k2]["device_ms_p50_estimate"] = round(
                            record[k2]["p50"] - fetch50, 2)

            x_t = sentences["typical"]
            bkt = warm["buckets"]["typical"]["bucket"]
            tail_probes = [
                ("fused_device_queued", 90, lambda: {
                    "fused_device_ms_queued": probe_queued(
                        pipeline, x_t, key, bkt, fetch50 or 0.0)}),
                ("pipelined_latency", 90,
                 lambda: probe_pipelined(pipeline, x_t, key, bkt)),
            ]
            for pname, need, fn in tail_probes:
                if not budget.gate(pname, need):
                    continue
                try:
                    with count_compiles() as cc:
                        out = fn()
                    compile_counts[pname] = cc.count
                    if "fused_device_ms_queued" in out and lt:
                        record["latency_typical"]["fused_device_ms_queued"] = \
                            out.pop("fused_device_ms_queued")
                    record.update(out)
                except Exception as e:  # noqa: BLE001
                    errors.append(f"{pname}: {type(e).__name__}: {e}")
    except BudgetExceeded as e:
        errors.append(f"budget: {e}")
    except Exception as e:  # noqa: BLE001 — partial record over no record
        errors.append(f"{type(e).__name__}: {e}")
    finally:
        signal.alarm(0)
        for sig, handler in old_handlers.items():
            signal.signal(sig, handler)
        if budget.skipped:
            record["skipped"] = budget.skipped
        if errors:
            record["errors"] = errors
        record["compile_events"] = compile_counts
        record["bench_wall_s"] = round(budget.elapsed(), 1)
        print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
