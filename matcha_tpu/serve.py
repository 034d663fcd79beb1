"""``matcha-serve``: production HTTP serving daemon.

The reference ships a demo UI (matcha/app.py) but no serving runtime; a
production deployment needs a process that keeps the compiled graphs warm
and turns concurrent requests into efficient device batches. This daemon
is that runtime, TPU-first:

* **Warm start** — ``--warmup`` pre-compiles the chosen (x-bucket,
  y-bucket) graph pairs before the port opens, so no request ever pays a
  compile (with the persistent XLA cache, warmup after a restart is a
  disk load).
* **Dynamic micro-batching** — concurrent requests queue; a batcher
  thread drains up to ``--max-batch`` of them (waiting at most
  ``--batch-window-ms`` after the first), pads them into ONE bucketed
  batch and runs a single SPMD dispatch. Batching is where TPU serving
  throughput comes from (PERFORMANCE.md: 1.7x realtime at B=1 vs 330x+
  batched); the window bounds the latency cost.
* **Stdlib only** — ``http.server.ThreadingHTTPServer``; no framework
  dependencies. JSON in, WAV (24-bit PCM) or JSON out.

Endpoints:
  POST /synthesise   {"text": ..., ["speaking_rate": f], ["spk": i],
                      ["format": "wav"|"json"]}
      -> audio/wav bytes (default), or JSON with latency/RTF metadata.
  GET  /healthz      -> {"status": "ok", "batches": N, "requests": N}

Run:  matcha-serve --port 8080 --warmup 128:512 [model/vocoder flags]
"""

import argparse
import io
import json
import queue
import threading
import time
import wave
from collections import deque
from dataclasses import dataclass, field

import numpy as np

from matcha_tpu.cli import TTSPipeline

SR = 22050
HOP = 256
#: request-body cap: text is the only client payload; 1 MB of text is
#: already ~2.5 hours of speech — anything bigger is abuse, and an
#: unbounded read lets one request hold a handler thread on a huge body
MAX_BODY_BYTES = 1 << 20


from matcha_tpu.utils.utils import pcm24_bytes as pcm24  # shared with write_wav


def wav_bytes(audio: np.ndarray, sample_rate: int = SR) -> bytes:
    """Mono 24-bit PCM WAV in memory (same encoding as utils.write_wav)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(3)
        f.setframerate(sample_rate)
        f.writeframes(pcm24(audio))
    return buf.getvalue()


def wav_stream_header(sample_rate: int = SR, sampwidth: int = 3) -> bytes:
    """A WAV header with unknown-length placeholder sizes (0x7FFFFFFF) —
    the standard trick for live WAV-over-HTTP streams; players read PCM
    until the connection closes."""
    import struct

    byte_rate = sample_rate * sampwidth
    return (
        b"RIFF" + struct.pack("<I", 0x7FFFFFFF) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                byte_rate, sampwidth, 8 * sampwidth)
        + b"data" + struct.pack("<I", 0x7FFFFFFF)
    )


@dataclass
class _Request:
    seq: np.ndarray          # 1-D int32 phoneme ids
    speaking_rate: float
    spk: int | None
    done: threading.Event = field(default_factory=threading.Event)
    wav: np.ndarray | None = None
    n_frames: int = 0
    error: str | None = None
    t_enqueue: float = field(default_factory=time.perf_counter)
    t_done: float = 0.0
    #: time-to-first-audio matters more than merge efficiency for this
    #: request (a stream's first chunk): dispatch it alone, immediately,
    #: when the device is idle instead of waiting out the batch window
    urgent: bool = False
    #: long-form/stream chunk (bulk class): fills only the batch slots
    #: interactive requests leave free, so a single streaming client's
    #: burst of chunks cannot queue ahead of interactive traffic
    bulk: bool = False


class BatchingServer:
    """Queue + batcher thread around a warm :class:`TTSPipeline`.

    Requests with the same (speaking_rate, spk) merge into one device
    batch; mixed keys flush separately (speaking_rate is baked into the
    encode graph as a trace constant, cli.py _encode_fn)."""

    #: speaking_rate is a jit trace constant (a new value = a fresh XLA
    #: compile, minutes over a remote-compile tunnel, serialized on the
    #: single batcher thread). Client rates are therefore clamped to this
    #: range and snapped to the nearest RATE_STEP so the compile surface
    #: is a small finite set instead of the float continuum.
    RATE_RANGE = (0.5, 2.0)
    RATE_STEP = 0.05

    def __init__(self, pipeline: TTSPipeline, max_batch: int = 8,
                 batch_window_ms: float = 10.0, n_timesteps: int = 10,
                 temperature: float = 0.667, default_rate: float = 1.0,
                 seed: int = 1234, default_spk: int | None = None,
                 pipelined: bool = False, fused_single: bool = True):
        import jax

        self.jax = jax
        self.pipeline = pipeline
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1e3
        self.n_timesteps = n_timesteps
        self.temperature = temperature
        # Operator-chosen default rate is trusted verbatim (it defines ONE
        # trace group and is warmed below); only per-request client rates
        # are quantized/clamped, since those drive unbounded compiles.
        self.default_rate = float(default_rate)
        # Default speaker for multispeaker models: a request that omits
        # "spk" must not reach MatchaTTS._speaker(None) (spk embedding
        # lookup needs an id), so the registry/CLI default applies here.
        self.default_spk = default_spk
        self._key = jax.random.PRNGKey(seed)
        self._n_calls = 0
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # bulk-class (long-form chunk) requests displaced by interactive
        # traffic carry over here, FIFO; touched only by the batcher thread
        # (len() reads from other threads are safe)
        self._bulk_backlog: "deque[_Request]" = deque()
        self._stop = threading.Event()
        # guards the request/batch counters and the timeout-vs-dispatch
        # race on _Request.error (see _loop / submit)
        self._lock = threading.Lock()
        self.n_batches = 0
        self.n_requests = 0
        # largest T_x bucket warmed so far; texts longer than this would
        # trigger a fresh compile that stalls all queued traffic, so they
        # are rejected at enqueue time (None until warmup() runs = accept
        # anything, e.g. tests that tolerate compiles).
        self.max_warm_x: int | None = None
        # Dispatch/fetch pipelining (opt-in): the batcher thread only
        # DISPATCHES device work; a responder thread fetches results and
        # wakes clients, overlapping the ~30-45 ms result transfer with
        # the next batch's dispatch. Measured OFF by default: on the
        # remote-dispatch (tunnel) backend the dispatch itself blocks, so
        # the responder only serializes fetch behind dispatch — a same-
        # process A/B on warm graphs gave 22.6 req/s blocking vs 7.0
        # pipelined (scripts/bench_serve.py --ab). On a locally-attached
        # TPU where dispatch is truly async this should be revisited.
        # maxsize bounds in-flight batches (HBM + a stall signal when the
        # responder falls behind).
        self.pipelined = pipelined
        self._completion_q: "queue.Queue" = queue.Queue(maxsize=2)
        self._in_flight = 0  # dispatched batches not yet fetched (batcher/responder)
        # Fused single-request fast path: (T_x bucket, rate, has_spk) ->
        # largest warmed fused mel bucket. A lone request through the
        # dynamic path pays 3 dispatches + 2 host syncs (encode
        # y_lengths fetch + result fetch); the fused single-jit graph
        # (cli._fused_fn — the CLI latency path) does it in ONE dispatch
        # + ONE packed fetch (~3x lower unloaded latency / stream TTFA).
        # Only COMPILED graphs are used (registered by warmup), so the
        # fast path can never stall traffic on a fresh compile; a
        # saturated result (mel_lengths hit the bucket) re-runs through
        # the dynamic path (_complete fallback).
        self.fused_single = fused_single
        self._fused_warm: dict = {}
        #: warmed x-buckets (sorted). Short sequences route UP to the
        #: smallest warmed bucket: padding a 50-id text to a 128 bucket
        #: costs ~nothing (the encoder is ~1 ms) but keeps the compile
        #: surface EXACTLY the warmed set — without this, a drain-tail
        #: batch of short texts hit fresh small-bucket shapes and stalled
        #: live traffic on multi-minute tunnel compiles (soak finding).
        self._warm_x: list = []
        self._busy = False  # batcher currently dispatching (any mode)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self._responder = threading.Thread(target=self._respond_loop, daemon=True)
        self._responder.start()

    def _quantize_rate(self, rate: float) -> float:
        lo, hi = self.RATE_RANGE
        rate = min(max(float(rate), lo), hi)
        return round(round(rate / self.RATE_STEP) * self.RATE_STEP, 2)

    # -- client side -------------------------------------------------------
    def _enqueue(self, text: str, speaking_rate: float | None,
                 spk: int | None, urgent: bool = False,
                 bulk: bool = False) -> _Request:
        """Phonemize and queue without waiting (streaming building block)."""
        from matcha_tpu.text import text_to_sequence
        from matcha_tpu.utils.utils import intersperse

        seq = intersperse(text_to_sequence(text, [self.pipeline.cleaner]), 0)
        if self.max_warm_x is not None and len(seq) > self.max_warm_x:
            raise ValueError(
                f"text too long: {len(seq)} phoneme ids > largest warmed "
                f"bucket {self.max_warm_x}; split the request (or use "
                f"/synthesise_long) or restart with a bigger --warmup")
        req = _Request(
            seq=np.asarray(seq, np.int32),
            speaking_rate=(self.default_rate if speaking_rate is None
                           else self._quantize_rate(speaking_rate)),
            spk=self.default_spk if spk is None else int(spk),
            urgent=urgent,
            bulk=bulk,
        )
        with self._lock:
            self.n_requests += 1
        self._q.put(req)
        return req

    def submit(self, text: str, speaking_rate: float | None = None,
               spk: int | None = None, timeout_s: float = 120.0) -> _Request:
        req = self._enqueue(text, speaking_rate, spk)
        if not req.done.wait(timeout_s):
            # the same lock the batcher sheds under: if the batch already
            # dispatched (done set between wait() and here), keep the result
            with self._lock:
                if not req.done.is_set():
                    req.error = "timeout"
        return req

    def _fit_chunks(self, text: str, max_chars: int) -> list[str]:
        """Sentence-chunk ``text`` so every chunk fits the warmed x-buckets.

        The char budget is first clamped to what ``max_warm_x`` can hold
        (intersperse emits ~2 ids per cleaned symbol), then each chunk is
        verified at the ID level and re-split when the cleaner expanded it
        past the bucket (e.g. "1999" -> "nineteen ninety nine") — without
        this, a default ``max_chars`` larger than the warmed bucket made
        every /synthesise_long|_stream request fail the too-long guard."""
        from matcha_tpu.text import text_to_sequence
        from matcha_tpu.text.segment import split_sentences

        if self.max_warm_x is not None:
            max_chars = min(max_chars, max(8, (self.max_warm_x - 1) // 2))
        chunks = split_sentences(text, max_chars=max_chars)
        if self.max_warm_x is None:
            return chunks
        out: list[str] = []
        pending = list(chunks)
        while pending:
            c = pending.pop(0)
            n_ids = 2 * len(text_to_sequence(c, [self.pipeline.cleaner])) + 1
            if n_ids <= self.max_warm_x:
                out.append(c)
                continue
            halves = split_sentences(c, max_chars=max(8, len(c) // 2))
            if len(halves) <= 1:
                out.append(c)  # unsplittable: _enqueue raises a clear 400
            else:
                pending = halves + pending
        return out

    def submit_stream(self, text: str, speaking_rate: float | None = None,
                      spk: int | None = None, timeout_s: float = 600.0,
                      max_chars: int = 200):
        """Streaming long-form synthesis: enqueue every sentence chunk at
        once (they merge into device batches), then yield each chunk's
        completed request IN ORDER as it finishes — time-to-first-audio is
        one dispatch, not the whole article."""
        chunks = self._fit_chunks(text, max_chars)
        # Mark the first chunk urgent only when the server is idle AT
        # ENQUEUE TIME: the batcher then dispatches it solo on the fused
        # fast path (time-to-first-audio = one dispatch) while the sibling
        # chunks merge into the next batch. Under load the queue is
        # non-empty here, urgency stays off, and merging wins.
        idle = (self._q.empty() and not self._busy and self._in_flight == 0
                and not self._bulk_backlog)
        reqs = [self._enqueue(c, speaking_rate, spk,
                              urgent=(i == 0 and idle and len(chunks) > 1),
                              bulk=True)
                for i, c in enumerate(chunks)]
        for r in reqs:
            if not r.done.wait(timeout_s):
                # same locked re-check as submit(): a chunk completed
                # between wait() expiry and here keeps its result
                with self._lock:
                    if not r.done.is_set():
                        r.error = "timeout"
            yield r

    def submit_long(self, text: str, speaking_rate: float | None = None,
                    spk: int | None = None, timeout_s: float = 600.0,
                    max_chars: int = 200):
        """Long-form synthesis: sentence-chunk the text and submit every
        chunk CONCURRENTLY — the batching window merges a single long
        request's chunks into full device batches (the long-form analog
        of CLI --long-form, but batched instead of sequential). Returns
        the ordered list of per-chunk requests.

        ``max_chars`` is smaller than the CLI's 500: shorter chunks mean
        more of them, which is what lets one request fill a batch."""
        return list(self.submit_stream(text, speaking_rate, spk, timeout_s,
                                       max_chars=max_chars))

    def shutdown(self):
        self._stop.set()
        self._q.put(None)  # unblock the worker
        self._thread.join(timeout=5)
        # The responder's sentinel is enqueued by the batcher itself when
        # its loop exits (_loop tail) so it can never overtake a batch the
        # batcher is still dispatching; here we only wait.
        self._responder.join(timeout=5)

    # -- batcher thread ----------------------------------------------------
    def _take_batch(self):
        """Merge queued requests into one batch.

        Accumulate-while-busy scheduling: while a previous batch is still
        in flight on the device, waiting costs NO device time — so keep
        merging until the batch fills or the device frees, instead of
        dispatching whatever trickled in during the fixed window
        (premature dispatch fragments merges and tanks occupancy under
        closed-loop load). The ``batch_window_ms`` clock only runs while
        the device is idle; it restarts when the device frees so clients
        woken by the previous batch's results can join this one.

        Two request classes (interactive over bulk): long-form/stream
        chunks (``bulk=True``) arrive in bursts — an article enqueues all
        its sentence chunks at once — and a FIFO would park them AHEAD of
        interactive requests for several whole batches (measured p90
        regression 290 → 420 ms under the round-3 mixed workload).
        Interactive requests therefore take batch slots first; bulk
        chunks fill only the residual slots, and the remainder carries
        over in ``_bulk_backlog`` (FIFO within the class) to the next
        batch. With no interactive traffic queued, bulk fills whole
        batches — full throughput for lone streaming clients."""
        interactive: list = []
        bulk: list = list(self._bulk_backlog)
        self._bulk_backlog.clear()
        if not bulk:
            first = self._q.get()
            if first is None:
                return []
            if first.urgent:
                # a stream's first chunk enqueued on an idle server
                # (decided at enqueue time — its SIBLING chunks are queued
                # behind it by now): skip the batch window and dispatch it
                # solo on the fused fast path; time-to-first-audio is one
                # dispatch away while the siblings merge into later
                # batches.
                return [first]
            (bulk if first.bulk else interactive).append(first)
        stop = False
        deadline = time.perf_counter() + self.batch_window_s
        busy_prev = self._in_flight > 0
        # Collection runs until INTERACTIVE slots fill (not total slots):
        # excess bulk drains into the backlog instead of blocking the scan,
        # so an interactive request queued behind a 20-chunk stream burst
        # is found and seated this batch rather than 2-3 batches later.
        while not stop and len(interactive) < self.max_batch:
            busy = self._in_flight > 0
            if busy_prev and not busy:
                # device just freed: fresh window for the woken clients
                deadline = time.perf_counter() + self.batch_window_s
            busy_prev = busy
            if (len(interactive) + len(bulk) >= self.max_batch
                    and not busy and self._q.empty()):
                break  # a full batch is ready and nothing is left to reorder
            remaining = deadline - time.perf_counter()
            if not busy and remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=0.002 if busy else max(remaining, 1e-4))
            except queue.Empty:
                continue
            if nxt is None:
                stop = True
            elif nxt.bulk and not nxt.urgent:
                bulk.append(nxt)
            else:
                interactive.append(nxt)
        residual = self.max_batch - len(interactive)
        self._bulk_backlog.extend(bulk[residual:])
        return interactive + bulk[:residual]

    def _loop(self):
        try:
            self._loop_inner()
        finally:
            # ordered after every dispatch this thread made: the responder
            # drains all queued batches, then exits
            self._completion_q.put(None)

    def _loop_inner(self):
        while not self._stop.is_set():
            batch = self._take_batch()
            if not batch:
                continue
            # shed abandoned work: a request whose submit() already timed
            # out has no reader — synthesizing it would spend full device
            # dispatches on waveforms nobody fetches, so overload backlogs
            # would never drain. Under the lock so a concurrent submit()
            # timeout cannot land between this check and the dispatch.
            with self._lock:
                batch = [r for r in batch if r.error is None]
            if not batch:
                continue
            # group by trace-constant key; typically one group
            groups: dict[tuple, list[_Request]] = {}
            for r in batch:
                groups.setdefault((r.speaking_rate, r.spk), []).append(r)
            self._busy = True
            try:
                for (rate, spk), reqs in groups.items():
                    with self._lock:
                        self._in_flight += 1
                    try:
                        self._run(reqs, rate, spk)
                    except Exception as e:  # pragma: no cover - device errors
                        with self._lock:
                            self._in_flight -= 1
                        for r in reqs:
                            r.error = f"{type(e).__name__}: {e}"
                            r.done.set()
            finally:
                self._busy = False

    def _run(self, reqs, rate, spk, allow_fused: bool = True):
        if (allow_fused and len(reqs) == 1 and self.pipeline.mesh is None
                and self._fused_warm):
            # fused single-request fast path: ONE dispatch + ONE packed
            # fetch through the pre-compiled CLI latency graph
            r = reqs[0]
            T_x = self._route_x(len(r.seq))
            T_y = self._pick_fused_bucket(T_x, rate, spk is not None,
                                          len(r.seq))
            if T_y:
                # lock pairs with _complete's saturation fallback: in
                # pipelined mode that runs on the responder thread, and a
                # lost _n_calls increment would reuse a PRNG fold
                # (identical CFM noise for two different requests)
                with self._lock:
                    self._n_calls += 1
                    n_call = self._n_calls
                x1 = np.zeros((1, T_x), np.int32)
                x1[0, : len(r.seq)] = r.seq
                out = self.pipeline.synthesise_batch(
                    x1, np.asarray([len(r.seq)], np.int32),
                    self._key, key_fold=n_call,  # folded in-graph: an eager
                    # fold_in is 1-2 extra tunnel dispatches on this path
                    n_timesteps=self.n_timesteps, temperature=self.temperature,
                    length_scale=rate, fixed_y_bucket=T_y,
                    spks=None if spk is None else np.full((1,), int(spk), np.int32),
                )
                out["_fused_T_y"] = T_y  # saturation fallback marker
                if self.pipelined:
                    self._completion_q.put((reqs, out))
                else:
                    self._complete(reqs, out)
                return
        # Pad the batch dim to a power of two: merged batches can arrive at
        # any size 1..max_batch, and every distinct (B, T_x bucket) is a
        # separate XLA compile. Power-of-2 B-buckets bound the compile
        # surface to log2(max_batch)+1 shapes per x-bucket; dummy rows
        # (length 1, all-pad tokens) are sliced off after the dispatch.
        B_real = len(reqs)
        B = 1
        while B < B_real:
            B *= 2
        # route up to a WARMED x-bucket (see _warm_x): the batch then hits
        # only pre-compiled (B, T_x) shapes regardless of text lengths
        T = self._route_x(max(len(r.seq) for r in reqs))
        x = np.zeros((B, T), np.int32)  # synthesise_batch pads to the x-bucket
        xl = np.ones((B,), np.int32)
        for i, r in enumerate(reqs):
            x[i, : len(r.seq)] = r.seq
            xl[i] = len(r.seq)
        spks = None if spk is None else np.full((B,), int(spk), np.int32)
        with self._lock:  # see the fused-path note on _n_calls
            self._n_calls += 1
            n_call = self._n_calls
        out = self.pipeline.synthesise_batch(
            x, xl, self.jax.random.fold_in(self._key, n_call),
            n_timesteps=self.n_timesteps, temperature=self.temperature,
            length_scale=rate, spks=spks,
            # wire-format result: device-quantized 24-bit PCM + lengths in
            # ONE transfer (25% less payload + one fewer tunnel round trip)
            pack_wav=self.pipeline.pcm24_transfer,
        )
        # NOTE (measured, round 3): trimming the padding rows on device
        # before the fetch (out[k][:B_real]) saves transfer only when
        # B_real < pow2 padding — but each distinct slice shape is its own
        # tunnel-priced compile (a window-end B_real=3 trim stalled live
        # traffic for 22 s). The padding-row transfer it saves is small
        # under saturation (B_real ~= max_batch), so no trim: fetch the
        # padded batch as-is.
        if self.pipelined:
            # hand the (device-resident) results to the responder; blocks
            # only when 2 batches already await fetch (backpressure)
            self._completion_q.put((reqs, out))
        else:
            self._complete(reqs, out)

    def _route_x(self, n: int) -> int:
        """Smallest WARMED x-bucket covering ``n`` ids (falls back to the
        plain bucket grid when nothing warmed covers it)."""
        from matcha_tpu.cli import X_BUCKETS, pick_bucket

        for b in self._warm_x:
            if b >= n:
                return b
        return pick_bucket(n, X_BUCKETS)

    def _pick_fused_bucket(self, T_x, rate, has_spk, n_ids):
        """Tightest WARMED fused mel bucket covering the estimated length
        (the pipeline's self-calibrating frames-per-token ratio, as the
        CLI's auto mode uses); the largest warmed bucket when uncalibrated.
        The saturation fallback in _complete corrects any underestimate."""
        buckets = self._fused_warm.get((T_x, rate, has_spk))
        if not buckets:
            return None
        ratio = self.pipeline._dur_ratio
        if ratio is None:
            return buckets[-1]
        est = n_ids * rate * ratio * self.pipeline.FUSED_MARGIN
        for b in buckets:
            if b >= est:
                return b
        return buckets[-1]

    def _complete(self, reqs, out):
        """Fetch a dispatched batch's results and wake its clients."""
        try:
            wavs, mel_lengths = self._fetch(out)
            T_y = out.get("_fused_T_y")
            if T_y is not None and reqs[0].speaking_rate > 0:
                # calibrate the shared frames-per-token ratio from every
                # non-saturated fused result (same update as CLI auto mode)
                ml0 = int(mel_lengths[0])
                if ml0 < T_y:
                    obs = ml0 / (len(reqs[0].seq) * reqs[0].speaking_rate)
                    self.pipeline.observe_dur_ratio(obs)
            if T_y is not None and int(mel_lengths[0]) >= T_y:
                # fused fast path saturated (the warmed bucket was too
                # small for this utterance): re-run through the dynamic
                # path, inline (rare; correctness over latency here).
                # Pad the text to a WARMED x-bucket like _run does —
                # r.seq's raw length would let pick_bucket choose an
                # x-bucket warmup never compiled, stalling all queued
                # traffic for a tunnel-compile (the no-compile-after-
                # warmup invariant).
                r = reqs[0]
                T_x = self._route_x(len(r.seq))
                x1 = np.zeros((1, T_x), np.int32)
                x1[0, : len(r.seq)] = r.seq
                with self._lock:
                    self._n_calls += 1
                    n_call = self._n_calls
                out2 = self.pipeline.synthesise_batch(
                    x1, np.asarray([len(r.seq)], np.int32),
                    self.jax.random.fold_in(self._key, n_call),
                    n_timesteps=self.n_timesteps, temperature=self.temperature,
                    length_scale=r.speaking_rate,
                    spks=(None if r.spk is None
                          else np.full((1,), int(r.spk), np.int32)),
                    pack_wav=self.pipeline.pcm24_transfer,
                )
                wavs, mel_lengths = self._fetch(out2)
        except Exception as e:  # pragma: no cover - device errors
            with self._lock:
                self._in_flight -= 1
            for r in reqs:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()
            return
        self.n_batches += 1
        with self._lock:  # pairs with submit()'s timeout re-check
            self._in_flight -= 1
            for i, r in enumerate(reqs):
                n = int(mel_lengths[i])
                r.n_frames = n
                r.wav = wavs[i, : n * HOP]
                r.t_done = time.perf_counter()
                r.done.set()

    def _fetch(self, out):
        """Host-fetch a dispatch's (waveforms, mel_lengths) — whichever
        wire format the graph shipped."""
        from matcha_tpu.cli import fetch_fused_host

        return fetch_fused_host(out)

    def _respond_loop(self):
        """Fetch completed batches and wake their clients — runs parallel
        to the batcher so result transfer overlaps the next dispatch."""
        while True:
            item = self._completion_q.get()
            if item is None:
                return
            self._complete(*item)

    # -- warmup ------------------------------------------------------------
    def warmup(self, pairs):
        """Pre-compile (T_x, T_y) graph pairs at every power-of-2 batch
        size up to max_batch — exactly the (B, shape) set `_run`'s
        batch-dim padding can produce. The vocoder is warmed at every
        finer VOC_BUCKETS length that can land inside (prev Y bucket,
        T_y] — the shapes ``synthesise_batch``'s padding-tail slicing
        actually dispatches (a full-T_y-only warm would leave real
        requests paying the vocoder compile)."""
        from matcha_tpu.cli import VOC_BUCKETS, Y_BUCKETS

        sizes = {1}
        b = 1
        while b < self.max_batch:
            b *= 2
            sizes.add(b)
        for T_x, T_y in pairs:
            # Warm EVERY dynamic-path shape reachable under this pair —
            # all Y_BUCKETS <= T_y, each with its finer vocoder lengths —
            # not just T_y itself: a short merged batch picks an
            # intermediate mel bucket, and ONE cold shape stalls all
            # queued traffic for tunnel-compile minutes (measured in
            # scripts/soak_serve.py). With the persistent compilation
            # cache this full sweep is a one-time cost per deployment.
            y_buckets = [y for y in Y_BUCKETS if y <= T_y] or [T_y]
            for B in sorted(sizes):
                x = np.ones((B, T_x), np.int32)
                xl = np.full((B,), T_x, np.int32)
                # warm the same speaker shape real requests dispatch with:
                # for a multispeaker model every request carries default_spk
                spks = (None if self.default_spk is None
                        else self.jax.numpy.full((B,), int(self.default_spk),
                                                 self.jax.numpy.int32))
                mu_x, w_ceil, y_lengths = self.pipeline._encode_fn(T_x, self.default_rate)(
                    self.pipeline.params, self.jax.numpy.asarray(x),
                    self.jax.numpy.asarray(xl), spks)
                for T_yb in y_buckets:
                    prev_y = max([y for y in Y_BUCKETS if y < T_yb], default=0)
                    voc_lens = [v for v in VOC_BUCKETS if prev_y < v <= T_yb] or [T_yb]
                    out = self.pipeline._decode_fn(T_x, T_yb, self.n_timesteps, self.temperature)(
                        self.pipeline.params, mu_x, w_ceil,
                        self.jax.numpy.asarray(xl), y_lengths,
                        self.jax.random.PRNGKey(0), spks=spks)
                    if self.pipeline.vocoder is not None:
                        jnp = self.jax.numpy
                        mel_btc = jnp.swapaxes(out["mel"], 1, 2)
                        for T_voc in voc_lens:
                            if self.pipeline.pcm24_transfer:
                                # warm the SAME packed graph _run dispatches
                                self.pipeline._vocode_packed_fn()(
                                    self.pipeline.vocoder_params, mel_btc[:, :T_voc],
                                    jnp.float32(self.pipeline.denoiser_strength),
                                    out["mel_lengths"])
                            else:
                                self.pipeline._vocode_fn()(
                                    self.pipeline.vocoder_params, mel_btc[:, :T_voc],
                                    jnp.float32(self.pipeline.denoiser_strength))
            if self.fused_single and self.pipeline.vocoder is not None:
                # fused single-request fast path (B=1, the CLI latency
                # graph): compile + register it so lone requests / stream
                # first-chunks take ONE dispatch instead of three. Two
                # bucket sizes per pair (T_y/2 and T_y): the tightest
                # covering bucket halves the decode+vocode+payload cost of
                # a typical short utterance vs a one-size bucket.
                x1 = np.ones((1, T_x), np.int32)
                fkey = (T_x, self.default_rate, self.default_spk is not None)
                for T_f in sorted({max(64, T_y // 2), T_y}):
                    self.pipeline.synthesise_batch(
                        x1, np.full((1,), T_x, np.int32), self.jax.random.PRNGKey(0),
                        key_fold=0,  # warm the SAME with_fold graph _run uses
                        n_timesteps=self.n_timesteps, temperature=self.temperature,
                        length_scale=self.default_rate, fixed_y_bucket=T_f,
                        spks=(None if self.default_spk is None
                              else np.full((1,), int(self.default_spk), np.int32)))
                    self._fused_warm.setdefault(fkey, [])
                    if T_f not in self._fused_warm[fkey]:
                        self._fused_warm[fkey] = sorted(
                            self._fused_warm[fkey] + [T_f])
        if pairs:
            # from here on, reject texts that would outgrow the warmed set
            # (each would stall all queued traffic on a minutes-long compile)
            self.max_warm_x = max(self.max_warm_x or 0,
                                  max(T_x for T_x, _ in pairs))
            # ...and route shorter texts UP into these buckets (_route_x)
            self._warm_x = sorted(set(self._warm_x)
                                  | {T_x for T_x, _ in pairs})


def make_http_server(batcher: BatchingServer, host: str = "127.0.0.1", port: int = 8080):
    """ThreadingHTTPServer wired to the batcher (stdlib only)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "batches": batcher.n_batches,
                                 "requests": batcher.n_requests})
            else:
                self._json(404, {"error": "not found"})

        def _stream(self, payload, text):
            """Live WAV stream: header immediately, 24-bit PCM per sentence
            chunk as each device batch completes (close-delimited body)."""
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("X-Sample-Rate", str(SR))
            self.end_headers()
            self.wfile.write(wav_stream_header())
            self.wfile.flush()
            for r in batcher.submit_stream(
                text, payload.get("speaking_rate"), payload.get("spk"),
                max_chars=payload["max_chars"],
            ):
                if r.error:
                    break  # mid-stream error: close the connection early
                self.wfile.write(pcm24(r.wav))
                self.wfile.flush()

        def do_POST(self):
            if self.path not in ("/synthesise", "/synthesise_long", "/synthesise_stream"):
                self._json(404, {"error": "not found"})
                return
            try:
                n = max(0, int(self.headers.get("Content-Length", 0)))
                if n > MAX_BODY_BYTES:
                    self._json(413, {"error": f"body exceeds {MAX_BODY_BYTES} bytes"})
                    return
                payload = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(payload, dict):
                    raise TypeError("payload must be a JSON object")
                text = payload["text"]
                if not isinstance(text, str):
                    raise TypeError("text must be a string")
                # Validate EVERYTHING client-typed BEFORE any 200 header
                # goes out (the stream endpoint writes headers first, so a
                # late conversion failure would kill the connection with no
                # error response). max_chars clamps to a sane range:
                # <= 0 drives the sentence splitter's hard-wrap into
                # zero-progress iteration (an unauthenticated CPU-spin).
                payload["max_chars"] = min(2000, max(20, int(payload.get("max_chars", 200))))
                if payload.get("speaking_rate") is not None:
                    payload["speaking_rate"] = float(payload["speaking_rate"])
                if payload.get("spk") is not None:
                    payload["spk"] = int(payload["spk"])
            # ValueError covers JSONDecodeError, bad Content-Length ints and
            # UnicodeDecodeError (non-UTF-8 bodies); TypeError covers
            # non-object JSON payloads. Anything here is the client's fault.
            except (KeyError, ValueError, TypeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            if self.path == "/synthesise_stream":
                try:
                    self._stream(payload, text)
                except Exception as e:
                    self.log_error("stream failed: %s", e)
                return
            try:
                if self.path == "/synthesise_long":
                    reqs = batcher.submit_long(text, payload.get("speaking_rate"),
                                               payload.get("spk"),
                                               max_chars=payload["max_chars"])
                    err = next((r.error for r in reqs if r.error), None)
                    if err:
                        self._json(500, {"error": err})
                        return
                    req = reqs[0]
                    req.wav = np.concatenate([r.wav for r in reqs])
                    req.t_done = max(r.t_done for r in reqs)
                else:
                    req = batcher.submit(text, payload.get("speaking_rate"),
                                         payload.get("spk"))
            except Exception as e:  # cleaner/frontend rejects the text
                self._json(400, {"error": f"text processing failed: {e}"})
                return
            if req.error:
                self._json(500, {"error": req.error})
                return
            latency_ms = (req.t_done - req.t_enqueue) * 1e3
            audio_s = len(req.wav) / SR
            if payload.get("format") == "json":
                self._json(200, {
                    "n_samples": int(len(req.wav)),
                    "audio_seconds": round(audio_s, 3),
                    "latency_ms": round(latency_ms, 2),
                    "rtf": round(latency_ms / 1e3 / max(audio_s, 1e-9), 4),
                })
                return
            body = wav_bytes(req.wav)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Latency-Ms", f"{latency_ms:.2f}")
            self.end_headers()
            self.wfile.write(body)

    return ThreadingHTTPServer((host, port), Handler)


def _parse_warmup(spec: str):
    pairs = []
    for part in spec.split(","):
        if not part.strip():
            continue
        tx, ty = part.split(":")
        pairs.append((int(tx), int(ty)))
    return pairs


def build_parser():
    p = argparse.ArgumentParser(description="🍵 Matcha-TTS (TPU) serving daemon")
    p.add_argument("--model", type=str, default="matcha_ljspeech")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--vocoder", type=str, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=10.0)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--temperature", type=float, default=0.667)
    p.add_argument("--speaking_rate", type=float, default=None)
    p.add_argument("--spk", type=int, default=None)
    p.add_argument("--warmup", type=str, default="128:512",
                   help="comma list of Tx:Ty bucket pairs to pre-compile (empty to skip)")
    p.add_argument("--no-fused-single", action="store_true",
                   help="disable the fused single-request fast path "
                        "(one-dispatch B=1 graph; saves its warmup compile)")
    p.add_argument("--cleaner", type=str, default="english_cleaners2")
    p.add_argument("--bf16-vocoder", action="store_true")
    p.add_argument("--no-pallas-vocoder", action="store_true")
    p.add_argument("--data-parallel", action="store_true")
    p.add_argument("--vocoder-chunk", type=int, default=0)
    return p


def main(argv=None):
    from matcha_tpu.cli import (
        assert_required_models_available,
        load_matcha,
        load_vocoder,
        validate_args,
    )
    from matcha_tpu.utils.utils import enable_compilation_cache

    args = build_parser().parse_args(argv)
    # reuse the CLI's model-registry validation (fills vocoder/rate defaults)
    args.text, args.file, args.batched = "x", None, False
    args = validate_args(args)
    enable_compilation_cache()
    import jax

    paths = assert_required_models_available(args)
    if args.checkpoint_path is not None:
        paths["matcha"] = args.checkpoint_path
        args.model = "custom_model"
    model, params = load_matcha(args.model, paths["matcha"])
    vocoder, vocoder_params, bias = load_vocoder(args.vocoder, paths["vocoder"])
    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from matcha_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    pipeline = TTSPipeline(model, params, vocoder, vocoder_params, bias,
                           cleaner=args.cleaner, vocoder_bf16=args.bf16_vocoder,
                           vocoder_pallas=not args.no_pallas_vocoder, mesh=mesh,
                           vocoder_chunk=args.vocoder_chunk)
    batcher = BatchingServer(pipeline, max_batch=args.max_batch,
                             batch_window_ms=args.batch_window_ms,
                             n_timesteps=args.steps, temperature=args.temperature,
                             default_rate=args.speaking_rate or 1.0,
                             # validate_args filled args.spk with the model
                             # registry default (e.g. 0 for matcha_vctk);
                             # requests omitting "spk" use it
                             default_spk=args.spk,
                             fused_single=not args.no_fused_single)
    pairs = _parse_warmup(args.warmup)
    if pairs:
        print(f"[!] Warming {len(pairs)} bucket pair(s) x batch sizes {{1,{args.max_batch}}}...")
        t0 = time.time()
        batcher.warmup(pairs)
        print(f"[+] Warm in {time.time()-t0:.0f}s")
    server = make_http_server(batcher, args.host, args.port)
    print(f"[🍵] Serving on http://{args.host}:{server.server_address[1]} "
          f"(max_batch={args.max_batch}, window={args.batch_window_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        batcher.shutdown()


if __name__ == "__main__":
    main()
