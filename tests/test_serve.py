"""Serving daemon (matcha_tpu/serve.py): micro-batching + HTTP surface.

Drives the real ThreadingHTTPServer over a loopback socket with the tiny
fabricated checkpoint (conftest-style), asserting concurrent requests
merge into device batches and the WAV/JSON responses are well-formed.
"""

import io
import json
import os
import threading
import urllib.request
import wave

import numpy as np
import pytest

from tests.test_cli_e2e import fabricated_ckpts  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def serve_pipeline(fabricated_ckpts):  # noqa: F811
    """ONE pipeline for the whole module: every fresh TTSPipeline re-jits
    each (B, T_x, T_y) graph, which made every serve test pay ~15-30 s of
    recompiles. The BatchingServer itself stays per-test (fresh queues,
    counters, threads); only the jit caches are shared."""
    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder

    model, params = load_matcha(
        "matcha_ljspeech", os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    )
    vocoder, voc_params, bias = load_vocoder(
        "hifigan_T2_v1", os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    )
    return TTSPipeline(model, params, vocoder, voc_params, bias,
                       cleaner="english_cleaners_no_espeak")


@pytest.fixture()
def batcher(serve_pipeline):
    from matcha_tpu.serve import BatchingServer

    b = BatchingServer(serve_pipeline, max_batch=4, batch_window_ms=200.0,
                       n_timesteps=1)
    yield b
    b.shutdown()

@pytest.mark.slow
def test_concurrent_requests_merge_into_one_batch(batcher):
    """4 concurrent submits inside the window -> ONE device batch."""
    batcher.warmup([(32, 128)])  # compile before timing-sensitive batching
    # warmup() arms the too-long guard at bucket 32 -> texts must fit
    results = [None] * 4
    texts = ["hello there", "more words here",
             "short", "a tiny text"]

    def worker(i):
        results[i] = batcher.submit(texts[i], timeout_s=300.0)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    n0 = batcher.n_batches
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r in results:
        assert r.error is None
        assert r.wav is not None and r.wav.size == r.n_frames * 256
        assert np.isfinite(r.wav).all()
    assert batcher.n_batches == n0 + 1, "requests did not merge into one batch"


def test_mixed_speaking_rates_split_groups(batcher):
    """Different speaking_rate values are trace constants -> separate groups."""
    out = [None, None]

    def w(i, rate):
        out[i] = batcher.submit("some text", speaking_rate=rate, timeout_s=300.0)

    ts = [threading.Thread(target=w, args=(0, 1.0)), threading.Thread(target=w, args=(1, 2.0))]
    n0 = batcher.n_batches
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(r.error is None for r in out)
    assert batcher.n_batches >= n0 + 1
    # the faster rate must not produce more frames than the slower one
    assert out[1].n_frames >= out[0].n_frames  # rate is length_scale: 2.0 = slower = longer


def test_http_server_end_to_end(batcher):
    """POST /synthesise returns a parseable 24-bit WAV; /healthz counts."""
    from matcha_tpu.serve import make_http_server

    server = make_http_server(batcher, "127.0.0.1", 0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps({"text": "hello from the server"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesise", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "audio/wav"
            assert float(resp.headers["X-Latency-Ms"]) > 0
            wav_data = resp.read()
        with wave.open(io.BytesIO(wav_data)) as f:
            assert f.getnchannels() == 1
            assert f.getsampwidth() == 3
            assert f.getframerate() == 22050
            assert f.getnframes() > 0

        # JSON metadata mode
        body = json.dumps({"text": "again", "format": "json"}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesise", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            meta = json.loads(resp.read())
        assert meta["n_samples"] > 0 and meta["rtf"] > 0

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok" and health["requests"] >= 2

        # malformed request -> 400, server stays alive
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/synthesise", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_enqueue_quantizes_rate_and_applies_defaults():
    """ADVICE r2: speaking_rate snaps to the 0.05 grid in [0.5, 2.0] (the
    compile surface stays finite), omitted spk gets the default speaker,
    and texts beyond the largest warmed x-bucket are rejected up front."""
    import queue as _queue

    from matcha_tpu.serve import BatchingServer

    b = object.__new__(BatchingServer)  # no device work: _enqueue only
    b.pipeline = type("P", (), {"cleaner": "english_cleaners_no_espeak"})()
    b.default_rate = 1.0
    b.default_spk = 3
    b.max_warm_x = None
    b._lock = threading.Lock()
    b.n_requests = 0
    b._q = _queue.Queue()

    req = b._enqueue("hello", None, None)
    assert req.spk == 3 and req.speaking_rate == 1.0
    assert b._enqueue("hello", 1.517, 5).speaking_rate == 1.5
    assert b._enqueue("hello", 1.517, 5).spk == 5
    assert b._enqueue("hello", 99.0, None).speaking_rate == 2.0
    assert b._enqueue("hello", 0.01, None).speaking_rate == 0.5
    # two requests with near-identical rates land in ONE trace-constant group
    assert (b._enqueue("x", 0.949, None).speaking_rate
            == b._enqueue("x", 0.951, None).speaking_rate == 0.95)
    assert b.n_requests == 7

    b.max_warm_x = 8
    with pytest.raises(ValueError, match="too long"):
        b._enqueue("this sentence is far beyond eight ids", None, None)


@pytest.mark.slow
def test_pipelined_scheduler_opt_in(batcher):
    """The opt-in dispatch/fetch pipelined scheduler (default OFF — see
    BatchingServer.pipelined) returns the same well-formed results and
    drains its in-flight ledger back to zero."""
    from matcha_tpu.serve import BatchingServer

    b = BatchingServer(batcher.pipeline, max_batch=4, batch_window_ms=50.0,
                       n_timesteps=1, pipelined=True)
    try:
        results = [None] * 3
        texts = ["hello there", "more words", "short"]

        def worker(i):
            results[i] = b.submit(texts[i], timeout_s=300.0)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for r in results:
            assert r.error is None
            assert r.wav is not None and r.wav.size == r.n_frames * 256
            assert np.isfinite(r.wav).all()
        assert b._in_flight == 0
    finally:
        b.shutdown()


def test_fit_chunks_respects_warmed_bucket():
    """Long-form chunking must produce chunks that FIT the warmed x-bucket
    even when the cleaner expands the text (numbers -> words), else every
    /synthesise_long|_stream request 400s under the too-long guard."""
    from matcha_tpu.serve import BatchingServer
    from matcha_tpu.text import text_to_sequence

    b = object.__new__(BatchingServer)  # no device work: _fit_chunks only
    b.pipeline = type("P", (), {"cleaner": "english_cleaners_no_espeak"})()
    b.max_warm_x = 64

    text = ("The year 1999 was quite memorable for many people. "
            "Speech synthesis improved dramatically in recent years. "
            "Monotonic alignment search finds the best path through the grid.")
    chunks = b._fit_chunks(text, max_chars=200)  # default endpoint budget
    assert len(chunks) >= 2
    assert " ".join(chunks).split() == text.split()  # no words lost
    for c in chunks:
        n_ids = 2 * len(text_to_sequence(c, ["english_cleaners_no_espeak"])) + 1
        assert n_ids <= 64, f"chunk exceeds warmed bucket: {c!r} -> {n_ids}"

    # no warmed bucket -> plain sentence chunking, nothing rejected
    b.max_warm_x = None
    assert b._fit_chunks(text, max_chars=200)


def test_default_rate_is_trusted_verbatim():
    """Operator default_rate defines one warmed trace group and is NOT
    clamped to the client range (bench parity: bench.py LENGTH_SCALE=3.5);
    client-provided rates still snap to the finite compile surface."""
    import queue as _queue

    from matcha_tpu.serve import BatchingServer

    b = object.__new__(BatchingServer)
    b.pipeline = type("P", (), {"cleaner": "english_cleaners_no_espeak"})()
    b.default_rate = 3.5  # as __init__ now stores it verbatim
    b.default_spk = None
    b.max_warm_x = None
    b._lock = threading.Lock()
    b.n_requests = 0
    b._q = _queue.Queue()
    assert b._enqueue("hello", None, None).speaking_rate == 3.5
    assert b._enqueue("hello", 3.5, None).speaking_rate == 2.0  # client rate clamps


@pytest.mark.slow
def test_fused_single_fast_path_and_saturation_fallback(batcher, monkeypatch):
    """Lone requests ride the pre-compiled fused single-jit graph (ONE
    dispatch instead of encode/decode/vocode); a saturated fused result
    (mel_lengths hit the warmed bucket) re-runs through the dynamic path
    so the audio is never truncated."""
    from matcha_tpu.cli import X_BUCKETS, pick_bucket

    text = "hello there"
    # dynamic-path ground truth (durations are deterministic given params)
    r0 = batcher.submit(text, timeout_s=600.0)
    assert r0.error is None
    n = r0.n_frames
    T_x = pick_bucket(len(r0.seq), X_BUCKETS)

    calls = []
    orig = batcher.pipeline.synthesise_batch

    def spy(*a, **k):
        calls.append(k)
        return orig(*a, **k)

    monkeypatch.setattr(batcher.pipeline, "synthesise_batch", spy)

    # register a COVERING fused bucket (compile it first, as warmup would)
    T_big = 64 * ((n // 64) + 2)
    orig(r0.seq[None], np.asarray([len(r0.seq)], np.int32),
         batcher.jax.random.PRNGKey(0), n_timesteps=batcher.n_timesteps,
         temperature=batcher.temperature, length_scale=batcher.default_rate,
         fixed_y_bucket=T_big)
    batcher._fused_warm[(T_x, batcher.default_rate, False)] = [T_big]
    r1 = batcher.submit(text, timeout_s=600.0)
    assert r1.error is None and r1.n_frames == n
    assert np.isfinite(r1.wav).all() and r1.wav.size == n * 256
    assert calls and calls[-1].get("fixed_y_bucket") == T_big  # fused used

    # register a TOO-SMALL fused bucket: fast path saturates -> dynamic
    # fallback returns the full-length audio (fixed_y_bucket accepts any
    # length; 16-multiples keep the U-Net downsample stack happy)
    T_small = max(16, (n - 1) // 16 * 16)
    if T_small >= n:
        pytest.skip(f"utterance too short to saturate a bucket (n={n})")
    orig(r0.seq[None], np.asarray([len(r0.seq)], np.int32),
         batcher.jax.random.PRNGKey(0), n_timesteps=batcher.n_timesteps,
         temperature=batcher.temperature, length_scale=batcher.default_rate,
         fixed_y_bucket=T_small)
    batcher._fused_warm[(T_x, batcher.default_rate, False)] = [T_small]
    calls.clear()
    r2 = batcher.submit(text, timeout_s=600.0)
    assert r2.error is None and r2.n_frames == n, "fallback must not truncate"
    assert r2.wav.size == n * 256
    assert any(k.get("fixed_y_bucket") == T_small for k in calls)  # tried fused
    assert any(k.get("pack_wav") for k in calls)  # ...then fell back


def test_stream_first_chunk_urgent_marking():
    """A stream's FIRST chunk is marked urgent only when the server is
    idle at enqueue time (the batcher then dispatches it solo for
    one-dispatch time-to-first-audio); on a busy server urgency stays off
    and all chunks merge."""
    import queue as _queue

    from matcha_tpu.serve import BatchingServer

    b = object.__new__(BatchingServer)
    b.pipeline = type("P", (), {"cleaner": "english_cleaners_no_espeak"})()
    b.default_rate = 1.0
    b.default_spk = None
    b.max_warm_x = None
    b._lock = threading.Lock()
    b.n_requests = 0
    b._q = _queue.Queue()
    b._busy = False
    b._in_flight = 0
    from collections import deque

    b._bulk_backlog = deque()

    text = "One sentence here. Another one follows. And then a third."
    reqs = list(b.submit_stream(text, timeout_s=0.01, max_chars=30))
    assert len(reqs) >= 2
    assert reqs[0].urgent and not any(r.urgent for r in reqs[1:])
    assert all(r.bulk for r in reqs)  # stream chunks are bulk-class

    while not b._q.empty():
        b._q.get()
    b._busy = True  # dispatching -> not idle -> no urgency
    reqs2 = list(b.submit_stream(text, timeout_s=0.01, max_chars=30))
    assert not any(r.urgent for r in reqs2)


def _bare_batcher(max_batch=4, window_ms=50.0):
    """BatchingServer shell with no threads/pipeline: _take_batch and
    _enqueue are pure queue/scheduling logic."""
    import queue as _queue
    from collections import deque

    from matcha_tpu.serve import BatchingServer

    b = object.__new__(BatchingServer)
    b.pipeline = type("P", (), {"cleaner": "english_cleaners_no_espeak"})()
    b.default_rate = 1.0
    b.default_spk = None
    b.max_warm_x = None
    b._lock = threading.Lock()
    b.n_requests = 0
    b._q = _queue.Queue()
    b._bulk_backlog = deque()
    b._busy = False
    b._in_flight = 0
    b.max_batch = max_batch
    b.batch_window_s = window_ms / 1e3
    return b


def test_interactive_over_bulk_scheduling():
    """VERDICT r3 item 4: a streaming client's chunk burst must not park
    ahead of interactive requests. Interactive requests take batch slots
    first; bulk chunks fill the residual slots and the remainder carries
    over FIFO; with no interactive traffic, bulk fills whole batches."""
    b = _bare_batcher(max_batch=4)
    bulk = [b._enqueue(f"chunk {i}", None, None, bulk=True) for i in range(6)]
    inter = [b._enqueue(f"question {i}", None, None) for i in range(2)]

    batch = b._take_batch()
    # both interactive seated THIS batch despite 6 bulk queued ahead
    assert batch[:2] == inter
    assert batch[2:] == bulk[:2] and len(batch) == 4
    assert list(b._bulk_backlog) == bulk[2:]

    # backlog drains in order, whole batches when no interactive waits
    assert b._take_batch() == bulk[2:]
    assert not b._bulk_backlog

    # a late interactive request preempts carried-over backlog chunks
    bulk2 = [b._enqueue(f"late chunk {i}", None, None, bulk=True)
             for i in range(5)]
    first = b._take_batch()
    assert first == bulk2[:4] and list(b._bulk_backlog) == bulk2[4:]
    i2 = b._enqueue("urgent question", None, None)
    batch2 = b._take_batch()
    assert batch2[0] is i2 and batch2[1:] == bulk2[4:]

    # interactive saturation: a full interactive batch still dispatches
    # intact (bulk waits; FIFO within its class)
    tail = [b._enqueue(f"tail chunk {i}", None, None, bulk=True)
            for i in range(2)]
    inter3 = [b._enqueue(f"q{i}", None, None) for i in range(4)]
    batch3 = b._take_batch()
    assert batch3 == inter3
    assert list(b._bulk_backlog) == tail

    # shutdown sentinel still terminates collection
    b._q.put(None)
    b._bulk_backlog.clear()
    assert b._take_batch() == []


def test_parse_warmup():
    from matcha_tpu.serve import _parse_warmup

    assert _parse_warmup("128:512,256:1024") == [(128, 512), (256, 1024)]
    assert _parse_warmup("") == []


def test_long_form_endpoint_merges_chunks(batcher):
    """POST /synthesise_long sentence-chunks the text, the chunks merge
    into device batches via the window, and the wav concatenates."""
    from matcha_tpu.serve import make_http_server

    server = make_http_server(batcher, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        text = ("This is the first sentence. Here comes a second one! "
                "And finally a third, slightly longer sentence?")
        n0 = batcher.n_batches
        body = json.dumps({"text": text, "format": "json", "max_chars": 30}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesise_long", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            meta = json.loads(resp.read())
        assert meta["n_samples"] > 0
        # 3 chunks merged into at most 2 dispatches (window=200ms, max_batch=4)
        assert batcher.n_batches - n0 <= 2
        assert batcher.n_requests >= 3
    finally:
        server.shutdown()


def test_streaming_endpoint(batcher):
    """POST /synthesise_stream: a live WAV stream — header first, then
    24-bit PCM per sentence chunk; total PCM matches the non-streaming
    long-form result (durations are deterministic given params+text)."""
    import http.client
    import struct

    from matcha_tpu.serve import make_http_server

    server = make_http_server(batcher, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        text = ("First sentence here. Second one follows! Third ends it?")
        body = json.dumps({"text": text, "format": "json", "max_chars": 30}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesise_long", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as resp:
            expected_samples = json.loads(resp.read())["n_samples"]

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/synthesise_stream",
                     body=json.dumps({"text": text, "max_chars": 30}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/wav"
        assert resp.getheader("X-Sample-Rate") == "22050"
        header = resp.read(44)
        assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
        assert struct.unpack("<I", header[24:28])[0] == 22050  # sample rate
        pcm = resp.read()  # until server closes the stream
        conn.close()
        assert len(pcm) == expected_samples * 3  # 24-bit frames
    finally:
        server.shutdown()


def test_http_fuzz_malformed_requests(batcher):
    """Adversarial HTTP inputs get a 4xx JSON error (never a dropped
    connection or a crashed handler thread), and the server stays alive."""
    from matcha_tpu.serve import make_http_server

    server = make_http_server(batcher, "127.0.0.1", 0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"

    def post(path, data, headers=None):
        req = urllib.request.Request(
            url + path, data=data,
            headers={"Content-Type": "application/json", **(headers or {})})
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return resp.status
        except urllib.error.HTTPError as e:
            return e.code

    try:
        cases = [
            ("no text key", "/synthesise", b"{}", None),
            ("non-JSON body", "/synthesise", b"this is not json", None),
            ("invalid UTF-8", "/synthesise", b"\xff\xfe{", None),
            ("JSON array payload", "/synthesise", b"[1, 2, 3]", None),
            ("JSON scalar payload", "/synthesise", b"42", None),
            ("bad max_chars (stream parse)", "/synthesise_stream",
             json.dumps({"text": "hi", "max_chars": "lots"}).encode(), None),
            ("bad max_chars (long)", "/synthesise_long",
             json.dumps({"text": "hi", "max_chars": "lots"}).encode(), None),
            ("bad Content-Length header", "/synthesise", b"{}",
             {"Content-Length": "banana"}),
            ("text not a string", "/synthesise",
             json.dumps({"text": 42}).encode(), None),
            ("text null (stream parse)", "/synthesise_stream",
             json.dumps({"text": None}).encode(), None),
            ("bad speaking_rate type (stream parse)", "/synthesise_stream",
             json.dumps({"text": "hi", "speaking_rate": "fast"}).encode(), None),
            ("bad spk type", "/synthesise",
             json.dumps({"text": "hi", "spk": "abc"}).encode(), None),
        ]
        for name, path, data, headers in cases:
            code = post(path, data, headers)
            assert 400 <= code < 500, f"{name}: expected 4xx, got {code}"

        # Oversized body: the server answers 413 without draining the
        # upload, so depending on write/read timing the client either reads
        # the 413 or hits EPIPE mid-send (nginx-style refusal) — both mean
        # "refused". It must never 200 or hang.
        try:
            code = post("/synthesise", b"x" * ((1 << 20) + 1))
            assert code == 413, f"oversized body: expected 413, got {code}"
        except urllib.error.URLError:
            pass  # broken pipe while uploading the refused body

        # max_chars <= 0 once drove the sentence splitter into an infinite
        # zero-progress loop (CPU-spin DoS); it now clamps and completes
        code = post("/synthesise_long",
                    json.dumps({"text": "short text", "max_chars": 0,
                                "format": "json"}).encode())
        assert code == 200

        assert post("/nope", b"{}", None) == 404
        try:
            with urllib.request.urlopen(f"{url}/nope", timeout=30) as resp:
                get_code = resp.status
        except urllib.error.HTTPError as e:
            get_code = e.code
        assert get_code == 404  # GET unknown path
    finally:
        # server must still answer after all the abuse
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as resp:
            assert json.loads(resp.read())["status"] == "ok"
        server.shutdown()
