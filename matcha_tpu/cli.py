"""``matcha-tts`` CLI: text -> wav on TPU.

Mirrors the reference CLI surface (matcha/cli.py:207-270 — same flags,
model registry, download URLs, defaults, RTF reporting with the same
formula) on a TPU-native execution model:

* inputs are padded to a small set of static length buckets; each
  (x-bucket, y-bucket) pair compiles once and is cached;
* synthesis is two jitted stages (encode -> pick mel bucket -> decode)
  plus a jitted vocoder, or a single fused text->wav graph when a fixed
  mel bucket is given (``--fixed-y-bucket``);
* checkpoints load either from the reference torch formats (converted on
  the fly, incl. HiFi-GAN weight-norm folding) or native orbax dirs.
"""

import argparse
import collections
import datetime as dt
import functools
import json
import os
import warnings
from pathlib import Path

import numpy as np

from matcha_tpu.text import sequence_to_text, text_to_sequence
from matcha_tpu.utils.utils import (
    assert_model_downloaded,
    get_user_data_dir,
    intersperse,
    save_plot,
    write_wav,
)

MATCHA_URLS = {
    "matcha_ljspeech": "https://github.com/shivammehta25/Matcha-TTS-checkpoints/releases/download/v1.0/matcha_ljspeech.ckpt",
    "matcha_vctk": "https://github.com/shivammehta25/Matcha-TTS-checkpoints/releases/download/v1.0/matcha_vctk.ckpt",
}

VOCODER_URLS = {
    "hifigan_T2_v1": "https://github.com/shivammehta25/Matcha-TTS-checkpoints/releases/download/v1.0/generator_v1",
    "hifigan_univ_v1": "https://github.com/shivammehta25/Matcha-TTS-checkpoints/releases/download/v1.0/g_02500000",
}

MULTISPEAKER_MODEL = {
    "matcha_vctk": {"vocoder": "hifigan_univ_v1", "speaking_rate": 0.85, "spk": 0, "spk_range": (0, 107)}
}

SINGLESPEAKER_MODEL = {"matcha_ljspeech": {"vocoder": "hifigan_T2_v1", "speaking_rate": 0.95, "spk": None}}

X_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512, 768, 1024)
Y_BUCKETS = (128, 256, 384, 512, 768, 1024, 1536, 2048)
# Finer buckets for the vocoder stage: the decoder needs coarse buckets
# (each (T_x, T_y) pair is an expensive U-Net compile), but the vocoder
# jit depends only on the mel length, so it can run on a 128-frame grid —
# the decode bucket's padding tail (~20-40% of frames on real length
# distributions) is sliced off before the most expensive stage.
VOC_BUCKETS = tuple(range(128, 2049, 128))


def pick_bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 63) // 64) * 64  # beyond the table: round to 64


#: 24-bit PCM full-scale, shared with utils.pcm24_bytes / write_wav
_PCM24_SCALE = 2**23 - 1


def _pack_pcm24(jnp, wav, mel_lengths):
    """Quantize (B, n) f32 waveform to little-endian 24-bit PCM bytes on
    device — the exact encoding ``utils.pcm24_bytes`` produces host-side
    (clip, scale by 2^23-1, truncate toward zero, low 3 bytes) — and
    append mel_lengths as one trailing 3-byte sample per row.

    Shipping wire-format bytes cuts the device->host payload 25% vs f32;
    through the remote-chip tunnel, transfers beyond ~128 KB cost ~30
    ms/MB of single-sentence latency (measured, PERFORMANCE.md)."""
    v = (jnp.clip(wav, -1.0, 1.0) * _PCM24_SCALE).astype(jnp.int32)
    v = jnp.concatenate([v, mel_lengths[:, None].astype(jnp.int32)], axis=1)
    b = jnp.stack([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF], axis=-1)
    return b.astype(jnp.uint8).reshape(v.shape[0], -1)


def _unpack_pcm24(arr: np.ndarray):
    """Host inverse of ``_pack_pcm24``: (B, 3n+3) uint8 -> f32 waveform
    (B, n) + int32 mel_lengths (B,). The raw bytes minus the trailing
    sample are already ``pcm24_bytes`` WAV frames (pass-through safe)."""
    u = arr.reshape(arr.shape[0], -1, 3).astype(np.int32)
    v = u[..., 0] | (u[..., 1] << 8) | (u[..., 2] << 16)
    v = (v ^ 0x800000) - 0x800000  # sign-extend 24 -> 32 bit
    wav = (v[:, :-1] / np.float32(_PCM24_SCALE)).astype(np.float32)
    return wav, v[:, -1].astype(np.int32)


def _pcm24_lengths(arr: np.ndarray) -> np.ndarray:
    """mel_lengths from packed PCM24 rows WITHOUT decoding the audio: only
    the trailing 3-byte sample per row is touched (lengths are positive
    < 2^23, no sign handling needed). The remaining bytes per row are the
    literal ``pcm24_bytes`` WAV frames — for byte-delivery consumers
    (serving wire, WAV writing) the f32 unpack is pure overhead (~1.6 ms
    per call on the 1-core host, measured in the latency budget)."""
    t = arr[:, -3:].astype(np.int32)
    return t[:, 0] | (t[:, 1] << 8) | (t[:, 2] << 16)


#: target bytes per device->host transfer stream. The tunnel's fetch cost
#: is flat (~1 RTT) up to ~128 KB, then ~30 ms/MB; concurrent fetches of
#: sub-128 KB chunks genuinely overlap (measured: one 288 KB fetch p50/p90
#: 36.9/48.2 ms vs 4x72 KB parallel 31.6/33.6 ms, same hour). Splitting the
#: packed payload into <=~72 KB parts keeps every stream in the flat region.
_FETCH_PART_BYTES = 72 * 1024
#: per-stream request overhead bounds useful parallelism
_FETCH_MAX_PARTS = 8

_fetch_pool = None


def _get_fetch_pool():
    global _fetch_pool
    if _fetch_pool is None:
        from concurrent.futures import ThreadPoolExecutor

        _fetch_pool = ThreadPoolExecutor(max_workers=2 * _FETCH_MAX_PARTS,
                                         thread_name_prefix="matcha-fetch")
    return _fetch_pool


def _n_fetch_parts(total_bytes: int) -> int:
    return max(1, min(_FETCH_MAX_PARTS,
                      -(-int(total_bytes) // _FETCH_PART_BYTES)))


def _split_parts(packed, n_parts: int):
    """Split a (B, n_bytes) device array into ``n_parts`` byte-axis chunks
    (static trace-time slices; concatenating the host copies restores the
    exact packed rows)."""
    n = packed.shape[-1]
    step = -(-n // n_parts)
    return tuple(packed[:, i * step: min((i + 1) * step, n)]
                 for i in range(n_parts))


def _fetch_parts_host(parts) -> np.ndarray:
    """Concurrently device->host copy each chunk and reassemble the packed
    rows. Each stream's request waits server-side until the data is ready,
    so the per-stream RTTs overlap each other (and the tail of device
    compute) instead of queueing behind one big transfer."""
    if len(parts) == 1:
        return np.asarray(parts[0])
    futs = [_get_fetch_pool().submit(np.asarray, p) for p in parts]
    return np.concatenate([f.result() for f in futs], axis=1)


def fetch_fused_host(out):
    """Host-fetch a fused-graph result's (waveform, mel_lengths) in ONE
    transfer, whichever wire format the graph shipped (``wav_pcm24`` /
    ``wav_packed`` / plain f32+lengths). The auto-bucket path pre-fetches
    into ``*_host`` keys during its saturation check; integer-bucket
    callers use this so the device-side packing the fused graph already
    paid for actually saves them the f32 payload + the second lengths
    round trip."""
    if "waveform_host" in out:
        return out["waveform_host"], np.asarray(out["mel_lengths_host"])
    if "pcm24_bytes_host" in out:  # raw_pcm24 delivery, already fetched
        return _unpack_pcm24(out["pcm24_bytes_host"])
    if "wav_pcm24_parts" in out:
        return _unpack_pcm24(_fetch_parts_host(out["wav_pcm24_parts"]))
    if "wav_pcm24" in out:
        return _unpack_pcm24(np.asarray(out["wav_pcm24"]))
    if "wav_packed" in out:
        packed = np.asarray(out["wav_packed"])
        return packed[:, :-1], packed[:, -1].astype(np.int32)
    return np.asarray(out["waveform"]), np.asarray(out["mel_lengths"])


def synth_fetch_guarded(pipeline, x, x_lengths, key, *, fixed_y_bucket=0, **kw):
    """``synthesise_batch`` + host fetch, with the integer fixed-bucket
    saturation guard. An int ``--fixed-y-bucket`` dispatches with no host
    sync (serve's pipelined contract), so nothing inside the pipeline can
    check for clipping — the CLI checks the fetched lengths here and, on
    saturation, warns and re-runs through the length-general dynamic path
    (mirroring serve.py's fallback). ``"auto"`` self-escalates inside
    ``synthesise_batch`` including the top-bucket dynamic fallback, so it
    passes straight through.

    Returns ``(out, waveforms, mel_lengths)`` host-side."""
    out = pipeline.synthesise_batch(x, x_lengths, key,
                                    fixed_y_bucket=fixed_y_bucket, **kw)
    wavs, mls = fetch_fused_host(out)
    if (fixed_y_bucket and fixed_y_bucket != "auto"
            and int(np.max(mls)) >= int(fixed_y_bucket)):
        warnings.warn(
            f"[-] --fixed-y-bucket {fixed_y_bucket} saturated (predicted mel "
            f"length >= bucket); re-running through the dynamic path so the "
            f"written audio is full-length. Pick a larger bucket, 'auto', "
            f"or --long-form to avoid the retry.", UserWarning)
        out = pipeline.synthesise_batch(x, x_lengths, key, **kw)
        wavs, mls = fetch_fused_host(out)
    return out, wavs, mls


def process_text(i: int, text: str, cleaner: str = "english_cleaners2"):
    print(f"[{i}] - Input text: {text}")
    seq = intersperse(text_to_sequence(text, [cleaner]), 0)
    x = np.asarray(seq, dtype=np.int32)[None]
    x_lengths = np.asarray([x.shape[-1]], dtype=np.int32)
    x_phones = sequence_to_text(list(x[0]))
    print(f"[{i}] - Phonetised text: {x_phones[1::2]}")
    return {"x_orig": text, "x": x, "x_lengths": x_lengths, "x_phones": x_phones}


class TTSPipeline:
    """Bucketed, jit-cached synthesis engine (model + vocoder + denoiser)."""

    # Halo (mel frames) for chunked vocoding: must cover the generator's
    # receptive field (~17 frames for HiFi-GAN v1: conv_pre 3 + per-stage
    # MRF fields shrinking with the upsample rate + conv_post). 32 gives
    # 2x margin; tests/test_cli_e2e.py checks chunked == full output.
    VOC_CHUNK_HALO = 32

    def __init__(self, model, params, vocoder=None, vocoder_params=None,
                 denoiser_bias=None, cleaner: str = "english_cleaners2",
                 vocoder_bf16: bool = False, vocoder_pallas: bool = True,
                 mesh=None, vocoder_chunk: int = 0, bf16_latency: bool = False,
                 pcm24_transfer: bool = True):
        import jax
        import jax.numpy as jnp

        self.jax = jax
        self.model = model
        self.vocoder = vocoder
        self.vocoder_bf16 = vocoder_bf16
        # bf16 latency mode (CLI --bf16-latency): the FUSED single-jit
        # graph runs the CFM Euler loop (bf16 decoder param subtree +
        # compute_dtype plumb, models/matcha.py) and the vocoder+denoiser
        # tail in bf16. Both B=1 hot stages are bandwidth-bound at ~88% of
        # the HBM roofline in f32 (PERFORMANCE.md MFU table), so halving
        # activation bytes is the one remaining latency lever. Duration
        # math, the encoder, and every non-fused path stay f32.
        self.bf16_latency = bf16_latency
        self._params_lat = None
        self._voc_params_lat = None
        # Fused auto-bucket graphs ship the waveform as device-quantized
        # 24-bit PCM (the written-WAV encoding; _pack_pcm24) — 25% less
        # device->host payload with zero delivered-quality change.
        self.pcm24_transfer = pcm24_transfer
        # Pallas-fused MRF vocoder (ops/mrf_pallas.py): ~2.2x faster than
        # the XLA conv path on v5e, waveform deviation ~3e-4.
        self.vocoder_pallas = vocoder_pallas
        if vocoder_params is not None and vocoder_bf16:
            # bf16 vocoder weights (~1e-3 wav deviation). A win ONLY on the
            # plain XLA conv path; composed with the Pallas MRF stages the
            # dtype churn makes it several times slower (PERFORMANCE.md).
            vocoder_params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), vocoder_params)
        # Multi-chip data-parallel serving (CLI --data-parallel): params
        # replicate once onto the mesh, every batch shards its leading axis
        # over 'data', and each jitted stage runs SPMD — the TPU-pod analog
        # of running N CLI processes, with zero code in the stages
        # themselves (GSPMD partitions the compiled graphs). A 1-device
        # mesh is ignored: committed shardings on trivial meshes force a
        # reshard round trip per call on remote-attached chips.
        self.mesh = None
        if mesh is not None and mesh.devices.size > 1:
            from matcha_tpu.parallel.mesh import replicated

            self.mesh = mesh
            rep = replicated(mesh)
            params = jax.device_put(params, rep)
            if vocoder_params is not None:
                vocoder_params = jax.device_put(vocoder_params, rep)
            if denoiser_bias is not None:
                denoiser_bias = jax.device_put(denoiser_bias, rep)
        self.params = params
        self.vocoder_params = vocoder_params
        self.denoiser_bias = denoiser_bias
        # Time-chunked vocoding (CLI --vocoder-chunk N): run the generator
        # on N-frame mel windows with a receptive-field halo instead of the
        # whole utterance, bounding its activation memory (the 512-channel
        # upsample stages at 256x sample rate are what exhausts HBM at
        # large B x T_y). 0 = off.
        self.vocoder_chunk = int(vocoder_chunk)
        self.cleaner = cleaner
        self._encode_cache = {}
        self._decode_cache = {}
        self._decode_voc_cache = {}
        self._vocode_cache = {}
        self._fused_cache = {}
        # Auto fused-bucket calibration (fixed_y_bucket="auto"): a high
        # quantile of RECENT observed mel frames per (phoneme id x
        # length_scale) — see observe_dur_ratio for why not a running max.
        # None until the first call returns real mel lengths.
        self._dur_ratio = None
        self._dur_obs = collections.deque(maxlen=64)

    def _place(self, *arrays):
        """Commit batch arrays to the mesh (leading axis over 'data').

        No-op without a mesh. Batches that do not divide the data axis are
        replicated instead — correct, just not parallel (pad the batch to
        a multiple of the data-axis size for full utilisation)."""
        if self.mesh is None:
            return arrays if len(arrays) > 1 else arrays[0]
        from matcha_tpu.parallel.mesh import batch_sharding, replicated

        n_data = self.mesh.shape.get("data", 1)
        placed = []
        for a in arrays:
            if a is None:
                placed.append(None)
            else:
                s = batch_sharding(self.mesh) if a.shape[0] % n_data == 0 else replicated(self.mesh)
                placed.append(self.jax.device_put(a, s))
        return placed if len(placed) > 1 else placed[0]

    def _latency_params(self):
        """Model params with the decoder subtree cast to bf16 (cached).

        Only the CFM estimator runs in bf16 (matcha.py ``compute_dtype``);
        the encoder/duration params stay f32 so predicted durations are
        bit-identical to the f32 path."""
        if self._params_lat is None:
            jnp = self.jax.numpy

            def cast(t):
                return self.jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, t)

            inner = {k: (cast(v) if k == "decoder" else v)
                     for k, v in self.params["params"].items()}
            self._params_lat = {**{k: v for k, v in self.params.items()},
                                "params": inner}
        return self._params_lat

    def _latency_voc_params(self):
        if self._voc_params_lat is None:
            jnp = self.jax.numpy
            self._voc_params_lat = self.jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, self.vocoder_params)
        return self._voc_params_lat

    # -- jitted stage builders (cached per bucket shape) -------------------
    def _encode_fn(self, T_x: int, length_scale: float):
        key = (T_x, length_scale)
        if key not in self._encode_cache:
            from matcha_tpu.models.matcha import MatchaTTS

            self._encode_cache[key] = self.jax.jit(
                functools.partial(self.model.apply, method=MatchaTTS.encode,
                                  length_scale=length_scale)
            )
        return self._encode_cache[key]

    def _decode_fn(self, T_x: int, T_y: int, n_timesteps: int, temperature: float):
        key = (T_x, T_y, n_timesteps, temperature)
        if key not in self._decode_cache:
            from matcha_tpu.models.matcha import MatchaTTS

            self._decode_cache[key] = self.jax.jit(
                functools.partial(self.model.apply, method=MatchaTTS.decode,
                                  n_timesteps=n_timesteps, temperature=temperature,
                                  y_max_length=T_y)
            )
        return self._decode_cache[key]

    def _decode_vocode_fn(self, T_x: int, T_y: int, T_voc: int,
                          n_timesteps: int, temperature: float):
        """Decode + mel-slice + vocode + denoise as ONE jitted graph.

        The staged corpus path knows the mel bucket AND the finer vocoder
        bucket host-side before dispatching (stage 2 fetched the predicted
        lengths), so stage 3 can run as a single dispatch per batch,
        quartering per-batch host dispatches. Measured NEUTRAL for
        throughput on the remote-tunnel backend (scripts/profile_corpus.py:
        at B=8 the per-stage device work is large enough that dispatch
        boundaries cost nothing — unlike B=1, where the fused latency graph
        beats the staged sum 2.2x); opt-in for hosts where dispatch is the
        scarce resource. Keyed by the (T_x, T_y, T_voc) triple: only
        triples a corpus actually hits compile (the serving daemon keeps
        the split stages — its warmup sweep would otherwise pay a U-Net
        compile per pair).
        """
        key = (T_x, T_y, T_voc, n_timesteps, temperature)
        if key not in self._decode_voc_cache:
            from matcha_tpu.models.matcha import MatchaTTS

            jnp = self.jax.numpy
            vocode = self._vocode_tail()

            def fn(params, voc_params, mu_x, w_ceil, x_lengths, y_lengths,
                   k, spks, strength):
                out = self.model.apply(
                    params, mu_x, w_ceil, x_lengths, y_lengths, k,
                    n_timesteps=n_timesteps, temperature=temperature,
                    y_max_length=T_y, spks=spks, method=MatchaTTS.decode)
                mel_btc = jnp.swapaxes(out["mel"], 1, 2)[:, :T_voc]
                out["waveform"] = vocode(voc_params, mel_btc, strength)
                # scalar completion handle: lets callers force the whole
                # batch chain without an extra eager getitem dispatch
                out["first_sample"] = out["waveform"][0, 0]
                return out

            self._decode_voc_cache[key] = self.jax.jit(fn)
        return self._decode_voc_cache[key]

    # Frame threshold (B x T_y, static under jit) above which the hybrid
    # XLA/Pallas generator is used. 0 = always on TPU: since the hybrid
    # keeps the wide (C>=128) stages on XLA and fuses only the narrow
    # ones (hifigan_pallas.py docstring), it wins at EVERY measured
    # shape — B=1/T=384 6.95 vs 26.98 ms, B=1/T=512 9.00 vs 25.93,
    # B=2/T=512 11.95 vs 26.14 standalone, B=8/T=1024 68.8 vs 102.3
    # (scripts/profile_vocoder.py), and inside the full fused B=1
    # latency graph 10.57 vs 17.01 ms queued device time (e2e p50
    # 42.6/p90 44.7 vs 51.7/65.0). The retired all-Pallas path lost at
    # small grids; the hybrid does not.
    PALLAS_MIN_MEL_FRAMES = 0
    # bf16 mel keeps the all-XLA path below this many frames (see the
    # measurement note in base_apply): B=1/B=2 latency shapes stay XLA,
    # B>=4 x 1024-frame throughput batches take the hybrid.
    PALLAS_MIN_MEL_FRAMES_BF16 = 4096

    def _voc_apply(self):
        """The mel->wav callable: the hybrid XLA/Pallas generator (default
        on TPU for f32 mel at every shape — PALLAS_MIN_MEL_FRAMES=0; for
        bf16 mel only at/above PALLAS_MIN_MEL_FRAMES_BF16) or the flax/XLA
        conv path (CPU, --no-pallas-vocoder, or bf16 below the threshold —
        see the measurement note below). The choice is made per static mel shape
        at trace time, so every jit cache entry gets its measured-faster
        path. With ``vocoder_chunk`` set, the generator runs on halo-padded
        mel windows chained sequentially (optimization_barrier), so peak
        activation memory is one window instead of the whole utterance."""
        if self.vocoder_pallas and self.jax.default_backend() == "tpu":
            from matcha_tpu.models.hifigan_pallas import generator_apply_pallas

            h = self.vocoder.config
            flax_apply = self.vocoder.apply

            def base_apply(vp, mel):
                # bf16 serving (--bf16-vocoder/--bf16-latency) takes the
                # hybrid only at throughput shapes: the narrow Pallas
                # stages compute f32 in VMEM (Mosaic cannot lower the
                # kernel's bf16 minor-dim broadcasts), and at B=1 the
                # bf16<->f32 churn on the longest tensors dominates
                # (measured B=1/T=384: bf16 hybrid 18.96 ms vs bf16 XLA
                # 8.76) while at B=8/T=1024 the wide XLA stages' halved
                # HBM traffic wins (bf16 hybrid 61.2 vs f32 hybrid 67.7
                # vs bf16 XLA 74.4; parity 7e-4).
                frames = mel.shape[0] * mel.shape[1]
                is_f32 = mel.dtype == self.jax.numpy.float32
                if frames >= (self.PALLAS_MIN_MEL_FRAMES if is_f32
                              else self.PALLAS_MIN_MEL_FRAMES_BF16):
                    return generator_apply_pallas(vp, h, mel)
                return flax_apply(vp, mel)
        else:
            base_apply = self.vocoder.apply

        chunk, halo = self.vocoder_chunk, self.VOC_CHUNK_HALO
        if not chunk:
            return base_apply
        jnp, lax = self.jax.numpy, self.jax.lax
        up = 256  # total upsample factor (samples per mel frame)

        def chunked_apply(vp, mel):
            T = mel.shape[1]
            if T <= chunk + halo:
                return base_apply(vp, mel)
            outs = []
            for s in range(0, T, chunk):
                e = min(s + chunk, T)
                s0, e0 = max(0, s - halo), min(T, e + halo)
                m = mel[:, s0:e0]
                if outs:
                    # serialize the windows so XLA cannot materialize all
                    # their activations at once (the memory win)
                    m, _ = lax.optimization_barrier((m, outs[-1]))
                w = base_apply(vp, m)
                outs.append(w[:, (s - s0) * up : (s - s0 + e - s) * up])
            return jnp.concatenate(outs, axis=1)

        return chunked_apply

    def _vocode_tail(self, bf16=None):
        """The mel(B,T,C)->wav body shared by the staged stage jit and the
        fused graph: vocoder + clip + denoiser, all inside one trace (the
        denoiser run eagerly becomes ~40 op-by-op dispatches through the
        device tunnel per batch). ``bf16`` overrides the constructor-level
        ``vocoder_bf16`` (the fused latency graph passes True)."""
        jnp = self.jax.numpy
        from matcha_tpu.models.denoiser import denoise

        voc_apply = self._voc_apply()
        bias = self.denoiser_bias
        bf16 = self.vocoder_bf16 if bf16 is None else bf16

        def vocode(voc_params, mel_btc, strength):
            if bf16:
                mel_btc = mel_btc.astype(jnp.bfloat16)
            wav = voc_apply(voc_params, mel_btc)[..., 0].astype(jnp.float32)
            wav = jnp.clip(wav, -1.0, 1.0)
            if bias is not None:
                wav = denoise(wav, bias, strength=strength)
            return wav

        return vocode

    def _vocode_fn(self):
        """One jitted mel->wav stage (see _vocode_tail)."""
        if "fn" not in self._vocode_cache:
            self._vocode_cache["fn"] = self.jax.jit(self._vocode_tail())
        return self._vocode_cache["fn"]

    def _vocode_packed_fn(self):
        """One jitted mel->wav->24-bit-PCM stage for the serving path.

        The waveform is quantized ON DEVICE (``_pack_pcm24``) with the
        per-row mel_lengths riding as a trailing 3-byte sample, so a
        batch's samples AND lengths arrive in ONE uint8 transfer: vs the
        f32 waveform + separate mel_lengths fetch this saves 25% of the
        payload plus a full tunnel round trip (~28 ms) per batch."""
        if "packed" not in self._vocode_cache:
            jnp = self.jax.numpy
            vocode = self._vocode_tail()

            def packed(voc_params, mel_btc, strength, mel_lengths):
                p = _pack_pcm24(jnp, vocode(voc_params, mel_btc, strength),
                                mel_lengths)
                k = _n_fetch_parts(p.size)
                return _split_parts(p, k) if k > 1 else p

            self._vocode_cache["packed"] = self.jax.jit(packed)
        return self._vocode_cache["packed"]

    def _fused_fn(self, T_x: int, T_y: int, n_timesteps: int, temperature: float,
                  length_scale: float, has_spks: bool, with_fold: bool = False):
        """ONE jitted graph: encoder -> duration expand -> CFM scan ->
        HiFi-GAN -> denoiser. No host sync, one dispatch per batch — the
        serving form of the exported deployment graph (deploy/export.py).
        Requires a fixed mel bucket ``T_y`` (CLI ``--fixed-y-bucket``).

        The denoiser strength is a trace constant (per-pipeline fixed; the
        eager ``jnp.float32(strength)`` materialization was a per-call
        tunnel dispatch). ``with_fold``: the graph takes a base key + an
        int32 call index and derives the per-call key INSIDE the jit
        (``fold_in`` is otherwise 1-2 eager device ops per call on the
        latency path — bench/serve pass a counter instead)."""
        cache_key = (T_x, T_y, n_timesteps, temperature, length_scale,
                     has_spks, with_fold, float(self.denoiser_strength))
        if cache_key not in self._fused_cache:
            jnp = self.jax.numpy
            from matcha_tpu.models.matcha import MatchaTTS

            lat = self.bf16_latency
            vocode = (None if self.vocoder is None
                      else self._vocode_tail(bf16=True if lat else None))
            strength = jnp.float32(self.denoiser_strength)

            def fused(params, voc_params, x, x_lengths, key, fold, spks):
                if with_fold:
                    key = self.jax.random.fold_in(key, fold)
                out = self.model.apply(
                    params, x, x_lengths, key,
                    n_timesteps=n_timesteps, temperature=temperature,
                    spks=spks, length_scale=length_scale, y_max_length=T_y,
                    compute_dtype=jnp.bfloat16 if lat else None,
                    method=MatchaTTS.synthesise,
                )
                if vocode is not None:
                    out["waveform"] = vocode(
                        voc_params, jnp.swapaxes(out["mel"], 1, 2), strength)
                    # mel_lengths appended to the wav rows: auto mode's
                    # saturation check + the caller's samples + lengths all
                    # arrive in ONE device->host transfer (each extra fetch
                    # costs a full tunnel round trip, ~27 ms measured)
                    if self.pcm24_transfer:
                        # wire-format transfer: quantize to 24-bit PCM ON
                        # DEVICE (the exact encoding write_wav/serve emit,
                        # utils.pcm24_bytes) and ship 3 bytes/sample instead
                        # of 4 — measured tunnel fetch beyond ~128 KB costs
                        # ~30 ms/MB, so the f32 payload was the p90 tail.
                        # Payloads beyond one flat-region transfer split
                        # into parallel fetch streams (_fetch_parts_host).
                        packed = _pack_pcm24(
                            jnp, out["waveform"], out["mel_lengths"])
                        k = _n_fetch_parts(packed.size)
                        if k > 1:
                            out["wav_pcm24_parts"] = _split_parts(packed, k)
                        else:
                            out["wav_pcm24"] = packed
                    else:
                        out["wav_packed"] = jnp.concatenate(
                            [out["waveform"],
                             out["mel_lengths"][:, None].astype(jnp.float32)], axis=1)
                return out

            self._fused_cache[cache_key] = self.jax.jit(fused)
        return self._fused_cache[cache_key]

    # ----------------------------------------------------------------------
    #: candidate static mel buckets for the auto-selected fused graph
    #: (finer than Y_BUCKETS: the tightest graph minimises padded decode +
    #: vocoder work, which is where single-sentence latency goes)
    FUSED_Y_BUCKETS = tuple(range(64, 2049, 64))
    #: safety headroom over the calibrated frames-per-token estimate
    FUSED_MARGIN = 1.15

    def observe_dur_ratio(self, obs: float) -> None:
        """Fold one non-saturated fused result into the frames-per-token
        calibration shared by ``_auto_y_bucket`` and serve's fused picker.

        Selection uses the 90th percentile of the last 64 observations —
        NOT an all-time running max. A max only ratchets up, so after a
        loaded serving window one long-winded utterance permanently pushes
        every subsequent lone request onto the next fused bucket (~60-90 ms
        of extra decode + vocode + payload through the tunnel: the round-5
        unloaded-TTFA regression, 70.5 -> 154 ms). The cost asymmetry
        favors the occasional underestimate instead: the post-fetch
        saturation check re-dispatches that one call, while an
        overestimate taxes EVERY call. p90-of-recent keeps the estimate
        conservative against normal spread but lets it decay after an
        outlier leaves the window.
        """
        self._dur_obs.append(float(obs))
        self._dur_ratio = float(np.quantile(np.asarray(self._dur_obs), 0.9))

    def _auto_y_bucket(self, n_ids: int, length_scale: float) -> int:
        """Tightest fused mel bucket from the calibrated duration ratio.

        Before any calibration the largest bucket is used (always correct,
        just not tight); the first real result tightens it. Replaces the
        hand-picked ``--fixed-y-bucket 448`` benchmark flag with a
        protocol a real user gets by default.
        """
        if self._dur_ratio is None:
            return self.FUSED_Y_BUCKETS[-1]
        est = n_ids * length_scale * self._dur_ratio * self.FUSED_MARGIN
        for b in self.FUSED_Y_BUCKETS:
            if b >= est:
                return b
        return self.FUSED_Y_BUCKETS[-1]

    def synthesise_batch(self, x: np.ndarray, x_lengths: np.ndarray, key,
                         n_timesteps: int = 10, temperature: float = 0.667,
                         length_scale: float = 1.0, spks=None,
                         fixed_y_bucket=0, pack_wav: bool = False,
                         key_fold=None, raw_pcm24: bool = False):
        """Returns the reference synthesise dict + 'waveform' (if vocoder).

        ``pack_wav`` (dynamic path, vocoder present): ship the result as
        device-quantized 24-bit PCM with mel_lengths appended
        (``out["wav_pcm24"]``, see ``_vocode_packed_fn``) instead of the
        f32 ``waveform`` — the serving daemon's wire-format transfer.

        With ``fixed_y_bucket`` the whole text->wav pipeline is ONE fused
        jit call (no host sync); ``"auto"`` picks the tightest fused bucket
        from the self-calibrating frames-per-token ratio (re-dispatching a
        bigger bucket iff the result saturated — the returned dict then
        carries ``mel_lengths_host``, already fetched for the check, so
        callers pay no extra transfer). Otherwise it is encode -> host
        bucket pick -> decode -> vocode with per-bucket jit caches.

        ``key_fold``: derive the per-call key as ``fold_in(key, key_fold)``
        on EVERY path — inside the fused graph when one runs (an eager
        fold_in costs 1-2 device dispatches per call on the latency path),
        as an eager fold_in on the dynamic path.

        ``raw_pcm24`` (fused auto path, pcm24 wire): deliver the packed
        24-bit PCM rows (``out["pcm24_bytes_host"]``, trailing length
        sample included) instead of converting to f32 — the bytes are the
        exact frames ``write_wav``/serving emit, so byte consumers skip
        the ~1.6 ms host unpack.
        """
        import jax.numpy as jnp

        if key_fold is not None and not fixed_y_bucket:
            # dynamic path: no fused graph to fold inside — apply the fold
            # eagerly so key_fold means the same thing on every path
            # (silently ignoring it would reuse the SAME key per call)
            import jax

            key = jax.random.fold_in(key, int(key_fold))
        x_lengths_host = np.asarray(x_lengths)
        T_x = pick_bucket(x.shape[-1], X_BUCKETS)
        x_pad = np.zeros((x.shape[0], T_x), dtype=np.int32)
        x_pad[:, : x.shape[-1]] = x
        x_pad, x_lengths, spks_j = self._place(
            jnp.asarray(x_pad), jnp.asarray(x_lengths),
            None if spks is None else jnp.asarray(spks),
        )

        if fixed_y_bucket:
            auto = fixed_y_bucket == "auto"
            T_y = (self._auto_y_bucket(int(x_lengths_host.max()), length_scale)
                   if auto else int(fixed_y_bucket))
            lat = self.bf16_latency
            p = self._latency_params() if lat else self.params
            vp = (self._latency_voc_params()
                  if lat and self.vocoder_params is not None
                  else self.vocoder_params)
            fold = np.int32(0 if key_fold is None else key_fold)
            while True:
                fn = self._fused_fn(T_x, T_y, n_timesteps, temperature,
                                    length_scale, spks_j is not None,
                                    with_fold=key_fold is not None)
                out = fn(p, vp, x_pad, x_lengths, key, fold, spks_j)
                if not auto:
                    # no host sync here: serve's fused fast path dispatches
                    # with an integer bucket and fetches LATER (pipelined,
                    # on another thread) via the packed keys. Local callers
                    # that do want the result use fetch_fused_host(out).
                    return out
                # ONE host sync for the saturation check AND the caller's
                # data: the fused graph packed mel_lengths into the wav
                # rows, so a single transfer carries both (a separate
                # mel_lengths fetch costs a full ~27 ms tunnel round trip).
                if "wav_pcm24_parts" in out or "wav_pcm24" in out:
                    packed = (_fetch_parts_host(out["wav_pcm24_parts"])
                              if "wav_pcm24_parts" in out
                              else np.asarray(out["wav_pcm24"]))
                    if raw_pcm24:
                        out["pcm24_bytes_host"] = packed
                        ml = _pcm24_lengths(packed)
                    else:
                        out["waveform_host"], ml = _unpack_pcm24(packed)
                elif "wav_packed" in out:
                    packed = np.asarray(out["wav_packed"])
                    ml = packed[:, -1].astype(np.int32)  # exact for <2**24
                    out["waveform_host"] = packed[:, :-1]
                else:  # vocoder-less pipeline: the (B,) int32 fetch it is
                    ml = np.asarray(out["mel_lengths"])
                out["mel_lengths_host"] = ml
                saturated = bool((ml >= T_y).any())
                valid = x_lengths_host > 0
                if not saturated and valid.any():
                    obs = float(np.max(ml[valid] / (x_lengths_host[valid] * length_scale)))
                    self.observe_dur_ratio(obs)
                if not saturated:
                    return out
                if T_y >= self.FUSED_Y_BUCKETS[-1]:
                    # Even the top fused bucket saturated: silently clipped
                    # audio is never acceptable — warn and re-run through
                    # the DYNAMIC bucketed path, which is length-general
                    # (pick_bucket rounds past the table). Costs one fresh
                    # compile for an utterance this long; correctness over
                    # latency, mirroring serve.py's saturation fallback.
                    warnings.warn(
                        f"[-] Utterance saturated the largest fused mel "
                        f"bucket ({T_y} frames); falling back to the "
                        f"dynamic path for full-length audio. Consider "
                        f"--long-form for very long inputs.", UserWarning)
                    out = self.synthesise_batch(
                        x, x_lengths_host, key, n_timesteps=n_timesteps,
                        temperature=temperature, length_scale=length_scale,
                        spks=spks, pack_wav=raw_pcm24, key_fold=key_fold)
                    if raw_pcm24:  # keep the byte-delivery contract
                        packed = (_fetch_parts_host(out["wav_pcm24_parts"])
                                  if "wav_pcm24_parts" in out
                                  else np.asarray(out["wav_pcm24"]))
                        out["pcm24_bytes_host"] = packed
                        out["mel_lengths_host"] = _pcm24_lengths(packed)
                    else:
                        out["mel_lengths_host"] = np.asarray(out["mel_lengths"])
                    return out
                # truncated: escalate to the next bucket with 2x headroom
                T_y = next((b for b in self.FUSED_Y_BUCKETS if b >= 2 * T_y),
                           self.FUSED_Y_BUCKETS[-1])

        mu_x, w_ceil, y_lengths = self._encode_fn(T_x, length_scale)(
            self.params, x_pad, x_lengths, spks_j
        )
        max_y = int(y_lengths.max())  # one tiny host sync
        T_y = pick_bucket(max_y, Y_BUCKETS)
        out = self._decode_fn(T_x, T_y, n_timesteps, temperature)(
            self.params, mu_x, w_ceil, x_lengths, y_lengths, key, spks=spks_j
        )

        if self.vocoder is not None:
            # Vocode only up to the finer VOC_BUCKET: the decode bucket's
            # padding tail never reaches the (dominant-cost) vocoder.
            T_voc = min(T_y, pick_bucket(min(max_y, T_y), VOC_BUCKETS))
            mel_btc = jnp.swapaxes(out["mel"], 1, 2)[:, :T_voc]  # (B, T_voc, 80)
            if pack_wav:
                pk = self._vocode_packed_fn()(
                    self.vocoder_params, mel_btc,
                    jnp.float32(self.denoiser_strength), out["mel_lengths"])
                out["wav_pcm24_parts" if isinstance(pk, tuple)
                    else "wav_pcm24"] = pk
            else:
                out["waveform"] = self._vocode_fn()(
                    self.vocoder_params, mel_btc, jnp.float32(self.denoiser_strength)
                )
        return out

    def synthesise_corpus(self, utterances, key, n_timesteps: int = 10,
                          temperature: float = 0.667, length_scale: float = 1.0,
                          spk=None, batch_size: int = 8, stage_window: int = 64,
                          fuse_stages: bool = False):
        """Staged batched synthesis over a whole corpus (filelist serving).

        ``synthesise_batch`` pays one blocking host round trip per batch to
        pick the mel bucket (y_lengths.max fetch) and callers usually pay a
        second one for ``mel_lengths`` — ~28 ms each through a
        remote-attached chip. This path dispatches EVERY batch's (tiny)
        encoder pass first, fetches all predicted mel lengths in ONE
        transfer, then runs the decode+vocode stages per batch with no
        further host syncs. Bit-identical outputs to the per-batch path.

        Args:
            utterances: list of 1-D int32 phoneme-id arrays.
            spk: optional int speaker id (broadcast over the corpus).
            stage_window: max batches staged at once. Stage 1 pins every
                staged batch's encoder outputs on device until its stage-3
                turn, so an unbounded window would grow HBM linearly with
                the filelist; huge corpora pay one host sync per window
                instead of one total.

        Yields:
            (batch_utterance_indices, out_dict) per batch, in
            sorted-by-length order; out_dict["mel_lengths_host"] is a host
            numpy array (already fetched — no extra sync needed).
        """
        import jax
        import jax.numpy as jnp

        order = sorted(range(len(utterances)), key=lambda i: len(utterances[i]))
        batches = [order[s : s + batch_size] for s in range(0, len(order), batch_size)]

        for w0 in range(0, len(batches), max(1, stage_window)):
            window = batches[w0 : w0 + max(1, stage_window)]

            # stage 1: dispatch the window's encoder passes; nothing blocks
            encoded = []
            for chunk in window:
                B = len(chunk)
                T_x = pick_bucket(max(len(utterances[i]) for i in chunk), X_BUCKETS)
                x = np.zeros((B, T_x), dtype=np.int32)
                x_lengths = np.zeros((B,), dtype=np.int32)
                for row, idx in enumerate(chunk):
                    x[row, : len(utterances[idx])] = utterances[idx]
                    x_lengths[row] = len(utterances[idx])
                spks_j = None if spk is None else jnp.full((B,), int(spk), jnp.int32)
                x_j, xl_j, spks_j = self._place(jnp.asarray(x), jnp.asarray(x_lengths), spks_j)
                mu_x, w_ceil, y_lengths = self._encode_fn(T_x, length_scale)(
                    self.params, x_j, xl_j, spks_j
                )
                encoded.append((chunk, T_x, mu_x, w_ceil, xl_j,
                                y_lengths, spks_j))

            # stage 2: ONE host transfer for the window's mel lengths
            # (ragged last batch -> concatenate flat, split host-side)
            flat = np.asarray(jnp.concatenate([e[5] for e in encoded]))
            y_host, off = [], 0
            for chunk, *_ in encoded:
                y_host.append(flat[off : off + len(chunk)])
                off += len(chunk)

            # stage 3: decode + vocode per batch; mel bucket known host-side
            for bi, (chunk, T_x, mu_x, w_ceil, x_lengths, y_lengths, spks_j) in enumerate(encoded):
                max_y = int(y_host[bi].max())
                T_y = pick_bucket(max_y, Y_BUCKETS)
                if self.vocoder is not None and fuse_stages:
                    # finer vocoder bucket — see synthesise_batch; the
                    # whole stage (decode + slice + vocode + denoise) is
                    # ONE dispatch (_decode_vocode_fn)
                    T_voc = min(T_y, pick_bucket(min(max_y, T_y), VOC_BUCKETS))
                    out = self._decode_vocode_fn(T_x, T_y, T_voc,
                                                 n_timesteps, temperature)(
                        self.params, self.vocoder_params, mu_x, w_ceil,
                        x_lengths, y_lengths, jax.random.fold_in(key, w0 + bi),
                        spks_j, jnp.float32(self.denoiser_strength),
                    )
                else:
                    out = self._decode_fn(T_x, T_y, n_timesteps, temperature)(
                        self.params, mu_x, w_ceil, x_lengths, y_lengths,
                        jax.random.fold_in(key, w0 + bi), spks=spks_j,
                    )
                    if self.vocoder is not None:
                        # finer vocoder bucket — see synthesise_batch
                        T_voc = min(T_y, pick_bucket(min(max_y, T_y), VOC_BUCKETS))
                        mel_btc = jnp.swapaxes(out["mel"], 1, 2)[:, :T_voc]
                        out["waveform"] = self._vocode_fn()(
                            self.vocoder_params, mel_btc, jnp.float32(self.denoiser_strength)
                        )
                # already-fetched host lengths (decode clips to the bucket)
                out["mel_lengths_host"] = np.minimum(y_host[bi], T_y).astype(np.int32)
                yield chunk, out

    denoiser_strength: float = 0.00025


# ---------------------------------------------------------------------------
# model loading
# ---------------------------------------------------------------------------


def load_matcha(model_name: str, checkpoint_path, device=None):
    """Load MatchaTTS weights: torch .ckpt (converted) or native orbax dir."""
    from matcha_tpu.models.matcha import MatchaTTS

    print(f"[!] Loading {model_name}!")
    checkpoint_path = str(checkpoint_path)
    if os.path.isdir(checkpoint_path):
        from matcha_tpu.utils.checkpoints import load_native_checkpoint

        params, hparams, _, _ = load_native_checkpoint(checkpoint_path)
        kwargs = hparams.get("model_kwargs", {})
        model = MatchaTTS(**{k: (tuple(v) if isinstance(v, list) else v) for k, v in kwargs.items()})
    else:
        from matcha_tpu.utils.checkpoints import load_torch_matcha_checkpoint

        kwargs, params = load_torch_matcha_checkpoint(checkpoint_path)
        model = MatchaTTS(**kwargs)
    print(f"[+] {model_name} loaded!")
    return model, params


def load_vocoder(vocoder_name: str, checkpoint_path, device=None):
    """Load HiFi-GAN (weight norm folded) + precompute the denoiser bias."""
    import jax.numpy as jnp

    from matcha_tpu.models.denoiser import compute_bias_spec
    from matcha_tpu.models.hifigan import Generator, HiFiGANConfig
    from matcha_tpu.utils.checkpoints import load_torch_hifigan_checkpoint

    print(f"[!] Loading {vocoder_name}!")
    if vocoder_name not in VOCODER_URLS:
        raise NotImplementedError(
            f"Vocoder {vocoder_name} not implemented! define a load_<<vocoder_name>> method for it"
        )
    vocoder = Generator(HiFiGANConfig())
    vocoder_params = load_torch_hifigan_checkpoint(str(checkpoint_path))
    bias = compute_bias_spec(lambda mel: vocoder.apply(vocoder_params, mel), mode="zeros")
    print(f"[+] {vocoder_name} loaded!")
    return vocoder, vocoder_params, bias


def assert_required_models_available(args):
    save_dir = get_user_data_dir()
    if args.checkpoint_path is not None:
        model_path = args.checkpoint_path
    else:
        model_path = save_dir / f"{args.model}.ckpt"
        assert_model_downloaded(model_path, MATCHA_URLS[args.model])
    vocoder_path = save_dir / f"{args.vocoder}"
    assert_model_downloaded(vocoder_path, VOCODER_URLS[args.vocoder])
    return {"matcha": model_path, "vocoder": vocoder_path}


# ---------------------------------------------------------------------------
# argument validation (reference semantics, cli.py:134-204)
# ---------------------------------------------------------------------------


def validate_args(args):
    assert args.text or args.file, "Either text or file must be provided Matcha-T(ea)TTS need sometext to whisk the waveforms."
    assert args.temperature >= 0, "Sampling temperature cannot be negative"
    assert args.steps > 0, "Number of ODE steps must be greater than 0"

    if args.checkpoint_path is None:
        if args.model in SINGLESPEAKER_MODEL:
            args = _validate_single_speaker(args)
        if args.model in MULTISPEAKER_MODEL:
            args = _validate_multispeaker(args)
    else:
        if args.vocoder != "hifigan_univ_v1":
            warnings.warn(
                "[-] Using custom model checkpoint! I would suggest passing --vocoder hifigan_univ_v1, unless the custom model is trained on LJ Speech.",
                UserWarning,
            )
        if args.speaking_rate is None:
            args.speaking_rate = 1.0
        if args.vocoder is None:
            args.vocoder = "hifigan_univ_v1"

    if args.batched:
        assert args.batch_size > 0, "Batch size must be greater than 0"
    assert args.speaking_rate > 0, "Speaking rate must be greater than 0"
    return args


def _validate_multispeaker(args):
    info = MULTISPEAKER_MODEL[args.model]
    if args.vocoder is not None:
        if args.vocoder != info["vocoder"]:
            warnings.warn(f"[-] Using {args.model} model! I would suggest passing --vocoder {info['vocoder']}", UserWarning)
    else:
        args.vocoder = info["vocoder"]
    if args.speaking_rate is None:
        args.speaking_rate = info["speaking_rate"]
    spk_range = info["spk_range"]
    if args.spk is not None:
        assert spk_range[0] <= args.spk <= spk_range[-1], f"Speaker ID must be between {spk_range} for this model."
    else:
        warnings.warn(f"[!] Speaker ID not provided! Using speaker ID {info['spk']}", UserWarning)
        args.spk = info["spk"]
    return args


def _validate_single_speaker(args):
    info = SINGLESPEAKER_MODEL[args.model]
    if args.vocoder is not None:
        if args.vocoder != info["vocoder"]:
            warnings.warn(f"[-] Using {args.model} model! I would suggest passing --vocoder {info['vocoder']}", UserWarning)
    else:
        args.vocoder = info["vocoder"]
    if args.speaking_rate is None:
        args.speaking_rate = info["speaking_rate"]
    if args.spk != info["spk"]:
        warnings.warn(f"[-] Ignoring speaker id {args.spk} for {args.model}", UserWarning)
        args.spk = info["spk"]
    return args


# ---------------------------------------------------------------------------
# synthesis drivers
# ---------------------------------------------------------------------------


def save_to_folder(filename: str, output: dict, folder: str):
    folder = Path(folder)
    folder.mkdir(exist_ok=True, parents=True)
    mel = np.asarray(output["mel"]).squeeze()
    save_plot(mel, str(folder / f"{filename}.png"))
    np.save(folder / f"{filename}", mel)
    if "waveform" in output:
        write_wav(folder / f"{filename}.wav", np.asarray(output["waveform"]).squeeze(), 22050)
    return folder.resolve() / f"{filename}.wav"


def get_texts(args):
    if args.text:
        return [args.text]
    with open(args.file, encoding="utf-8") as f:
        return [line for line in f.readlines() if line.strip()]


def _rtf(t_seconds: float, n_samples: int) -> float:
    return t_seconds * 22050 / max(n_samples, 1)


def long_form_synthesis(args, pipeline: TTSPipeline, text: str, spk):
    """Sentence-chunked streaming synthesis for long inputs: each chunk
    runs through the cached fixed-shape graphs, waveforms concatenate."""
    import jax

    from matcha_tpu.text.segment import split_sentences

    chunks = split_sentences(text)
    print(f"[🍵] Long-form input: {len(chunks)} chunks")
    wavs, mels = [], []
    start_t = dt.datetime.now()
    for ci, chunk in enumerate(chunks):
        tp = process_text(ci, chunk, pipeline.cleaner)
        out, wavs_h, mls_h = synth_fetch_guarded(
            pipeline, tp["x"], tp["x_lengths"], jax.random.PRNGKey(args.seed + ci),
            n_timesteps=args.steps, temperature=args.temperature,
            length_scale=args.speaking_rate, spks=spk,
            fixed_y_bucket=args.fixed_y_bucket,
        )
        ml = int(mls_h[0])
        wavs.append(np.asarray(wavs_h[0])[: ml * 256])
        mels.append(np.asarray(out["mel"][0])[:, :ml])
    wav = np.concatenate(wavs)
    mel = np.concatenate(mels, axis=1)
    t = (dt.datetime.now() - start_t).total_seconds()
    rtf_w = _rtf(t, wav.shape[-1])
    print(f"[🍵] Long-form RTF (incl. vocoder): {rtf_w:.4f} for {wav.shape[-1]/22050:.1f}s of audio")
    base_name = "utterance_long_form"
    location = save_to_folder(base_name, {"mel": mel, "waveform": wav}, args.output_folder)
    print(f"[+] Waveform saved: {location}")


def unbatched_synthesis(args, pipeline: TTSPipeline, texts, spk):
    import jax

    total_rtf, total_rtf_w = [], []
    for i, text in enumerate(texts):
        i = i + 1
        base_name = f"utterance_{i:03d}_speaker_{args.spk:03d}" if args.spk is not None else f"utterance_{i:03d}"
        print("".join(["="] * 100))
        tp = process_text(i, text.strip(), pipeline.cleaner)

        key = jax.random.PRNGKey(args.seed + i)
        start_t = dt.datetime.now()
        # ONE packed fetch (auto mode pre-fetched host copies in its sync)
        out, wavs_h, mls_h = synth_fetch_guarded(
            pipeline, tp["x"], tp["x_lengths"], key,
            n_timesteps=args.steps, temperature=args.temperature,
            length_scale=args.speaking_rate, spks=spk,
            fixed_y_bucket=args.fixed_y_bucket,
        )
        ml = int(mls_h[0])
        wav = np.asarray(wavs_h[0])[: ml * 256]
        t = (dt.datetime.now() - start_t).total_seconds()
        rtf = _rtf(t, ml * 256)
        rtf_w = _rtf(t, wav.shape[-1])
        print(f"[🍵-{i}] Matcha-TTS RTF: {rtf:.4f}")
        print(f"[🍵-{i}] Matcha-TTS + VOCODER RTF: {rtf_w:.4f}")
        total_rtf.append(rtf)
        total_rtf_w.append(rtf_w)
        out_single = {"mel": np.asarray(out["mel"][0])[:, :ml], "waveform": wav}
        location = save_to_folder(base_name, out_single, args.output_folder)
        print(f"[+] Waveform saved: {location}")
    _print_rtf_summary(total_rtf, total_rtf_w)


def staged_batched_synthesis(args, pipeline: TTSPipeline, texts, spk):
    """--batched --staged: the corpus protocol (one host sync for the whole
    filelist). Saves the same per-utterance artifacts as batched_synthesis;
    RTF is reported over the whole corpus (per-batch timing is meaningless
    when every encoder pass is dispatched up front)."""
    import jax

    processed = [process_text(i, t.strip(), pipeline.cleaner) for i, t in enumerate(texts)]
    utts = [np.asarray(p["x"][0], np.int32) for p in processed]
    key = jax.random.PRNGKey(args.seed)
    t0 = dt.datetime.now()
    total_samples = 0
    for chunk, out in pipeline.synthesise_corpus(
        utts, key, n_timesteps=args.steps, temperature=args.temperature,
        length_scale=args.speaking_rate, spk=None if spk is None else int(spk[0]),
        batch_size=args.batch_size, fuse_stages=args.fused_stage,
    ):
        wavs = np.asarray(out["waveform"])
        for row, idx in enumerate(chunk):
            base_name = (
                f"utterance_{idx:03d}_speaker_{args.spk:03d}" if args.spk is not None else f"utterance_{idx:03d}"
            )
            length = int(out["mel_lengths_host"][row])
            new_dict = {"mel": np.asarray(out["mel"][row])[:, :length], "waveform": wavs[row][: length * 256]}
            location = save_to_folder(base_name, new_dict, args.output_folder)
            print(f"[🍵-{idx}] Waveform saved: {location}")
        total_samples += int(out["mel_lengths_host"].sum()) * 256
    t = (dt.datetime.now() - t0).total_seconds()
    rtf_w = _rtf(t, total_samples)
    print(f"[🍵] Corpus Matcha-TTS + VOCODER RTF: {rtf_w:.4f} ({len(texts)} utterances)")
    _print_rtf_summary([rtf_w], [rtf_w])


def batched_synthesis(args, pipeline: TTSPipeline, texts, spk):
    import jax

    total_rtf, total_rtf_w = [], []
    processed = [process_text(i, t.strip(), pipeline.cleaner) for i, t in enumerate(texts)]
    # Length-bucketed batching: sort by length so bucket padding is tight.
    order = sorted(range(len(processed)), key=lambda i: processed[i]["x"].shape[-1])
    for bi, start in enumerate(range(0, len(order), args.batch_size)):
        chunk = order[start : start + args.batch_size]
        max_len = max(processed[i]["x"].shape[-1] for i in chunk)
        B = len(chunk)
        x = np.zeros((B, max_len), dtype=np.int32)
        x_lengths = np.zeros((B,), dtype=np.int32)
        for row, idx in enumerate(chunk):
            xi = processed[idx]["x"][0]
            x[row, : xi.shape[-1]] = xi
            x_lengths[row] = xi.shape[-1]
        spks = None if spk is None else np.full((B,), spk[0], dtype=np.int32)

        key = jax.random.PRNGKey(args.seed + bi)
        start_t = dt.datetime.now()
        out, wavs, mls_h = synth_fetch_guarded(
            pipeline, x, x_lengths, key, n_timesteps=args.steps,
            temperature=args.temperature, length_scale=args.speaking_rate, spks=spks,
            fixed_y_bucket=args.fixed_y_bucket,
        )
        wavs = np.asarray(wavs)
        t = (dt.datetime.now() - start_t).total_seconds()
        n_samples = int(np.sum(mls_h)) * 256
        rtf_w = _rtf(t, n_samples)
        print(f"[🍵-Batch: {bi+1}] Matcha-TTS + VOCODER RTF: {rtf_w:.4f}")
        total_rtf.append(rtf_w)
        total_rtf_w.append(rtf_w)
        for row, idx in enumerate(chunk):
            base_name = (
                f"utterance_{idx:03d}_speaker_{args.spk:03d}" if args.spk is not None else f"utterance_{idx:03d}"
            )
            length = int(mls_h[row])
            new_dict = {"mel": np.asarray(out["mel"][row])[:, :length], "waveform": wavs[row][: length * 256]}
            location = save_to_folder(base_name, new_dict, args.output_folder)
            print(f"[🍵-{idx}] Waveform saved: {location}")
    _print_rtf_summary(total_rtf, total_rtf_w)


def _print_rtf_summary(total_rtf, total_rtf_w):
    print("".join(["="] * 100))
    print(f"[🍵] Average Matcha-TTS RTF: {np.mean(total_rtf):.4f} ± {np.std(total_rtf)}")
    print(f"[🍵] Average Matcha-TTS + VOCODER RTF: {np.mean(total_rtf_w):.4f} ± {np.std(total_rtf_w)}")
    print("[🍵] Enjoy the freshly whisked 🍵 Matcha-TTS!")


def print_config(args):
    print("[!] Configurations: ")
    print(f"\t- Model: {args.model}")
    print(f"\t- Vocoder: {args.vocoder}")
    print(f"\t- Temperature: {args.temperature}")
    print(f"\t- Speaking rate: {args.speaking_rate}")
    print(f"\t- Number of ODE steps: {args.steps}")
    print(f"\t- Speaker: {args.spk}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=" 🍵 Matcha-TTS (TPU): A fast TTS architecture with conditional flow matching"
    )
    parser.add_argument("--model", type=str, default="matcha_ljspeech", choices=list(MATCHA_URLS.keys()), help="Model to use")
    parser.add_argument("--checkpoint_path", type=str, default=None, help="Path to a custom model checkpoint (torch .ckpt or native dir)")
    parser.add_argument("--vocoder", type=str, default=None, choices=list(VOCODER_URLS.keys()), help="Vocoder to use")
    parser.add_argument("--text", type=str, default=None, help="Text to synthesize")
    parser.add_argument("--file", type=str, default=None, help="Text file to synthesize")
    parser.add_argument("--spk", type=int, default=None, help="Speaker ID")
    parser.add_argument("--temperature", type=float, default=0.667, help="Variance of the x0 noise (default: 0.667)")
    parser.add_argument("--speaking_rate", type=float, default=None, help="change the speaking rate, a higher value means slower speaking rate (default: 1.0)")
    parser.add_argument("--steps", type=int, default=10, help="Number of ODE steps (default: 10)")
    parser.add_argument("--cpu", action="store_true", help="Force CPU (default: TPU if available)")
    parser.add_argument("--denoiser_strength", type=float, default=0.00025, help="Strength of the vocoder bias denoiser (default: 0.00025)")
    parser.add_argument("--output_folder", type=str, default=os.getcwd(), help="Output folder to save results (default: current dir)")
    parser.add_argument("--batched", action="store_true", help="Batched inference (default: False)")
    parser.add_argument("--long-form", action="store_true", help="Sentence-chunked streaming synthesis for long --text inputs")
    parser.add_argument("--batch_size", type=int, default=32, help="Batch size only useful when --batched (default: 32)")
    parser.add_argument("--seed", type=int, default=1234, help="Noise seed (explicit PRNG; default 1234)")
    parser.add_argument("--fixed-y-bucket", type=lambda s: s if s == "auto" else int(s), default=0, help="Fix the mel bucket length and run the whole text->wav pipeline as ONE fused jit graph (no host sync; lowest latency). 'auto' = self-calibrating tightest bucket. 0 = dynamic bucket pick.")
    parser.add_argument("--staged", action="store_true", help="With --batched: staged corpus serving — dispatch every batch's encoder pass first, fetch all predicted mel lengths in one host transfer, then decode+vocode per bucket (highest filelist throughput).")
    parser.add_argument("--fused-stage", action="store_true", help="With --staged: run decode+vocode+denoise as ONE jit per (mel-bucket, vocoder-bucket) triple instead of separate dispatches. Measured NEUTRAL on the remote-tunnel backend (the B=8 stages are big enough that dispatch boundaries cost nothing) but it quarters per-batch host dispatches — useful on locally-attached TPUs; costs one extra compile per distinct bucket triple.")
    parser.add_argument("--cleaner", type=str, default="english_cleaners2", help="Text cleaner (use english_cleaners_no_espeak without espeak)")
    parser.add_argument("--full-precision", action="store_true", help="f32 matmuls (closest parity with the torch reference)")
    parser.add_argument("--bf16-latency", action="store_true", help="run the fused single-jit serving graph (--fixed-y-bucket) with a bf16 CFM Euler loop + bf16 vocoder tail (~2e-4 wav deviation; durations stay f32/bit-identical). Measured NEUTRAL on v5e (device 10.6 vs 10.0 ms f32: --xla_allow_excess_precision keeps matmuls f32 and bf16 transposed convs hit a slower path, eating the halved HBM traffic) — kept for hardware where bf16 convs are fast")
    parser.add_argument("--bf16-vocoder", action="store_true", help="bf16 vocoder weights/activations (~1e-3 wav deviation). At throughput shapes (>=4096 mel frames per batch) this now routes through the hybrid XLA/Pallas generator and is the fastest measured vocoder config (61.2 ms vs 67.7 f32-hybrid at B=8x1024); at B=1 latency shapes it stays on XLA convs (the narrow Pallas stages compute f32 in VMEM and the bf16<->f32 churn dominates small batches)")
    parser.add_argument("--no-pallas-vocoder", action="store_true", help="disable the Pallas-fused MRF vocoder kernel (default on: ~2.2x faster, ~3e-4 wav deviation)")
    parser.add_argument("--no-pcm24-transfer", action="store_true", help="fetch the fused-graph waveform as f32 instead of device-quantized 24-bit PCM (the written-WAV encoding; default pcm24 cuts the device->host payload 25%% with zero delivered-quality change)")
    parser.add_argument("--data-parallel", action="store_true", help="shard batches over ALL attached devices (data-parallel SPMD serving; params replicate once, each jit stage runs partitioned). Pick --batch_size a multiple of the device count.")
    parser.add_argument("--vocoder-chunk", type=int, default=0, help="run the vocoder on N-frame mel windows (receptive-field halo, sequential) to bound its activation memory — enables larger --batch_size x mel-bucket products. 0 = whole-utterance (default).")
    return parser


def cli(argv=None):
    args = build_parser().parse_args(argv)
    args = validate_args(args)
    import jax

    if args.cpu:
        # jax may already be imported (preloaded interpreters); the config
        # route works as long as no backend has been initialised yet.
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    if args.full_precision:
        jax.config.update("jax_default_matmul_precision", "highest")
    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()  # reuse bucket-shape compiles across runs
    print(f"[+] Devices: {jax.devices()}")
    print_config(args)
    paths = assert_required_models_available(args)

    if args.checkpoint_path is not None:
        print(f"[🍵] Loading custom model from {args.checkpoint_path}")
        paths["matcha"] = args.checkpoint_path
        args.model = "custom_model"

    model, params = load_matcha(args.model, paths["matcha"])
    vocoder, vocoder_params, bias = load_vocoder(args.vocoder, paths["vocoder"])

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from matcha_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
        print(f"[+] Data-parallel serving over {mesh.devices.size} devices")

    pipeline = TTSPipeline(model, params, vocoder, vocoder_params, bias,
                           cleaner=args.cleaner, vocoder_bf16=args.bf16_vocoder,
                           vocoder_pallas=not args.no_pallas_vocoder, mesh=mesh,
                           vocoder_chunk=args.vocoder_chunk,
                           bf16_latency=args.bf16_latency,
                           pcm24_transfer=not args.no_pcm24_transfer)
    pipeline.denoiser_strength = args.denoiser_strength

    texts = get_texts(args)
    spk = np.asarray([args.spk], dtype=np.int32) if args.spk is not None else None
    if args.long_form and args.text:
        long_form_synthesis(args, pipeline, args.text, spk)
    elif len(texts) == 1 or not args.batched:
        unbatched_synthesis(args, pipeline, texts, spk)
    elif args.staged:
        staged_batched_synthesis(args, pipeline, texts, spk)
    else:
        batched_synthesis(args, pipeline, texts, spk)


if __name__ == "__main__":
    cli()
