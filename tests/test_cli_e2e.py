"""End-to-end CLI test with fabricated reference-format checkpoints.

Builds a Lightning-style MatchaTTS ``.ckpt`` (tiny config embedded in
``hyper_parameters``) and a full-size weight-normed HiFi-GAN v1 generator
dict, drops them in MATCHA_HOME (so no download is attempted), and drives
``matcha-tts --text ...`` through synthesis to wav/png/npy outputs.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_convert import TINY as _TINY  # noqa: E402
from tests.test_convert import synthetic_matcha_state_dict  # noqa: E402

# CLI tests pair the tiny acoustic model with the full 80-mel HiFi-GAN v1
# and the real 178-symbol vocabulary.
TINY = dict(_TINY, n_feats=80, n_vocab=178)


def _full_hifigan_state_dict(rng):
    """Weight-normed HiFi-GAN v1 generator state dict (random weights)."""
    sd = {}

    def wn(prefix, out, inp, k):
        v = rng.normal(size=(out, inp, k)).astype(np.float32) * 0.05
        g = np.abs(rng.normal(size=(out, 1, 1)).astype(np.float32)) + 0.5
        sd[f"{prefix}.weight_g"] = torch.from_numpy(g)
        sd[f"{prefix}.weight_v"] = torch.from_numpy(v)
        sd[f"{prefix}.bias"] = torch.from_numpy(rng.normal(size=(out,)).astype(np.float32) * 0.01)

    def wn_t(prefix, inp, out, k):
        v = rng.normal(size=(inp, out, k)).astype(np.float32) * 0.05
        g = np.abs(rng.normal(size=(inp, 1, 1)).astype(np.float32)) + 0.5
        sd[f"{prefix}.weight_g"] = torch.from_numpy(g)
        sd[f"{prefix}.weight_v"] = torch.from_numpy(v)
        sd[f"{prefix}.bias"] = torch.from_numpy(rng.normal(size=(out,)).astype(np.float32) * 0.01)

    wn("conv_pre", 512, 80, 7)
    rates_kernels = [(8, 16), (8, 16), (2, 4), (2, 4)]
    ch = 512
    rks = (3, 7, 11)
    for i, (u, k) in enumerate(rates_kernels):
        wn_t(f"ups.{i}", ch, ch // 2, k)
        ch //= 2
        for j, rk in enumerate(rks):
            n = i * 3 + j
            for jj in range(3):
                wn(f"resblocks.{n}.convs1.{jj}", ch, ch, rk)
                wn(f"resblocks.{n}.convs2.{jj}", ch, ch, rk)
    wn("conv_post", 1, ch, 7)
    return sd


@pytest.fixture(scope="module")
def fabricated_ckpts(tmp_path_factory):
    root = tmp_path_factory.mktemp("matcha_home")
    # get_user_data_dir(MATCHA_HOME) joins the app name, like the reference
    home = root / "matcha_tpu"
    home.mkdir()
    rng = np.random.default_rng(7)

    # MatchaTTS lightning-style ckpt with tiny hyper_parameters
    sd = synthetic_matcha_state_dict(rng, TINY)
    hp = {
        "n_vocab": TINY["n_vocab"], "n_spks": 1, "spk_emb_dim": 64,
        "n_feats": TINY["n_feats"], "prior_loss": True, "out_size": None,
        "encoder": {
            "encoder_type": "RoPE Encoder",
            "encoder_params": {
                "n_feats": TINY["n_feats"], "n_channels": TINY["enc_n_channels"],
                "filter_channels": TINY["enc_filter_channels"],
                "filter_channels_dp": TINY["enc_filter_channels_dp"],
                "n_heads": TINY["enc_n_heads"], "n_layers": TINY["enc_n_layers"],
                "kernel_size": 3, "p_dropout": 0.1, "prenet": True,
            },
            "duration_predictor_params": {
                "filter_channels_dp": TINY["enc_filter_channels_dp"],
                "kernel_size": 3, "p_dropout": 0.1,
            },
        },
        "decoder": {
            "channels": list(TINY["dec_channels"]), "dropout": 0.05,
            "attention_head_dim": TINY["dec_attention_head_dim"], "n_blocks": 1,
            "num_mid_blocks": TINY["dec_num_mid_blocks"],
            "num_heads": TINY["dec_num_heads"], "act_fn": "snakebeta",
        },
        "cfm": {"name": "CFM", "solver": "euler", "sigma_min": 1e-4},
        "data_statistics": {"mel_mean": -5.5, "mel_std": 2.1},
    }
    torch.save({"state_dict": sd, "hyper_parameters": hp, "epoch": 3},
               home / "matcha_ljspeech.ckpt")

    torch.save({"generator": _full_hifigan_state_dict(rng)}, home / "hifigan_T2_v1")
    return str(root)


def test_cli_text_to_wav(fabricated_ckpts, tmp_path, monkeypatch):
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    out_dir = tmp_path / "out"

    from matcha_tpu.cli import cli

    cli([
        "--text", "hello world",
        "--cleaner", "english_cleaners_no_espeak",
        "--steps", "2",
        "--output_folder", str(out_dir),
        "--seed", "3",
    ])

    wav = out_dir / "utterance_001.wav"
    png = out_dir / "utterance_001.png"
    npy = out_dir / "utterance_001.npy"
    assert wav.exists() and png.exists() and npy.exists()

    from matcha_tpu.utils.utils import read_wav

    audio, sr = read_wav(str(wav))
    assert sr == 22050
    assert audio.size > 1000
    assert np.isfinite(audio).all()
    mel = np.load(npy)
    assert mel.shape[0] == TINY["n_feats"]


@pytest.mark.slow
def test_cli_mel_lengths_respect_speaking_rate(fabricated_ckpts, monkeypatch, tmp_path):
    """length_scale scales durations: slower rate => more frames."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder, process_text

    model, params = load_matcha(
        "matcha_ljspeech", os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    )
    pipeline = TTSPipeline(model, params, cleaner="english_cleaners_no_espeak")
    tp = process_text(0, "testing speaking rate", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(0)
    out_fast = pipeline.synthesise_batch(tp["x"], tp["x_lengths"], key, n_timesteps=1, length_scale=0.7)
    out_slow = pipeline.synthesise_batch(tp["x"], tp["x_lengths"], key, n_timesteps=1, length_scale=1.4)
    assert int(out_slow["mel_lengths"][0]) > int(out_fast["mel_lengths"][0])


@pytest.mark.slow
def test_cli_bf16_vocoder_close_to_f32(fabricated_ckpts, monkeypatch):
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder, process_text

    ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    voc_ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    model, params = load_matcha("matcha_ljspeech", ckpt)
    vocoder, voc_params, bias = load_vocoder("hifigan_T2_v1", voc_ckpt)

    tp = process_text(0, "precision check", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(0)
    kw = dict(n_timesteps=1, length_scale=1.0)
    p32 = TTSPipeline(model, params, vocoder, voc_params, None, "english_cleaners_no_espeak")
    p16 = TTSPipeline(model, params, vocoder, voc_params, None, "english_cleaners_no_espeak", vocoder_bf16=True)
    w32 = np.asarray(p32.synthesise_batch(tp["x"], tp["x_lengths"], key, **kw)["waveform"])
    w16 = np.asarray(p16.synthesise_batch(tp["x"], tp["x_lengths"], key, **kw)["waveform"])
    assert w16.dtype == np.float32
    # Random (untrained) vocoder weights sit in tanh's saturated/chaotic
    # regime, so pointwise max-deviation is unbounded; the mean deviation
    # bounds the audible effect (trained weights measured ~1e-3 max).
    assert np.abs(w16 - w32).mean() < 0.02


@pytest.mark.slow
def test_corpus_serving_matches_per_batch(fabricated_ckpts, monkeypatch):
    """synthesise_corpus (staged filelist protocol) is bit-identical to the
    per-batch synthesise_batch path and its pre-fetched mel_lengths_host
    match the device mel_lengths."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha

    model, params = load_matcha(
        "matcha_ljspeech", os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    )
    pipeline = TTSPipeline(model, params, cleaner="english_cleaners_no_espeak")
    rng = np.random.default_rng(0)
    utts = [rng.integers(1, 178, size=(int(n),)).astype(np.int32)
            for n in rng.integers(8, 40, size=5)]
    key = jax.random.PRNGKey(11)

    staged = list(pipeline.synthesise_corpus(utts, key, n_timesteps=1, batch_size=2))
    assert sorted(i for chunk, _ in staged for i in chunk) == list(range(5))

    order = sorted(range(5), key=lambda i: len(utts[i]))
    for bi, (chunk, out) in enumerate(staged):
        assert chunk == order[bi * 2 : bi * 2 + 2]
        np.testing.assert_array_equal(
            np.asarray(out["mel_lengths"]), out["mel_lengths_host"])
        # per-batch path with the same fold gives the same mel
        B = len(chunk)
        max_len = max(len(utts[i]) for i in chunk)
        x = np.zeros((B, max_len), np.int32)
        xl = np.zeros((B,), np.int32)
        for row, idx in enumerate(chunk):
            x[row, : len(utts[idx])] = utts[idx]
            xl[row] = len(utts[idx])
        ref = pipeline.synthesise_batch(x, xl, jax.random.fold_in(key, bi), n_timesteps=1)
        np.testing.assert_allclose(
            np.asarray(out["mel"]), np.asarray(ref["mel"]), rtol=0, atol=0)


@pytest.mark.slow
def test_cli_file_batched_staged(fabricated_ckpts, tmp_path, monkeypatch):
    """--file --batched --staged drives the corpus protocol through the
    real CLI and writes one wav per line."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    out_dir = tmp_path / "out"
    filelist = tmp_path / "texts.txt"
    filelist.write_text("hello world\nthe quick brown fox\na longer sentence for the third line\n")

    from matcha_tpu.cli import cli

    cli([
        "--file", str(filelist),
        "--batched", "--staged", "--batch_size", "2",
        "--cleaner", "english_cleaners_no_espeak",
        "--steps", "1",
        "--output_folder", str(out_dir),
        "--seed", "3",
    ])
    for i in range(3):
        assert (out_dir / f"utterance_{i:03d}.wav").exists()

@pytest.mark.slow
def test_data_parallel_serving_matches_single_device(fabricated_ckpts, monkeypatch):
    """TTSPipeline(mesh=...) shards batches over the 8-device CPU mesh and
    reproduces the single-device outputs (GSPMD partitioning is a layout
    decision, not a numerics change)."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha
    from matcha_tpu.parallel.mesh import make_mesh

    model, params = load_matcha(
        "matcha_ljspeech", os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    )
    single = TTSPipeline(model, params, cleaner="english_cleaners_no_espeak")
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = TTSPipeline(model, params, cleaner="english_cleaners_no_espeak", mesh=mesh)

    rng = np.random.default_rng(5)
    x = rng.integers(1, 178, size=(8, 24)).astype(np.int32)
    xl = np.full((8,), 24, np.int32)
    key = jax.random.PRNGKey(3)

    ref = single.synthesise_batch(x, xl, key, n_timesteps=2)
    out = sharded.synthesise_batch(x, xl, key, n_timesteps=2)
    np.testing.assert_allclose(np.asarray(out["mel"]), np.asarray(ref["mel"]),
                               rtol=1e-5, atol=1e-5)

    # the staged corpus path shards too (batch_size == data axis)
    utts = [x[i, : rng.integers(10, 25)] for i in range(8)]
    staged = list(sharded.synthesise_corpus(utts, key, n_timesteps=1, batch_size=8))
    assert sorted(i for chunk, _ in staged for i in chunk) == list(range(8))

    # non-divisible batches fall back to replication but stay correct
    out3 = sharded.synthesise_batch(x[:3], xl[:3], key, n_timesteps=2)
    ref3 = single.synthesise_batch(x[:3], xl[:3], key, n_timesteps=2)
    np.testing.assert_allclose(np.asarray(out3["mel"]), np.asarray(ref3["mel"]),
                               rtol=1e-5, atol=1e-5)

@pytest.mark.slow
def test_chunked_vocoder_matches_full(fabricated_ckpts, monkeypatch):
    """--vocoder-chunk windows (halo-padded, sequentially chained) produce
    the same waveform as whole-utterance vocoding: the halo covers the
    generator's receptive field, edge chunks keep true zero-pad edges."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder

    model, params = load_matcha(
        "matcha_ljspeech", os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    )
    vocoder, voc_params, bias = load_vocoder(
        "hifigan_T2_v1", os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    )
    full = TTSPipeline(model, params, vocoder, voc_params, None,
                       cleaner="english_cleaners_no_espeak")
    chunked = TTSPipeline(model, params, vocoder, voc_params, None,
                          cleaner="english_cleaners_no_espeak", vocoder_chunk=48)

    rng = np.random.default_rng(9)
    x = rng.integers(1, 178, size=(2, 60)).astype(np.int32)
    xl = np.asarray([60, 41], np.int32)
    key = jax.random.PRNGKey(7)

    # long enough mel that chunking actually splits (>=3 windows of 48)
    ref = full.synthesise_batch(x, xl, key, n_timesteps=2, length_scale=3.0)
    out = chunked.synthesise_batch(x, xl, key, n_timesteps=2, length_scale=3.0)
    w_ref, w_out = np.asarray(ref["waveform"]), np.asarray(out["waveform"])
    assert w_ref.shape == w_out.shape
    assert w_ref.shape[1] >= 3 * 48 * 256, "test mel too short to exercise chunking"
    np.testing.assert_allclose(w_out, w_ref, rtol=1e-5, atol=1e-5)


def test_bucket_tables_and_voc_pick():
    """Bucket invariants the vocoder-stage slicing relies on: every decode
    bucket is a multiple of 128 (so the finer VOC_BUCKETS pick never
    exceeds it), pick_bucket covers beyond-table lengths, and the vocoder
    bucket always covers the true max mel length."""
    from matcha_tpu.cli import VOC_BUCKETS, X_BUCKETS, Y_BUCKETS, pick_bucket

    assert all(b % 128 == 0 for b in Y_BUCKETS)
    assert VOC_BUCKETS == tuple(range(128, 2049, 128))

    for max_y in (1, 100, 128, 129, 385, 768, 2048, 2049, 5000):
        T_y = pick_bucket(max_y, Y_BUCKETS)
        T_voc = min(T_y, pick_bucket(min(max_y, T_y), VOC_BUCKETS))
        assert max_y <= T_voc <= T_y or T_voc == T_y  # covers content, never exceeds decode
        assert T_voc >= min(max_y, T_y)
    # beyond the table: rounds up to 64
    assert pick_bucket(2049, Y_BUCKETS) == 2112
    assert pick_bucket(30, X_BUCKETS) == 32

def test_dur_ratio_selection_recovers_from_outliers():
    """The shared frames-per-token calibration must not ratchet: one
    long-winded utterance (a high observed ratio) may lift the selection
    estimate while it is recent, but after enough typical observations
    the estimate decays back and `_auto_y_bucket` picks the tight bucket
    again (round-5 unloaded-TTFA regression: a running max permanently
    over-bucketed every lone request after a loaded window)."""
    import collections

    from matcha_tpu.cli import TTSPipeline

    p = object.__new__(TTSPipeline)
    p._dur_ratio = None
    p._dur_obs = collections.deque(maxlen=64)

    # typical speech: ~4.0 frames per token at rate 1.0 -> 90 tokens
    # lands in the 512-frame bucket (90 * 4.0 * 1.15 = 414)
    for _ in range(20):
        p.observe_dur_ratio(4.0)
    assert p._auto_y_bucket(90, 1.0) == 448

    # one drawn-out outlier (the loaded-window worst case): the estimate
    # may rise while it is the recent tail...
    p.observe_dur_ratio(9.0)
    inflated = p._auto_y_bucket(90, 1.0)
    assert inflated >= 448  # never under the typical pick

    # ...but a running max would stay at 9.0 forever (90*9*1.15 = 932 ->
    # the 960 bucket). After a window of typical traffic the quantile
    # forgets the outlier and the tight bucket returns.
    for _ in range(64):
        p.observe_dur_ratio(4.0)
    assert p._dur_ratio == pytest.approx(4.0)
    assert p._auto_y_bucket(90, 1.0) == 448


@pytest.mark.slow
def test_auto_fused_bucket_calibrates_and_retries():
    """fixed_y_bucket='auto' (VERDICT r2 item 3): the first call runs the
    largest (always-correct) bucket, calibration tightens the next pick,
    a sandbagged ratio triggers the saturation-retry escalation, and the
    auto result equals the dynamic-bucket path for the same key."""
    import jax
    import jax.numpy as jnp

    from matcha_tpu.cli import TTSPipeline
    from matcha_tpu.models import MatchaTTS

    model = MatchaTTS(**_TINY)
    rng = np.random.default_rng(3)
    x = rng.integers(1, _TINY["n_vocab"], size=(1, 24)).astype(np.int32)
    xl = np.asarray([24], np.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(xl),
        jax.random.PRNGKey(1), n_timesteps=1, y_max_length=64,
        method=MatchaTTS.synthesise)
    pipeline = TTSPipeline(model, params)  # no vocoder: mel-only fused graph
    key = jax.random.PRNGKey(5)

    out1 = pipeline.synthesise_batch(x, xl, key, n_timesteps=1,
                                     fixed_y_bucket="auto")
    assert out1["mel"].shape[-1] == TTSPipeline.FUSED_Y_BUCKETS[-1]
    assert pipeline._dur_ratio is not None
    ml = int(out1["mel_lengths_host"][0])

    out2 = pipeline.synthesise_batch(x, xl, key, n_timesteps=1,
                                     fixed_y_bucket="auto")
    T2 = out2["mel"].shape[-1]
    assert ml <= T2 < TTSPipeline.FUSED_Y_BUCKETS[-1]  # tight, still covers
    assert T2 - ml < 64 + ml * TTSPipeline.FUSED_MARGIN  # within margin+bucket

    # same mel as the dynamic (encode->decode) path on the shared frames
    out_dyn = pipeline.synthesise_batch(x, xl, key, n_timesteps=1)
    n = min(out_dyn["mel"].shape[-1], T2)
    np.testing.assert_allclose(np.asarray(out2["mel"])[..., :ml],
                               np.asarray(out_dyn["mel"])[..., :ml],
                               atol=1e-5)

    # sandbag the calibration -> saturated first try -> escalate until valid
    pipeline._dur_ratio = 1e-6
    out3 = pipeline.synthesise_batch(x, xl, key, n_timesteps=1,
                                     fixed_y_bucket="auto")
    assert int(out3["mel_lengths_host"][0]) == ml  # not truncated
    assert out3["mel"].shape[-1] >= ml


@pytest.mark.slow
def test_auto_bucket_packed_single_sync_with_vocoder(fabricated_ckpts, monkeypatch):
    """With a vocoder, auto mode delivers wav + mel_lengths in ONE packed
    transfer: host copies must agree with the device arrays — exactly for
    mel_lengths, within one 24-bit PCM step for the waveform (the default
    transfer is device-quantized wire format; pcm24_transfer=False
    restores bit-exact f32)."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder, process_text

    home = os.path.join(fabricated_ckpts, "matcha_tpu")
    model, params = load_matcha("matcha_ljspeech", os.path.join(home, "matcha_ljspeech.ckpt"))
    vocoder, vp, bias = load_vocoder("hifigan_T2_v1", os.path.join(home, "hifigan_T2_v1"))
    pipeline = TTSPipeline(model, params, vocoder, vp, bias,
                           cleaner="english_cleaners_no_espeak")
    # cap the uncalibrated first bucket so the CPU vocoder stays cheap
    pipeline.FUSED_Y_BUCKETS = (64, 128, 192, 256)

    tp = process_text(0, "a packed sync", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(11)
    out = pipeline.synthesise_batch(tp["x"], tp["x_lengths"], key,
                                    n_timesteps=1, fixed_y_bucket="auto")
    assert "waveform_host" in out and "mel_lengths_host" in out
    np.testing.assert_array_equal(out["mel_lengths_host"],
                                  np.asarray(out["mel_lengths"]))
    dev = np.clip(np.asarray(out["waveform"]), -1, 1)
    assert np.abs(out["waveform_host"] - dev).max() <= 2.0 / (2**23 - 1)
    assert out["waveform_host"].shape[1] == out["mel"].shape[-1] * 256

    exact = TTSPipeline(model, params, vocoder, vp, bias,
                        cleaner="english_cleaners_no_espeak",
                        pcm24_transfer=False)
    exact.FUSED_Y_BUCKETS = (64, 128, 192, 256)
    out = exact.synthesise_batch(tp["x"], tp["x_lengths"], key,
                                 n_timesteps=1, fixed_y_bucket="auto")
    np.testing.assert_array_equal(out["waveform_host"],
                                  np.asarray(out["waveform"]))


@pytest.mark.slow
def test_bf16_latency_fused_close_to_f32(fabricated_ckpts, monkeypatch):
    """``--bf16-latency`` (TTSPipeline bf16_latency=True): the fused
    single-jit graph runs the CFM Euler loop + vocoder tail in bf16.
    Contract: only the decoder param subtree is cast (encoder/duration
    params stay f32, so predicted durations are bit-identical), output is
    f32, and the waveform deviates at bf16-rounding scale since the noise
    is drawn in f32 and cast (flow_matching.cfm_sample)."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax
    import jax.numpy as jnp

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder, process_text

    ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    voc_ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    model, params = load_matcha("matcha_ljspeech", ckpt)
    vocoder, voc_params, _ = load_vocoder("hifigan_T2_v1", voc_ckpt)

    tp = process_text(0, "latency precision check", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(0)
    kw = dict(n_timesteps=2, length_scale=1.0, fixed_y_bucket=64)
    p32 = TTSPipeline(model, params, vocoder, voc_params, None,
                      "english_cleaners_no_espeak", vocoder_pallas=False)
    p16 = TTSPipeline(model, params, vocoder, voc_params, None,
                      "english_cleaners_no_espeak", vocoder_pallas=False,
                      bf16_latency=True)

    # the cached latency params cast exactly the decoder subtree
    lat = p16._latency_params()["params"]
    assert all(a.dtype == jnp.bfloat16 for a in jax.tree.leaves(lat["decoder"])
               if jnp.issubdtype(a.dtype, jnp.floating))
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(lat["encoder"])
               if jnp.issubdtype(a.dtype, jnp.floating))

    o32 = p32.synthesise_batch(tp["x"], tp["x_lengths"], key, **kw)
    o16 = p16.synthesise_batch(tp["x"], tp["x_lengths"], key, **kw)
    w32, w16 = np.asarray(o32["waveform"]), np.asarray(o16["waveform"])
    assert w16.dtype == np.float32 and np.isfinite(w16).all()
    np.testing.assert_array_equal(np.asarray(o32["mel_lengths"]),
                                  np.asarray(o16["mel_lengths"]))
    # untrained tanh-regime vocoder: mean bounds the audible effect (cf.
    # test_cli_bf16_vocoder_close_to_f32)
    assert np.abs(w16 - w32).mean() < 0.03


def test_pcm24_transfer_matches_f32_path(fabricated_ckpts, monkeypatch):
    """Default wire-format transfer: the fused auto-bucket graph ships the
    waveform as device-quantized 24-bit PCM (25% less payload). Contract:
    unpacked waveform_host matches the f32 transfer within one 24-bit
    quantization step, mel_lengths ride the same payload exactly, and the
    raw bytes equal utils.pcm24_bytes(waveform) — so serve/write_wav can
    pass them through without requantizing."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder, process_text
    from matcha_tpu.utils.utils import pcm24_bytes

    ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    voc_ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    model, params = load_matcha("matcha_ljspeech", ckpt)
    vocoder, voc_params, _ = load_vocoder("hifigan_T2_v1", voc_ckpt)

    tp = process_text(0, "wire format check", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(0)
    kw = dict(n_timesteps=1, length_scale=1.0, fixed_y_bucket="auto")
    args = (model, params, vocoder, voc_params, None, "english_cleaners_no_espeak")
    pf32 = TTSPipeline(*args, vocoder_pallas=False, pcm24_transfer=False)
    p24 = TTSPipeline(*args, vocoder_pallas=False)  # default: pcm24 on
    # seed the duration calibration: this test pins the WIRE FORMAT, not
    # auto-bucket selection (test_auto_fused_bucket_calibrates_and_retries
    # covers that) — uncalibrated first calls would compile the largest
    # (2048-frame) fused bucket twice, ~1 min of fast-suite time
    pf32._dur_ratio = p24._dur_ratio = 4.0

    of = pf32.synthesise_batch(tp["x"], tp["x_lengths"], key, **kw)
    op = p24.synthesise_batch(tp["x"], tp["x_lengths"], key, **kw)
    # payloads beyond one flat-region tunnel transfer ship as parallel
    # fetch-stream parts; reassembled they ARE the packed rows
    if "wav_pcm24_parts" in op:
        parts = op["wav_pcm24_parts"]
        assert all(p.dtype == jnp.uint8 for p in parts)
        packed = np.concatenate([np.asarray(p) for p in parts], axis=1)
    else:
        assert op["wav_pcm24"].dtype == jnp.uint8
        packed = np.asarray(op["wav_pcm24"])
    np.testing.assert_array_equal(np.asarray(of["mel_lengths_host"]),
                                  np.asarray(op["mel_lengths_host"]))
    wf, wp = of["waveform_host"], op["waveform_host"]
    assert wp.dtype == np.float32
    assert np.abs(np.clip(wf, -1, 1) - wp).max() <= 2.0 / (2**23 - 1)
    # bytes are exactly the host encoder's output for the same waveform
    raw = packed[0, :-3].tobytes()
    assert raw == pcm24_bytes(np.asarray(op["waveform"][0]))


def test_key_fold_in_graph_and_raw_pcm24_delivery(fabricated_ckpts, monkeypatch):
    """Latency-path trims (round 4): ``key_fold`` derives the per-call key
    inside the fused jit — bit-identical to the eager
    ``jax.random.fold_in(key, i)`` it replaces — and ``raw_pcm24``
    delivers the packed PCM24 rows (the exact write_wav/serve frames)
    without the host f32 unpack."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import (
        TTSPipeline,
        _unpack_pcm24,
        fetch_fused_host,
        load_matcha,
        load_vocoder,
        process_text,
    )

    ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    voc_ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    model, params = load_matcha("matcha_ljspeech", ckpt)
    vocoder, voc_params, _ = load_vocoder("hifigan_T2_v1", voc_ckpt)
    pipe = TTSPipeline(model, params, vocoder, voc_params, None,
                       "english_cleaners_no_espeak", vocoder_pallas=False)
    pipe._dur_ratio = 4.0  # skip the uncalibrated largest-bucket compile
    # Freeze the calibration: this test compares two calls that must share
    # a fused bucket (same key + same bucket -> identical bytes; the CFM
    # noise draw is bucket-shape-dependent). Letting the first call's
    # observation decay the seeded ratio would re-bucket the second call —
    # calibration dynamics have their own tests.
    monkeypatch.setattr(pipe, "observe_dur_ratio", lambda obs: None)

    tp = process_text(0, "fold in graph check", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(3)
    kw = dict(n_timesteps=1, length_scale=1.0, fixed_y_bucket="auto")

    o_eager = pipe.synthesise_batch(tp["x"], tp["x_lengths"],
                                    jax.random.fold_in(key, 7), **kw)
    o_fold = pipe.synthesise_batch(tp["x"], tp["x_lengths"], key,
                                   key_fold=7, raw_pcm24=True, **kw)
    assert "waveform_host" not in o_fold
    packed = o_fold["pcm24_bytes_host"]
    assert packed.dtype == np.uint8
    wav, ml = _unpack_pcm24(packed)
    np.testing.assert_array_equal(ml, np.asarray(o_fold["mel_lengths_host"]))
    np.testing.assert_array_equal(ml, np.asarray(o_eager["mel_lengths_host"]))
    # same folded key -> identical noise -> identical delivered bytes
    np.testing.assert_array_equal(wav, o_eager["waveform_host"])
    # fetch_fused_host understands the raw delivery (no second transfer)
    w2, ml2 = fetch_fused_host(o_fold)
    np.testing.assert_array_equal(w2, wav)
    np.testing.assert_array_equal(ml2, ml)


def test_key_fold_dynamic_path_not_ignored(fabricated_ckpts, monkeypatch):
    """``key_fold`` on the DYNAMIC path (no fused graph to fold inside)
    must still fold — silently ignoring it would reuse the SAME key for
    every call (identical CFM noise across requests)."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, process_text

    ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    model, params = load_matcha("matcha_ljspeech", ckpt)
    pipe = TTSPipeline(model, params, None, None, None,
                       "english_cleaners_no_espeak")
    tp = process_text(0, "dynamic fold check", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(3)
    kw = dict(n_timesteps=1, length_scale=1.0)

    o_eager = pipe.synthesise_batch(tp["x"], tp["x_lengths"],
                                    jax.random.fold_in(key, 7), **kw)
    o_fold = pipe.synthesise_batch(tp["x"], tp["x_lengths"], key,
                                   key_fold=7, **kw)
    o_other = pipe.synthesise_batch(tp["x"], tp["x_lengths"], key,
                                    key_fold=8, **kw)
    np.testing.assert_array_equal(np.asarray(o_fold["mel"]),
                                  np.asarray(o_eager["mel"]))
    assert np.abs(np.asarray(o_other["mel"])
                  - np.asarray(o_eager["mel"])).max() > 0


@pytest.mark.slow
def test_pcm24_pack_wav_dynamic_path(fabricated_ckpts, monkeypatch):
    """DYNAMIC path (serve's): pack_wav ships the same wire format — the
    unpacked waveform matches the f32 transfer within one quantization
    step and mel_lengths ride the same payload. Slow: two extra flagship
    dynamic-path compiles; the fused-path wire format (the latency
    serving default) is pinned by the fast test above."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, _unpack_pcm24, load_matcha, load_vocoder, process_text

    ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    voc_ckpt = os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    model, params = load_matcha("matcha_ljspeech", ckpt)
    vocoder, voc_params, _ = load_vocoder("hifigan_T2_v1", voc_ckpt)

    tp = process_text(0, "wire format check", "english_cleaners_no_espeak")
    key = jax.random.PRNGKey(0)
    args = (model, params, vocoder, voc_params, None, "english_cleaners_no_espeak")
    pf32 = TTSPipeline(*args, vocoder_pallas=False, pcm24_transfer=False)
    p24 = TTSPipeline(*args, vocoder_pallas=False)

    od = pf32.synthesise_batch(tp["x"], tp["x_lengths"], key, n_timesteps=1)
    ok = p24.synthesise_batch(tp["x"], tp["x_lengths"], key, n_timesteps=1,
                              pack_wav=True)
    assert "waveform" not in ok
    from matcha_tpu.cli import fetch_fused_host

    wav_k, ml_k = fetch_fused_host(ok)
    np.testing.assert_array_equal(np.asarray(od["mel_lengths"]), ml_k)
    assert np.abs(np.clip(np.asarray(od["waveform"]), -1, 1)
                  - wav_k).max() <= 2.0 / (2**23 - 1)



@pytest.mark.slow
def test_fused_corpus_stage_matches_split(fabricated_ckpts, monkeypatch):
    """synthesise_corpus(fuse_stages=True) — decode+slice+vocode+denoise as
    ONE jit per (T_x, T_y, T_voc) triple — reproduces the split-stage path
    (same ops, same order; only dispatch boundaries move)."""
    monkeypatch.setenv("MATCHA_HOME", fabricated_ckpts)
    import jax

    from matcha_tpu.cli import TTSPipeline, load_matcha, load_vocoder

    model, params = load_matcha(
        "matcha_ljspeech", os.path.join(fabricated_ckpts, "matcha_tpu", "matcha_ljspeech.ckpt")
    )
    vocoder, voc_params, bias = load_vocoder(
        "hifigan_T2_v1", os.path.join(fabricated_ckpts, "matcha_tpu", "hifigan_T2_v1")
    )
    pipeline = TTSPipeline(model, params, vocoder, voc_params, bias,
                           cleaner="english_cleaners_no_espeak")

    rng = np.random.default_rng(21)
    utts = [rng.integers(1, 178, size=(int(n),)).astype(np.int32)
            for n in rng.integers(8, 40, size=5)]
    key = jax.random.PRNGKey(13)

    split = list(pipeline.synthesise_corpus(utts, key, n_timesteps=1,
                                            batch_size=2, fuse_stages=False))
    fused = list(pipeline.synthesise_corpus(utts, key, n_timesteps=1,
                                            batch_size=2, fuse_stages=True))
    assert [c for c, _ in split] == [c for c, _ in fused]
    for (_, a), (_, b) in zip(split, fused):
        assert "first_sample" in b  # the no-extra-getitem completion handle
        np.testing.assert_array_equal(a["mel_lengths_host"], b["mel_lengths_host"])
        np.testing.assert_allclose(np.asarray(a["mel"]), np.asarray(b["mel"]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(a["waveform"]), np.asarray(b["waveform"]),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(b["first_sample"]),
                                   np.asarray(b["waveform"])[0, 0], rtol=0, atol=0)


def test_voc_apply_routing_by_shape_and_dtype(monkeypatch):
    """Pattern-rot guard for the hybrid-vocoder routing table
    (TTSPipeline._voc_apply): f32 mel -> hybrid at every shape on TPU;
    bf16 mel -> hybrid only at/above PALLAS_MIN_MEL_FRAMES_BF16 frames
    (B=1 latency shapes deliberately stay on XLA convs — the measured
    bf16<->f32 churn loss, see PERFORMANCE.md)."""
    import types

    import jax

    import matcha_tpu.models.hifigan_pallas as hp
    from matcha_tpu.cli import TTSPipeline

    monkeypatch.setattr(hp, "generator_apply_pallas",
                        lambda vp, h, mel: "hybrid")

    fake_jax = types.SimpleNamespace(
        default_backend=lambda: "tpu", numpy=jnp, lax=jax.lax)
    pipe = TTSPipeline.__new__(TTSPipeline)
    pipe.jax = fake_jax
    pipe.vocoder_pallas = True
    pipe.vocoder_chunk = 0
    pipe.vocoder = types.SimpleNamespace(
        config=None, apply=lambda vp, mel: "xla")

    apply = pipe._voc_apply()

    class Mel:
        def __init__(self, b, t, dtype):
            self.shape = (b, t, 80)
            self.dtype = dtype

    # f32: hybrid everywhere (PALLAS_MIN_MEL_FRAMES = 0)
    assert apply(None, Mel(1, 384, jnp.float32)) == "hybrid"
    assert apply(None, Mel(8, 1024, jnp.float32)) == "hybrid"
    # bf16: XLA below the threshold, hybrid at/above it
    assert apply(None, Mel(1, 384, jnp.bfloat16)) == "xla"
    assert apply(None, Mel(2, 512, jnp.bfloat16)) == "xla"
    assert apply(None, Mel(8, 1024, jnp.bfloat16)) == "hybrid"
    # CPU backend or --no-pallas-vocoder: always the flax path
    fake_jax.default_backend = lambda: "cpu"
    assert pipe._voc_apply()(None, Mel(8, 1024, jnp.float32)) == "xla"
    pipe.jax = jax  # real backend in tests is cpu
    pipe.vocoder_pallas = False
    assert pipe._voc_apply()(None, Mel(8, 1024, jnp.float32)) == "xla"
