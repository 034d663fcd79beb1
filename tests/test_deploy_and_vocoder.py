"""Deployment export/roundtrip + vocoder GAN training step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models.hifigan import HiFiGANConfig

TINY_HIFI = HiFiGANConfig(
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 2),),
    num_mels=80,
    hop_size=8,
    n_fft=32,
    win_size=32,
    fmin=0.0,
    fmax=4000.0,
    segment_size=128,
)


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    """Serialize the fused synthesis graph and run the artifact."""
    from jax import export as jexport

    from matcha_tpu.deploy.export import get_exportable_fn
    from matcha_tpu.models import MatchaTTS

    tiny = dict(
        n_vocab=178, n_feats=8, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=8, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    x = jnp.zeros((1, 16), jnp.int32)
    xl = jnp.asarray([16], jnp.int32)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": jax.random.PRNGKey(1)}, x, xl, key,
                        n_timesteps=1, y_max_length=32, method=MatchaTTS.synthesise)

    fn = get_exportable_fn(model, None, n_timesteps=2, T_y=32)
    scales = jnp.asarray([0.667, 1.0], jnp.float32)
    exported = jexport.export(jax.jit(fn))(params, x, xl, scales, key)
    data = exported.serialize()
    assert len(data) > 1000

    reloaded = jexport.deserialize(bytearray(data))
    mel, mel_lengths = reloaded.call(params, x, xl, scales, key)
    direct_mel, direct_lengths = fn(params, x, xl, scales, key)
    np.testing.assert_allclose(np.asarray(mel), np.asarray(direct_mel), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mel_lengths), np.asarray(direct_lengths))


@pytest.mark.slow
def test_infer_batched_multiline(tmp_path, monkeypatch):
    """B=4 artifact + a 6-line file: lines are PADDED INTO THE BATCH DIM
    (reference onnx/infer.py:136-146) and all three output modes work —
    mel npy+png, embedded vocoder wavs, external vocoder wavs."""
    from jax import export as jexport

    from matcha_tpu.deploy import infer
    from matcha_tpu.deploy.export import get_exportable_fn
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.models.hifigan import Generator
    from matcha_tpu.utils.checkpoints import save_native_checkpoint

    tiny = dict(
        n_vocab=178, n_feats=80, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=8, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    B, T_x, T_y = 4, 64, 64
    x = jnp.zeros((B, T_x), jnp.int32)
    xl = jnp.full((B,), T_x, jnp.int32)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": jax.random.PRNGKey(1)}, x[:1, :16], xl[:1], key,
                        n_timesteps=1, y_max_length=32, method=MatchaTTS.synthesise)
    # the native payload stores the full variables dict (what model.apply
    # takes), mirroring what trainer._save writes
    ckpt = save_native_checkpoint(str(tmp_path / "ckpt"), params,
                                  {"model_kwargs": tiny})

    scales = jnp.asarray([0.667, 1.0], jnp.float32)

    def export_to(path, with_vocoder=None):
        fn = get_exportable_fn(model, with_vocoder, n_timesteps=2, T_y=T_y)
        exported = jexport.export(jax.jit(fn))(params, x, xl, scales, key)
        with open(path, "wb") as f:
            f.write(exported.serialize())

    mel_art = str(tmp_path / "mel.mx")
    export_to(mel_art)

    voc = Generator(TINY_HIFI)
    voc_params = voc.init(jax.random.PRNGKey(2), jnp.zeros((1, 16, 80)))
    wav_art = str(tmp_path / "wav.mx")
    export_to(wav_art, with_vocoder=(voc, voc_params))

    lines = [f"hello world number {i}" for i in range(6)]
    txt = tmp_path / "lines.txt"
    txt.write_text("\n".join(lines), encoding="utf-8")

    # mode 1: mel npy + png
    out1 = tmp_path / "out_mel"
    infer.main([mel_art, ckpt, "--file", str(txt), "--output-dir", str(out1),
                "--cleaner", "english_cleaners_no_espeak"])
    for i in range(6):
        assert (out1 / f"output_{i+1}.npy").exists()
        assert (out1 / f"output_{i+1}.png").exists()

    # mode 2: embedded vocoder -> 6 wavs from 2 batches
    out2 = tmp_path / "out_wav"
    infer.main([wav_art, ckpt, "--file", str(txt), "--output-dir", str(out2),
                "--cleaner", "english_cleaners_no_espeak"])
    assert sorted(p.name for p in out2.glob("*.wav")) == [f"output_{i+1}.wav" for i in range(6)]

    # mode 3: external vocoder on the mel artifact
    import matcha_tpu.cli as cli_mod

    monkeypatch.setattr(cli_mod, "load_vocoder",
                        lambda name, path: (voc, voc_params, None))
    out3 = tmp_path / "out_ext"
    infer.main([mel_art, ckpt, "--file", str(txt), "--output-dir", str(out3),
                "--cleaner", "english_cleaners_no_espeak",
                "--vocoder-name", "hifigan_T2_v1"])
    assert sorted(p.name for p in out3.glob("*.wav")) == [f"output_{i+1}.wav" for i in range(6)]


@pytest.mark.slow
def test_vocoder_gan_train_step():
    """One generator+discriminator update on a tiny HiFi-GAN: losses finite,
    parameters change, and the MSD running-u spectral buffer updates."""
    from matcha_tpu.training.vocoder_trainer import init_vocoder_state, make_vocoder_train_step

    h = TINY_HIFI
    gen, mpd, msd, state = init_vocoder_state(jax.random.PRNGKey(0), h, segment_size=h.segment_size)
    # training parameterisation: weight-normed generator AND discriminators
    assert any("weight_v" in str(p) for p in jax.tree_util.tree_leaves_with_path(state.mpd_params))
    assert state.msd_spectral, "MSD scale 0 must carry running-u spectral buffers"
    rng = np.random.default_rng(0)
    T = h.segment_size // h.hop_size
    batch = {
        "mel": jnp.asarray(rng.normal(size=(2, T, h.num_mels)).astype(np.float32)),
        "mel_loss": jnp.asarray(rng.normal(size=(2, h.num_mels, T)).astype(np.float32).transpose(0, 2, 1)),
        "audio": jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, h.segment_size, 1)).astype(np.float32)),
    }
    step_fn = make_vocoder_train_step(gen, mpd, msd, h)
    before = jax.tree.leaves(state.gen_params)[0].copy()
    # a non-degenerate u (conv_post's out_dim=1 u is trivially constant)
    u_before = state.msd_spectral["discriminators_0"]["convs_0"]["u"].copy()
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["gen_loss"]))
    assert np.isfinite(float(metrics["disc_loss"]))
    assert np.isfinite(float(metrics["mel_l1"]))
    after = jax.tree.leaves(state.gen_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    u_after = state.msd_spectral["discriminators_0"]["convs_0"]["u"]
    assert not np.allclose(np.asarray(u_before), np.asarray(u_after))
    assert int(state.step) == 1


@pytest.mark.slow
def test_vocoder_train_entry_and_resume(tmp_path):
    """The runnable vocoder training entry: losses fall over a short run on
    a sine corpus, the checkpoint restores bit-identically, and the LR
    schedule decays per epoch."""
    from argparse import Namespace

    from matcha_tpu.training import vocoder_train
    from matcha_tpu.training.vocoder_trainer import init_vocoder_state, make_vocoder_optimizers
    from matcha_tpu.utils.utils import write_wav

    sr = 22050
    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        t = np.arange(sr // 2) / sr
        audio = (0.4 * np.sin(2 * np.pi * (220 + 30 * i) * t)).astype(np.float32)
        audio += rng.normal(0, 0.005, audio.shape).astype(np.float32)
        p = tmp_path / f"v{i}.wav"
        write_wav(p, audio, sr)
        entries.append(f"{p}|x")
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(entries), encoding="utf-8")

    def mkargs(**kw):
        base = dict(
            train_filelist=str(fl), output_dir=str(tmp_path / "run"), epochs=2,
            max_steps=0, batch_size=2, learning_rate=None, segment_size=TINY_HIFI.segment_size,
            log_every_n_steps=1, save_every_n_epochs=100, restore_from=None,
            fine_tuning=False, base_mels_path=None,
        )
        base.update(kw)
        return Namespace(**base)

    h = TINY_HIFI
    metrics = vocoder_train.train(mkargs(), h=h)
    assert np.isfinite(metrics["gen_loss"])
    last = tmp_path / "run" / "checkpoints" / "last"
    assert last.is_dir()

    # resume bit-identically: restore and compare leaves to the live state
    _, _, _, template = init_vocoder_state(jax.random.PRNGKey(h.seed), h,
                                           segment_size=h.segment_size, steps_per_epoch=2)
    state, epoch = vocoder_train.load_vocoder_checkpoint(str(last), template)
    assert epoch == 2 and int(state.step) == 4

    # LR schedule decays by gamma once per epoch (staircase)
    gen_tx, _ = make_vocoder_optimizers(h, steps_per_epoch=2)
    import optax

    sched = optax.exponential_decay(h.learning_rate, 2, h.lr_decay, staircase=True)
    assert float(sched(0)) == pytest.approx(h.learning_rate)
    assert float(sched(2)) == pytest.approx(h.learning_rate * h.lr_decay)
    assert float(sched(4)) == pytest.approx(h.learning_rate * h.lr_decay**2)


def test_mel_dataset_fine_tuning_branch(tmp_path):
    """fine_tuning loads the conditioning mel from base_mels_path/<stem>.npy
    while audio stays ground truth (reference meldataset.py:184-201)."""
    from matcha_tpu.training.vocoder_data import MelDataset
    from matcha_tpu.utils.utils import write_wav

    sr = 22050
    t = np.arange(sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav_path = tmp_path / "utt.wav"
    write_wav(wav_path, audio, sr)
    (tmp_path / "fl.txt").write_text(f"{wav_path}|x", encoding="utf-8")

    n_frames = sr // 256 + 8
    marker_mel = np.full((80, n_frames), 7.25, np.float32)
    mels_dir = tmp_path / "mels"
    mels_dir.mkdir()
    np.save(mels_dir / "utt.npy", marker_mel)

    ds = MelDataset(str(tmp_path / "fl.txt"), segment_size=8192,
                    fine_tuning=True, base_mels_path=str(mels_dir), shuffle=False)
    item = ds[0]
    frames = 8192 // 256
    assert item["mel"].shape == (80, frames)
    assert np.all(item["mel"] == 7.25)  # came from the npy, not the wav
    assert item["audio"].shape == (8192,)
    assert item["mel_loss"].shape[0] == 80  # ground-truth mel for the L1 loss
    assert not np.all(item["mel_loss"] == 7.25)
