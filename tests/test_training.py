"""Training-harness smoke tests on synthetic data.

The fast_dev_run analog of the reference's debug presets (SURVEY.md §4):
a tiny model + synthetic sine-tone corpus, one real optimization step
through the full sharded train_step, checkpoint save/restore.
"""

import json
import os

import jax
import numpy as np
import pytest

from matcha_tpu.utils.utils import write_wav

SR = 22050


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic mini-corpus: 4 tone wavs + filelists."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        dur = 0.35 + 0.1 * i
        t = np.arange(int(SR * dur)) / SR
        freq = 200 + 50 * i
        audio = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        audio += rng.normal(0, 0.01, audio.shape).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wav(p, audio, SR)
        entries.append(f"{p}|hello world number {i}")
    train_fl = root / "train.txt"
    train_fl.write_text("\n".join(entries), encoding="utf-8")
    val_fl = root / "val.txt"
    val_fl.write_text("\n".join(entries[:2]), encoding="utf-8")
    return {"train": str(train_fl), "val": str(val_fl), "root": str(root)}


@pytest.fixture(scope="module")
def datamodule(corpus):
    from matcha_tpu.training.data import TextMelDataModule

    return TextMelDataModule(
        name="test",
        train_filelist_path=corpus["train"],
        valid_filelist_path=corpus["val"],
        batch_size=2,
        cleaners=["english_cleaners_no_espeak"],
        n_spks=1,
        n_feats=16,
        f_max=4000,
        data_statistics={"mel_mean": -5.5, "mel_std": 2.1},
        seed=1,
    )


def test_datamodule_batches(datamodule):
    batches = list(datamodule.train_batches(0))
    assert len(batches) == 2
    b = batches[0]
    assert b["x"].dtype == np.int32
    assert b["y"].shape[0] == 2 and b["y"].shape[2] == 16
    assert b["y"].shape[1] % 64 == 0  # bucketed
    assert (b["x_lengths"] > 0).all() and (b["y_lengths"] > 0).all()
    assert b["spks"] is None
    # Bucketing: both batches share one shape -> one XLA compilation
    assert batches[0]["y"].shape == batches[1]["y"].shape


def _dm_variant(corpus, **kw):
    from matcha_tpu.training.data import TextMelDataModule

    args = dict(
        name="test", train_filelist_path=corpus["train"],
        valid_filelist_path=corpus["val"], batch_size=2,
        cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=16,
        f_max=4000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1},
        seed=1,
    )
    args.update(kw)
    return TextMelDataModule(**args)


def test_datamodule_workers_deterministic(corpus, datamodule):
    """num_workers only changes WHO loads items, never batch composition:
    the worker-pool loader must reproduce the serial loader bit-exactly
    (ordering contract of TextMelDataModule._load_items)."""
    dm_workers = _dm_variant(corpus, num_workers=3)
    serial = list(datamodule.train_batches(0)) + list(datamodule.val_batches())
    parallel = list(dm_workers.train_batches(0)) + list(dm_workers.val_batches())
    assert len(serial) == len(parallel)
    for a, b in zip(serial, parallel):
        for k in ("x", "x_lengths", "y", "y_lengths"):
            np.testing.assert_array_equal(a[k], b[k])


def test_datamodule_native_frontend(corpus, datamodule):
    """The C++/OpenMP mel frontend slots into the dataset unchanged:
    identical ids/lengths, mels within the native-vs-numpy FFT tolerance
    (tests/test_native_audio.py) after statistics normalization."""
    dm_native = _dm_variant(corpus, frontend="native", num_workers=2)
    for a, b in zip(datamodule.train_batches(0), dm_native.train_batches(0)):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["y_lengths"], b["y_lengths"])
        np.testing.assert_allclose(a["y"], b["y"], atol=1e-3)


@pytest.mark.slow
@pytest.mark.skipif((os.cpu_count() or 1) < 4,
                    reason="needs >=4 cores to observe loader scaling")
def test_datamodule_worker_scaling(tmp_path):
    """Guard the worker-pool loader's multi-core scaling claim
    (PERFORMANCE.md loader table was measured on a 1-core box): on a
    >=4-core host, 4 workers must load a mel-extraction-bound corpus
    materially faster than the serial loader. The mel path (numpy
    pocketfft / the C++ frontend) releases the GIL, so threads are
    expected to scale; if a future change reintroduces GIL-bound work in
    the item path, this trips."""
    import time

    rng = np.random.default_rng(0)
    entries = []
    for i in range(48):
        t = np.arange(int(SR * 2.5)) / SR
        audio = (0.4 * np.sin(2 * np.pi * (150 + 20 * i) * t)).astype(np.float32)
        audio += rng.normal(0, 0.01, audio.shape).astype(np.float32)
        p = tmp_path / f"utt{i}.wav"
        write_wav(p, audio, SR)
        entries.append(f"{p}|scaling check utterance number {i}")
    fl = tmp_path / "train.txt"
    fl.write_text("\n".join(entries), encoding="utf-8")

    from matcha_tpu.training.data import TextMelDataModule

    def run(num_workers):
        dm = TextMelDataModule(
            name="scale", train_filelist_path=str(fl),
            valid_filelist_path=str(fl), batch_size=8,
            cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=80,
            f_max=8000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1},
            seed=1, num_workers=num_workers)
        list(dm.train_batches(0))  # warm (phoneme cache, imports)
        # best of 3 timed repetitions: a loaded/shared CI host can stall
        # any single run; the MIN is the capability being asserted
        n = t = None
        for _ in range(3):
            t0 = time.perf_counter()
            n = sum(1 for _ in dm.train_batches(0))
            dt = time.perf_counter() - t0
            t = dt if t is None else min(t, dt)
        return n, t

    n_serial, t_serial = run(0)
    n_par, t_par = run(4)
    assert n_serial == n_par
    # conservative bar: 4 workers must beat serial by >=1.6x (measured
    # headroom is larger; the bar only guards against NO scaling)
    assert t_serial / t_par >= 1.6, (t_serial, t_par)


def test_data_statistics_tool(datamodule):
    from matcha_tpu.training.generate_data_statistics import compute_data_statistics

    stats = compute_data_statistics(datamodule)
    assert np.isfinite(stats["mel_mean"]) and stats["mel_std"] > 0


@pytest.mark.slow
def test_trainer_one_step_and_restore(tmp_path, datamodule):
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import Trainer

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=32, enc_filter_channels=64,
        enc_filter_channels_dp=32, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(32, 32), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16,
    )
    model = MatchaTTS(**tiny)
    out_dir = str(tmp_path / "run")
    trainer = Trainer(
        model=model, datamodule=datamodule, lr=1e-4,
        max_epochs=1, max_steps=1, output_dir=out_dir, seed=0,
        fast_dev_run=True, log_validation_images=False,
    )
    metrics = trainer.fit()
    assert np.isfinite(metrics["loss/train"])
    assert np.isfinite(metrics["loss/val"])

    # last-checkpoint written and restorable
    last = os.path.join(out_dir, "checkpoints", "last")
    assert os.path.isdir(last)
    meta = json.loads(open(last + ".hparams.json").read())
    assert meta["step"] >= 1

    trainer2 = Trainer(
        model=model, datamodule=datamodule, lr=1e-4,
        max_epochs=1, max_steps=2, output_dir=out_dir, seed=0,
        fast_dev_run=True, log_validation_images=False,
    )
    metrics2 = trainer2.fit(restore_from=last)
    assert np.isfinite(metrics2["loss/train"])


@pytest.mark.slow
def test_full_state_resume_bit_identical(tmp_path, datamodule):
    """Interrupted training continues BIT-IDENTICALLY after restore:
    params + Adam moments + step + epoch all round-trip (the reference
    restores full training state, baselightningmodule.py:35-43)."""
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import Trainer

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16, enc_prenet=False,
    )

    def make_trainer(out_dir, max_epochs):
        return Trainer(
            model=MatchaTTS(**tiny), datamodule=datamodule, lr=1e-3,
            max_epochs=max_epochs, output_dir=out_dir, seed=7,
            log_validation_images=False, check_val_every_n_epoch=100,
            save_every_n_epochs=0, loggers={},
        )

    # Uninterrupted: 4 epochs.
    t_full = make_trainer(str(tmp_path / "full"), 4)
    t_full.fit()
    full_state = t_full._final_state

    # Interrupted: 2 epochs, then restore and run to 4.
    t_a = make_trainer(str(tmp_path / "resume"), 2)
    t_a.fit()
    last = os.path.join(str(tmp_path / "resume"), "checkpoints", "last")
    meta = json.loads(open(last + ".hparams.json").read())
    assert meta["epoch"] == 2 and meta["step"] == 4  # 2 batches/epoch

    t_b = make_trainer(str(tmp_path / "resume"), 4)
    t_b.fit(restore_from=last)
    resumed_state = t_b._final_state
    assert int(resumed_state.step) == int(full_state.step) == 8

    flat_full = jax.tree.leaves(jax.device_get(full_state.params))
    flat_res = jax.tree.leaves(jax.device_get(resumed_state.params))
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments too
    for a, b in zip(
        jax.tree.leaves(jax.device_get(full_state.opt_state)),
        jax.tree.leaves(jax.device_get(resumed_state.opt_state)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_durations_supervised_alignment(corpus):
    """datamodule load_durations: precomputed per-phoneme durations from
    <wav_dir>/durations/<stem>.npy flow into the batch and replace MAS in
    the loss path."""
    import jax.numpy as jnp

    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.data import TextMelDataModule

    dm_probe = TextMelDataModule(
        name="probe", train_filelist_path=corpus["train"],
        valid_filelist_path=corpus["val"], batch_size=2,
        cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=16,
        f_max=4000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1}, seed=1,
    )
    dm_probe.setup()
    # write durations that sum exactly to each utterance's mel length
    dur_dir = os.path.join(corpus["root"], "durations")
    os.makedirs(dur_dir, exist_ok=True)
    for entry in dm_probe.trainset.filepaths_and_text:
        path, text = entry[0], entry[1]
        item_x = dm_probe.trainset.get_text(text)
        n_frames = dm_probe.trainset.get_mel(path).shape[-1]
        n_ph = item_x.shape[-1]
        durs = np.full((n_ph,), n_frames // n_ph, np.float32)
        durs[-1] += n_frames - durs.sum()
        stem = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(dur_dir, f"{stem}.npy"), durs)

    dm = TextMelDataModule(
        name="durs", train_filelist_path=corpus["train"],
        valid_filelist_path=corpus["val"], batch_size=2,
        cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=16,
        f_max=4000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1}, seed=1,
        load_durations=True,
    )
    b = next(iter(dm.train_batches(0)))
    assert "durations" in b and b["durations"].shape == b["x"].shape
    assert np.allclose(b["durations"].sum(axis=1), b["y_lengths"])

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(b["x"]), jnp.asarray(b["x_lengths"]),
        jnp.asarray(b["y"]), jnp.asarray(b["y_lengths"]), jax.random.PRNGKey(1),
    )
    dur, prior, diff, attn = model.apply(
        params, jnp.asarray(b["x"]), jnp.asarray(b["x_lengths"]),
        jnp.asarray(b["y"]), jnp.asarray(b["y_lengths"]), jax.random.PRNGKey(2),
        durations=jnp.asarray(b["durations"]), method=MatchaTTS.losses,
    )
    for v in (dur, prior, diff):
        assert np.isfinite(float(v))
    # the alignment is exactly the supplied durations, not a MAS search
    np.testing.assert_allclose(np.asarray(attn).sum(axis=2)[0, : b["x_lengths"][0]],
                               b["durations"][0, : b["x_lengths"][0]])


def test_csv_logger_val_columns(tmp_path):
    """Validation metrics appearing after training metrics widen the CSV
    header instead of being dropped (round-1 weak #3)."""
    from matcha_tpu.training.trainer import MetricLogger

    csv_path = str(tmp_path / "metrics.csv")
    lg = MetricLogger(None, csv_path)
    lg.scalars({"loss/train": 1.0}, step=1)
    lg.scalars({"loss/val": 2.5}, step=1)
    lg.scalars({"loss/train": 0.5, "loss/val": 2.0}, step=2)
    lg.close()
    lines = open(csv_path).read().splitlines()
    assert lines[0] == "step,loss/train,loss/val"
    assert lines[1] == "1,1.0,"
    assert lines[2] == "1,,2.5"
    assert lines[3] == "2,0.5,2.0"


@pytest.mark.slow
def test_train_step_multidevice(datamodule):
    """DP over the 8 virtual CPU devices (ddp_sim analog)."""
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.parallel.mesh import make_mesh, make_param_shardings, replicated, shard_batch
    from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step

    assert jax.device_count() == 8
    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    b = next(iter(datamodule.train_batches(0)))
    # pad batch to 8 samples for the 8-way data axis
    reps = 8 // b["x"].shape[0]
    batch = {k: (np.concatenate([v] * reps) if v is not None else None) for k, v in b.items()}

    mesh = make_mesh(n_model=1)
    import jax.numpy as jnp

    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["x"]), jnp.asarray(batch["x_lengths"]),
        jnp.asarray(batch["y"]), jnp.asarray(batch["y_lengths"]),
        jax.random.PRNGKey(1),
    )
    tx = make_optimizer(1e-4)
    params = jax.device_put(params, replicated(mesh))
    state = TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))
    step_fn = make_train_step(model, tx)
    dev_batch = shard_batch(batch, mesh)
    state, metrics = step_fn(state, dev_batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.slow
def test_bf16_mixed_precision_step(datamodule):
    """bf16-mixed policy: master params/opt-state stay f32, the step runs,
    losses are finite and close to the f32 step on the same state."""
    import jax.numpy as jnp

    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    b = next(iter(datamodule.train_batches(0)))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(b["x"]), jnp.asarray(b["x_lengths"]),
        jnp.asarray(b["y"]), jnp.asarray(b["y_lengths"]), jax.random.PRNGKey(1),
    )
    tx = make_optimizer(1e-4)
    state = TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))

    f32_step = make_train_step(model, tx, precision="f32")
    bf16_step = make_train_step(model, tx, precision="bf16-mixed")
    key = jax.random.PRNGKey(2)
    # the train step donates its state; give each step its own copy
    params2 = jax.tree.map(lambda a: a.copy(), params)
    state2 = TrainState(step=jnp.asarray(0), params=params2, opt_state=tx.init(params2))
    _, m32 = f32_step(state, dict(b), key)
    new_state, m16 = bf16_step(state2, dict(b), key)

    assert np.isfinite(float(m16["loss"]))
    # master params stayed f32 after the bf16 step
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(new_state.params))
    assert all(
        p.dtype == jnp.float32 for p in jax.tree.leaves(new_state.opt_state)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
    )
    # bf16 loss within ~2% of the f32 loss
    assert abs(float(m16["loss"]) - float(m32["loss"])) / float(m32["loss"]) < 0.02


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """The persistent-compile-cache helper points jax at a real directory
    (MATCHA_COMPILATION_CACHE override) and honors the off switch."""
    import jax

    from matcha_tpu.utils.utils import enable_compilation_cache

    # monkeypatch restores env vars but NOT jax.config: restore the cache
    # dir ourselves, or every test compiled after this one silently stops
    # reusing the suite-wide cache conftest.py set up (it would write to
    # this test's throwaway tmp dir instead).
    prev = jax.config.jax_compilation_cache_dir
    try:
        target = tmp_path / "xla_cache"
        monkeypatch.setenv("MATCHA_COMPILATION_CACHE", str(target))
        enable_compilation_cache()
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)

        # "off" leaves the previous setting untouched
        monkeypatch.setenv("MATCHA_COMPILATION_CACHE", "off")
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(target)

        # Regression: with NO env var the default user-dir path must still
        # enable (str(None)=="none" once matched the off-switch list and
        # silently disabled the cache for every entry point).
        monkeypatch.delenv("MATCHA_COMPILATION_CACHE")
        default_dir = tmp_path / "default_home"
        monkeypatch.setenv("MATCHA_HOME", str(default_dir))
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir != str(target)
        assert "xla_cache" in jax.config.jax_compilation_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

@pytest.mark.slow
def test_callbacks_none_and_model_summary(tmp_path, datamodule):
    """`callbacks=none` disables checkpoint writing (reference
    configs/callbacks/none.yaml analog); summarize_params produces a
    depth-limited param table."""
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import Trainer, summarize_params

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=32, enc_filter_channels=64,
        enc_filter_channels_dp=32, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(32, 32), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16,
    )
    model = MatchaTTS(**tiny)
    out_dir = str(tmp_path / "run_nockpt")
    trainer = Trainer(
        model=model, datamodule=datamodule, lr=1e-4,
        max_epochs=1, max_steps=1, output_dir=out_dir, seed=0,
        fast_dev_run=True, log_validation_images=False,
        enable_checkpointing=False, model_summary_depth=2,
    )
    trainer.fit()
    assert not os.path.exists(os.path.join(out_dir, "checkpoints"))

    table = summarize_params(trainer._final_state.params, max_depth=2)
    assert "TOTAL" in table
    n_params = sum(p.size for p in jax.tree.leaves(trainer._final_state.params))
    assert f"{n_params:,}" in table


def test_callbacks_config_group_composition():
    """The callbacks group splits like the reference tree and `none`
    empties it; train.py maps absence of model_checkpoint to
    enable_checkpointing=False."""
    from matcha_tpu.utils.config import compose

    cfg = compose("train", overrides=[])
    cbs = cfg["callbacks"]
    assert cbs["model_checkpoint"]["save_top_k"] == 10
    assert cbs["model_summary"]["max_depth"] == 3
    assert "rich_progress_bar" in cbs

    cfg2 = compose("train", overrides=["callbacks=none"])
    assert not dict(cfg2.get("callbacks") or {})


def test_trainer_devices_cap(datamodule):
    """trainer.devices (reference configs/trainer/*.yaml) caps the mesh."""
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import Trainer

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=32, enc_filter_channels=64,
        enc_filter_channels_dp=32, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(32, 32), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16,
    )
    trainer = Trainer(model=MatchaTTS(**tiny), datamodule=datamodule,
                      devices=2, log_validation_images=False)
    assert trainer.mesh.devices.size <= 2

    from matcha_tpu.utils.config import compose

    cfg = compose("train", overrides=["trainer=ddp"])
    assert cfg["trainer"]["devices"] == "all"
    cfg_cpu = compose("train", overrides=["trainer=cpu"])
    assert cfg_cpu["trainer"]["accelerator"] == "cpu"
    assert cfg_cpu["trainer"]["devices"] == 1


@pytest.mark.slow
def test_topk_rotation_survives_trainer_restart(tmp_path, datamodule):
    """save_top_k rotation across restarts (the soak's rotation
    invariant): a FRESH Trainer resuming from `last` reloads the
    persisted top-k ledger (checkpoints/topk.json) and keeps pruning the
    previously-saved checkpoints — the Lightning ModelCheckpoint
    best_k_models-in-checkpoint analog. Without the ledger every restart
    accumulated k more checkpoints unboundedly."""
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import Trainer

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    out_dir = str(tmp_path / "run")
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    last = os.path.join(ckpt_dir, "last")

    total_epochs = 0
    spe = None  # steps per epoch, inferred from the first saved ckpt
    for chunk in range(4):
        total_epochs += 1
        trainer = Trainer(
            model=model, datamodule=datamodule, lr=1e-4,
            max_epochs=total_epochs, output_dir=out_dir, seed=0,
            save_every_n_epochs=1, save_top_k=2,
            check_val_every_n_epoch=10,  # recency-fallback scoring path
            log_validation_images=False,
        )
        trainer.fit(restore_from=last if os.path.isdir(last) else None)
        kept = sorted(c for c in os.listdir(ckpt_dir)
                      if c.startswith("checkpoint_") and not c.endswith(".json"))
        if spe is None:
            spe = int(kept[0].split("_")[1])
        assert len(kept) <= 2, (chunk, kept)
    # recency fallback: the two NEWEST checkpoints (epochs 3 and 4) survive
    assert kept == [f"checkpoint_{3 * spe:06d}", f"checkpoint_{4 * spe:06d}"]
    assert os.path.exists(os.path.join(ckpt_dir, "topk.json"))


@pytest.mark.slow
def test_topk_ledger_deduplicates_resaved_paths(tmp_path, datamodule):
    """A re-run over the same output_dir WITHOUT resume re-saves the same
    step names the loaded ledger already lists; the entry must be REPLACED,
    not duplicated — a duplicate lets rotation rmtree a directory another
    live entry still claims as retained (effective top-k < save_top_k)."""
    import json

    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import Trainer

    tiny = dict(
        n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
        enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
        dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
        dec_attention_head_dim=16, enc_prenet=False,
    )
    model = MatchaTTS(**tiny)
    out_dir = str(tmp_path / "run")
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    for _ in range(2):  # second run re-trains the SAME epochs from scratch
        trainer = Trainer(
            model=model, datamodule=datamodule, lr=1e-4,
            max_epochs=2, output_dir=out_dir, seed=0,
            save_every_n_epochs=1, save_top_k=2,
            check_val_every_n_epoch=10, log_validation_images=False,
        )
        trainer.fit(restore_from=None)
        names = [e[2] for e in trainer._ckpt_epochs]
        assert len(names) == len(set(names)), f"duplicate ledger entries: {names}"

    with open(os.path.join(ckpt_dir, "topk.json")) as f:
        entries = json.load(f)
    names = [name for _, _, name in entries]
    assert len(names) == len(set(names))
    assert len(names) <= 2
    for name in names:  # every retained entry still exists on disk
        assert os.path.isdir(os.path.join(ckpt_dir, name)), name
