"""Config composition tests (the Hydra-equivalent layer)."""

from matcha_tpu.utils.config import compose


def test_compose_train_defaults():
    cfg = compose("train", overrides=["run_name=test"])
    assert cfg.data.name == "ljspeech"
    assert cfg.model.n_vocab == 178
    assert cfg.model.encoder.encoder_params.n_channels == 192
    assert cfg.model.decoder.channels == [256, 256]
    assert float(cfg.model.cfm.sigma_min) == 1e-4
    assert cfg.trainer.gradient_clip_val == 5.0
    # interpolation: model.n_spks <- data.n_spks
    assert cfg.model.n_spks == 1
    assert cfg.model.data_statistics.mel_mean == -5.536622


def test_compose_experiment_and_overrides():
    cfg = compose("train", overrides=[
        "experiment=multispeaker",
        "trainer.max_epochs=3",
        "model.decoder.channels=[128,128]",
        "run_name=x",
    ])
    assert cfg.data.n_spks == 109
    assert cfg.model.n_spks == 109  # interpolation follows the override
    assert cfg.trainer.max_epochs == 3
    assert cfg.model.decoder.channels == [128, 128]
    assert cfg.model.data_statistics.mel_mean == -6.630575


def test_compose_debug_preset():
    cfg = compose("train", overrides=["debug=fdr", "run_name=x"])
    assert cfg.trainer.fast_dev_run is True
    assert cfg.trainer.devices == 1
    assert cfg.task_name == "debug"


def test_compose_min_memory_experiment():
    cfg = compose("train", overrides=["experiment=ljspeech_min_memory", "run_name=x"])
    assert cfg.model.out_size == 172


def test_dotted_override_types():
    cfg = compose("train", overrides=[
        "run_name=x", "seed=7", "model.prior_loss=false", "ckpt_path=null",
    ])
    assert cfg.seed == 7
    assert cfg.model.prior_loss is False
    assert cfg.ckpt_path is None
    # seed interpolation reaches the data config
    assert cfg.data.seed == 7
