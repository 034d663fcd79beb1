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


def test_config_tree_render_and_save(tmp_path):
    """format/print_config_tree: reference branch order, guided tree, yaml
    bodies, config_tree.log side effect (rich_utils.print_config_tree)."""
    from matcha_tpu.utils.config import format_config_tree, print_config_tree

    cfg = compose("train", overrides=["run_name=x"])
    cfg["paths"]["output_dir"] = str(tmp_path)
    text = format_config_tree(cfg)
    lines = text.splitlines()
    assert lines[0] == "CONFIG"
    branches = [ln[4:] for ln in lines if ln.startswith(("├── ", "└── "))]
    # print-order fields first, in order; remaining fields after
    head = [b for b in branches if b in
            ("data", "model", "callbacks", "logger", "trainer", "paths", "extras")]
    assert head == ["data", "model", "callbacks", "logger", "trainer", "paths", "extras"]
    assert "task_name" in branches and branches.index("task_name") > len(head) - 1
    assert any("n_feats: 80" in ln for ln in lines)

    print_config_tree(cfg, save_to_file=True)
    assert (tmp_path / "config_tree.log").read_text().startswith("CONFIG")

    # extras() runs BEFORE train() creates the run dir: a fresh (not yet
    # existing) output_dir must be created, not silently skipped
    cfg["paths"]["output_dir"] = str(tmp_path / "fresh" / "run")
    print_config_tree(cfg, save_to_file=True)
    assert (tmp_path / "fresh" / "run" / "config_tree.log").exists()


def test_enforce_tags_noninteractive_default_and_save(tmp_path):
    """enforce_tags (rich_utils.py:80-101 analog): fills ["dev"] when no
    tty, writes tags.log, raises on tagless multirun, no-ops when set."""
    import pytest

    from matcha_tpu.utils.utils import enforce_tags

    cfg = {"tags": None, "paths": {"output_dir": str(tmp_path / "new_run")}}
    enforce_tags(cfg, save_to_file=True)
    assert cfg["tags"] == ["dev"]
    # the run dir is created if extras() runs before train() makes it
    assert (tmp_path / "new_run" / "tags.log").read_text().strip() == "dev"

    cfg2 = {"tags": ["keep"], "paths": {}}
    enforce_tags(cfg2)
    assert cfg2["tags"] == ["keep"]

    with pytest.raises(ValueError, match="multirun"):
        enforce_tags({"tags": None, "_multirun": True})


def _group_options(group):
    import os

    root = os.path.join(os.path.dirname(__file__), "..", "configs", group)
    return sorted(p[:-5] for p in os.listdir(root) if p.endswith(".yaml"))


def test_compose_every_group_option():
    """Config-rot guard: every yaml in every selectable group composes
    against the train root (the reference's tree has 41 files and any of
    them can silently break when keys move)."""
    import pytest

    for group in ("data", "experiment", "trainer", "logger", "callbacks",
                  "debug", "hparams_search"):
        for opt in _group_options(group):
            cfg = compose("train", overrides=[f"{group}={opt}", "run_name=x"])
            assert cfg.model.n_vocab == 178, f"{group}={opt}"
    # the eval root composes too
    assert compose("eval", overrides=["ckpt_path=x"]) is not None
