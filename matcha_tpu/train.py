"""Training entry point: ``python -m matcha_tpu.train [overrides...]``.

The reference's Hydra entry (matcha/train.py:100-118) maps to:
``python -m matcha_tpu.train experiment=ljspeech trainer.max_epochs=100``
with the same config tree and override syntax (see utils/config.py).
"""

import os
import sys
from typing import Optional, Tuple

from matcha_tpu.utils import get_pylogger
from matcha_tpu.utils.config import compose, print_config_tree, save_config
from matcha_tpu.utils.utils import extras, get_metric_value, task_wrapper

log = get_pylogger(__name__)


def build_model_from_cfg(cfg):
    """Instantiate MatchaTTS from the composed config (the
    hydra.utils.instantiate analog for the model tree)."""
    from matcha_tpu.models.matcha import MatchaTTS

    m = cfg.model
    enc = m.encoder.encoder_params
    dp = m.encoder.duration_predictor_params
    dec = m.decoder
    stats = m.get("data_statistics") or {}
    return MatchaTTS(
        n_vocab=int(m.n_vocab),
        n_spks=int(m.n_spks),
        spk_emb_dim=int(m.spk_emb_dim),
        n_feats=int(m.n_feats),
        enc_n_channels=int(enc.n_channels),
        enc_filter_channels=int(enc.filter_channels),
        enc_filter_channels_dp=int(enc.filter_channels_dp),
        enc_n_heads=int(enc.n_heads),
        enc_n_layers=int(enc.n_layers),
        enc_kernel_size=int(enc.kernel_size),
        enc_p_dropout=float(enc.p_dropout),
        enc_prenet=bool(enc.prenet),
        dp_kernel_size=int(dp.kernel_size),
        dec_channels=tuple(dec.channels),
        dec_dropout=float(dec.dropout),
        dec_attention_head_dim=int(dec.attention_head_dim),
        dec_n_blocks=int(dec.n_blocks),
        dec_num_mid_blocks=int(dec.num_mid_blocks),
        dec_num_heads=int(dec.num_heads),
        dec_act_fn=str(dec.act_fn),
        dec_down_block_type=str(dec.get("down_block_type", "transformer")),
        dec_mid_block_type=str(dec.get("mid_block_type", "transformer")),
        dec_up_block_type=str(dec.get("up_block_type", "transformer")),
        sigma_min=float(m.cfm.sigma_min),
        prior_loss=bool(m.prior_loss),
        mel_mean=float(stats.get("mel_mean", 0.0)),
        mel_std=float(stats.get("mel_std", 1.0)),
    )


def build_datamodule_from_cfg(cfg):
    from matcha_tpu.training.data import TextMelDataModule

    d = dict(cfg.data)
    d.pop("_target_", None)
    return TextMelDataModule(**d)


@task_wrapper
def train(cfg) -> Tuple[dict, dict]:
    import jax

    if cfg.get("seed") is not None:
        pass  # all randomness is explicit PRNG keys seeded below

    log.info(f"Instantiating datamodule <{cfg.data.get('_target_')}>")
    datamodule = build_datamodule_from_cfg(cfg)

    log.info(f"Instantiating model <{cfg.model.get('_target_')}>")
    model = build_model_from_cfg(cfg)

    t = cfg.trainer
    if str(t.get("accelerator", "auto")) == "cpu":
        # trainer.accelerator=cpu (reference configs/trainer/cpu.yaml):
        # force the CPU backend even when a TPU is attached.
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            # backend already initialised (e.g. by an earlier run
            # in-process) — training will STAY on the existing backend
            if jax.default_backend() != "cpu":
                log.warning(
                    "trainer.accelerator=cpu ignored: the JAX backend is "
                    f"already initialised on '{jax.default_backend()}'; "
                    "set JAX_PLATFORMS=cpu before process start to force CPU")
    output_dir = cfg.paths.output_dir
    os.makedirs(output_dir, exist_ok=True)
    save_config(cfg, os.path.join(output_dir, "config.yaml"))

    from matcha_tpu.training.trainer import Trainer

    cbs = cfg.get("callbacks") or {}
    cb = cbs.get("model_checkpoint") or {}
    ms = cbs.get("model_summary")
    trainer = Trainer(
        model=model,
        datamodule=datamodule,
        out_size=cfg.model.get("out_size"),
        lr=float(cfg.model.optimizer.get("lr", 1e-4)),
        weight_decay=float(cfg.model.optimizer.get("weight_decay", 0.0)),
        gradient_clip_val=float(t.get("gradient_clip_val", 5.0)),
        max_epochs=int(t.get("max_epochs", -1)),
        max_steps=int(t.get("max_steps", -1)),
        check_val_every_n_epoch=int(t.get("check_val_every_n_epoch", 1)),
        log_every_n_steps=int(t.get("log_every_n_steps", 10)),
        output_dir=output_dir,
        seed=int(cfg.get("seed", 1234)),
        fast_dev_run=bool(t.get("fast_dev_run", False)),
        overfit_batches=int(t.get("overfit_batches", 0)),
        limit_train_batches=t.get("limit_train_batches"),
        limit_val_batches=t.get("limit_val_batches"),
        detect_anomaly=bool(t.get("detect_anomaly", False)),
        profiler=t.get("profiler"),
        save_every_n_epochs=int(cb.get("every_n_epochs", 100)),
        save_top_k=int(cb.get("save_top_k", 10)),
        monitor=str(cb.get("monitor", "epoch")),
        monitor_mode=str(cb.get("mode", "max")),
        enable_checkpointing="model_checkpoint" in cbs,
        save_last=bool(cb.get("save_last", True)),
        model_summary_depth=int(ms.get("max_depth", 3)) if ms is not None else 0,
        enable_progress_bar="rich_progress_bar" in cbs,
        precision=str(t.get("precision", "f32")),
        devices=t.get("devices", "all"),
        hparams={"cfg": dict(cfg)},
        scheduler=cfg.model.get("scheduler"),
        loggers=cfg.get("logger", {"tensorboard": {}}),
    )

    metric_dict = {}
    if cfg.get("train", True):
        log.info("Starting training!")
        metric_dict = trainer.fit(restore_from=cfg.get("ckpt_path"))

    object_dict = {"cfg": cfg, "datamodule": datamodule, "model": model, "trainer": trainer}
    return metric_dict, object_dict


def main(argv=None) -> Optional[float]:
    import logging

    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s][%(name)s][%(levelname)s] - %(message)s",
    )
    # Multi-host bootstrap (the DDP rank-management analog, SURVEY §2.4):
    # no-op unless MATCHA_DIST/MATCHA_COORDINATOR_ADDRESS opt in.
    from matcha_tpu.parallel.dist import maybe_initialize_distributed
    from matcha_tpu.utils.utils import enable_compilation_cache

    maybe_initialize_distributed()
    enable_compilation_cache()  # big-graph compiles are 160-210 s each
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose("train", overrides=argv)
    extras(cfg)
    metric_dict, _ = train(cfg)
    return get_metric_value(metric_dict, cfg.get("optimized_metric"))


if __name__ == "__main__":
    main()
