"""Evaluation entry: ``python -m matcha_tpu.eval ckpt_path=...``.

Backs configs/eval.yaml (the reference ships the config stub only):
computes validation losses for a checkpoint over the configured dataset,
and optionally synthesis-vs-target MCD (utils/metrics.py) on a few
utterances.
"""

import sys
from typing import Optional

import numpy as np

from matcha_tpu.utils import get_pylogger
from matcha_tpu.utils.config import compose
from matcha_tpu.utils.utils import task_wrapper

log = get_pylogger(__name__)


@task_wrapper
def evaluate(cfg):
    import jax
    import jax.numpy as jnp

    from matcha_tpu.models.matcha import MatchaTTS
    from matcha_tpu.train import build_datamodule_from_cfg, build_model_from_cfg
    from matcha_tpu.training.trainer import make_eval_step
    from matcha_tpu.utils.checkpoints import load_native_checkpoint
    from matcha_tpu.utils.metrics import mcd

    assert cfg.get("ckpt_path"), "eval requires ckpt_path=..."
    datamodule = build_datamodule_from_cfg(cfg)
    model = build_model_from_cfg(cfg)
    params, _, step, _ = load_native_checkpoint(cfg.ckpt_path)
    log.info(f"Loaded checkpoint at step {step}")

    eval_step = make_eval_step(model)
    sums, count = {}, 0
    key = jax.random.PRNGKey(0)
    mcds = []
    for bi, batch in enumerate(datamodule.val_batches()):
        dev = {k: (jnp.asarray(v) if v is not None else None) for k, v in batch.items()}
        m = eval_step(params, dev, key)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        count += 1
        if bi == 0 and cfg.get("eval_mcd", True):
            out = model.apply(
                params, dev["x"][:2], dev["x_lengths"][:2], jax.random.PRNGKey(1),
                n_timesteps=10, y_max_length=batch["y"].shape[1],
                spks=dev["spks"][:2] if dev.get("spks") is not None else None,
                method=MatchaTTS.synthesise,
            )
            for i in range(min(2, batch["y"].shape[0])):
                target = batch["y"][i].T  # (F, T) normalized
                gen = np.asarray(out["decoder_outputs"][i])
                L = int(min(batch["y_lengths"][i], out["mel_lengths"][i]))
                mcds.append(mcd(gen, target, lengths=L))
    means = {k: v / max(count, 1) for k, v in sums.items()}
    if mcds:
        means["mcd_vs_target"] = float(np.mean(mcds))
    for k, v in sorted(means.items()):
        log.info(f"{k}: {v:.5f}")
        print(f"{k}: {v:.5f}")
    return means, {"cfg": cfg}


def main(argv=None) -> Optional[dict]:
    import logging

    logging.basicConfig(level=logging.INFO)
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose("eval", overrides=argv)
    metrics, _ = evaluate(cfg)
    return metrics


if __name__ == "__main__":
    main()
