"""HiFi-GAN vocoder training entry point.

``python -m matcha_tpu.training.vocoder_train --train-filelist ... --output-dir ...``

Completes the capability the reference leaves open (it ships
matcha/hifigan/{models.py,meldataset.py,config.py} but no train script;
vocoder weights are downloaded pretrained). Protocol follows the upstream
HiFi-GAN recipe the reference checkpoints were trained with:

* v1 generator + MPD + MSD, all weight-normed; LSGAN + feature matching +
  45x mel L1; Adam(0.8, 0.99) with per-epoch ExponentialLR(0.999);
* random 8192-sample segments (``MelDataset``), optional fine-tuning from
  precomputed mels (``--fine-tuning --base-mels-path``,
  reference meldataset.py:145-201);
* full-state checkpoints (params + running-u spectral buffers + both
  optimizer states + step/epoch) with exact resume.
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from matcha_tpu.models.hifigan import HiFiGANConfig
from matcha_tpu.training.vocoder_data import MelDataset
from matcha_tpu.training.vocoder_trainer import (
    VocoderTrainState,
    init_vocoder_state,
    make_vocoder_train_step,
)
from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def save_vocoder_checkpoint(ckpt_dir: str, state: VocoderTrainState, epoch: int, tag=None) -> str:
    """Full vocoder train state as flat leaves (treedef rebuilt from a
    fresh init at restore time)."""
    import json

    import orbax.checkpoint as ocp

    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    name = tag or f"g_{step:08d}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    leaves = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(state))]
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"leaves": leaves}, force=True)
    ckptr.wait_until_finished()
    with open(path + ".meta.json", "w", encoding="utf-8") as f:
        json.dump({"step": step, "epoch": epoch}, f)
    return path


def load_vocoder_checkpoint(path: str, template: VocoderTrainState):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    state = jax.tree.unflatten(jax.tree.structure(template), list(payload["leaves"]))
    epoch = 0
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json", encoding="utf-8") as f:
            epoch = json.load(f).get("epoch", 0)
    return state, epoch


def train(args, h: HiFiGANConfig = None) -> dict:
    if h is None:
        h = HiFiGANConfig(segment_size=args.segment_size)
    if args.batch_size:
        h.batch_size = args.batch_size
    if args.learning_rate:
        h.learning_rate = args.learning_rate
    ds = MelDataset(
        args.train_filelist, segment_size=h.segment_size, n_fft=h.n_fft,
        num_mels=h.num_mels, hop_size=h.hop_size, win_size=h.win_size,
        sampling_rate=h.sampling_rate, fmin=h.fmin, fmax=h.fmax,
        fmax_loss=None, seed=h.seed,
        fine_tuning=args.fine_tuning, base_mels_path=args.base_mels_path,
    )
    steps_per_epoch = max(1, len(ds) // h.batch_size)
    gen, mpd, msd, state = init_vocoder_state(
        jax.random.PRNGKey(h.seed), h, segment_size=h.segment_size,
        steps_per_epoch=steps_per_epoch,
    )
    start_epoch = 0
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")
    if args.restore_from:
        state, start_epoch = load_vocoder_checkpoint(args.restore_from, state)
        log.info(f"Restored vocoder state at step {int(state.step)} (epoch {start_epoch})")
    step_fn = make_vocoder_train_step(gen, mpd, msd, h, steps_per_epoch=steps_per_epoch)

    from matcha_tpu.training.trainer import MetricLogger, prefetch_iterator

    logger = MetricLogger(os.path.join(args.output_dir, "tensorboard"),
                          os.path.join(args.output_dir, "csv", "metrics.csv"))
    last = {}
    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        for batch in prefetch_iterator(ds.batches(h.batch_size, epoch=epoch)):
            dev = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, dev)
            step = int(state.step)
            if step % args.log_every_n_steps == 0:
                last = {k: float(v) for k, v in metrics.items()}
                logger.scalars(
                    {"loss/gen": last["gen_loss"], "loss/disc": last["disc_loss"],
                     "loss/mel_l1": last["mel_l1"]}, step)
                log.info(
                    f"epoch {epoch} step {step}: gen={last['gen_loss']:.3f} "
                    f"disc={last['disc_loss']:.3f} mel_l1={last['mel_l1']:.3f}"
                )
            if args.max_steps and step >= args.max_steps:
                break
        save_vocoder_checkpoint(ckpt_dir, state, epoch + 1, tag="last")
        if (epoch + 1) % args.save_every_n_epochs == 0:
            save_vocoder_checkpoint(ckpt_dir, state, epoch + 1)
        log.info(f"epoch {epoch} done in {time.time()-t0:.1f}s")
        if args.max_steps and int(state.step) >= args.max_steps:
            break
    logger.close()
    return last


def main(argv=None):
    import logging

    logging.basicConfig(level=logging.INFO, format="[%(asctime)s][%(name)s] %(message)s")
    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="Train HiFi-GAN (matcha-tpu vocoder)")
    p.add_argument("--train-filelist", type=str, required=True, help="`path|...` filelist of wavs")
    p.add_argument("--output-dir", type=str, default="logs/vocoder")
    p.add_argument("--epochs", type=int, default=3100)
    p.add_argument("--max-steps", type=int, default=0, help="stop after N steps (0 = unlimited)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--segment-size", type=int, default=8192)
    p.add_argument("--log-every-n-steps", type=int, default=20)
    p.add_argument("--save-every-n-epochs", type=int, default=50)
    p.add_argument("--restore-from", type=str, default=None)
    p.add_argument("--fine-tuning", action="store_true",
                   help="fine-tune on precomputed mels (reference meldataset.py:184)")
    p.add_argument("--base-mels-path", type=str, default=None)
    args = p.parse_args(argv)
    return train(args)


if __name__ == "__main__":
    main()
