"""Long-haul training soak on the attached chip (VERDICT r2 item 10).

Runs the FLAGSHIP config through the real Trainer for a few thousand
steps over a synthetic corpus (tone wavs through the full datamodule:
filelist parsing, mel extraction, caching, bucketless collate), with
bf16-mixed precision, checkpoint rotation, and the tensorboard+csv logger
backends on — watching for the failure modes only long runs show:

  * steps/s drift (leaks / cache growth / logger slowdown),
  * host RSS growth,
  * checkpoint-rotation correctness under repeated save+restore cycles
    (the run restarts from `last` every chunk, so resume is exercised
    dozens of times, not once).

Prints one JSON line per chunk and a final summary line for
PERFORMANCE.md.

Run: python scripts/soak_train.py [--steps 2000] [--chunk-epochs 10]
     (use --tiny for a CPU smoke of the soak harness itself)
"""

import argparse
import json
import os
import resource
import sys
import time
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_corpus(root: Path, n_utts: int, sr: int = 22050):
    """Tone-burst wavs + `path|text` filelists (the test-suite recipe)."""
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    lines = []
    texts = ["the quick brown fox jumps over the lazy dog",
             "speech synthesis on tensor processing units",
             "a soak run watches for drift and leaks",
             "monotonic alignment search finds the path"]
    for i in range(n_utts):
        dur = 0.6 + 0.05 * (i % 8)
        t = np.arange(int(dur * sr)) / sr
        f0 = 120 + 10 * (i % 12)
        audio = (0.3 * np.sin(2 * np.pi * f0 * t)
                 + 0.1 * np.sin(2 * np.pi * 2.5 * f0 * t)).astype(np.float32)
        p = root / f"utt_{i:04d}.wav"
        with wave.open(str(p), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(sr)
            f.writeframes((audio * 32767).astype(np.int16).tobytes())
        lines.append(f"{p}|{texts[i % len(texts)]}")
    train = root / "train.txt"
    train.write_text("\n".join(lines))
    val = root / "val.txt"
    val.write_text("\n".join(lines[:4]))
    return str(train), str(val)


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--chunk-epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--n-utts", type=int, default=64)
    ap.add_argument("--out", type=str, default="logs/soak")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke of the soak harness)")
    args = ap.parse_args()

    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.data import TextMelDataModule
    from matcha_tpu.training.trainer import Trainer

    out_dir = Path(args.out)
    train_fl, val_fl = build_corpus(out_dir / "corpus", args.n_utts)
    dm = TextMelDataModule(
        name="soak", train_filelist_path=train_fl, valid_filelist_path=val_fl,
        batch_size=args.batch_size, cleaners=["english_cleaners_no_espeak"],
        num_workers=0, seed=42,
        data_statistics={"mel_mean": -5.5, "mel_std": 2.1},
    )
    model = (MatchaTTS(n_feats=80) if not args.tiny else MatchaTTS(
        n_feats=80, enc_n_channels=32, enc_filter_channels=64,
        enc_filter_channels_dp=32, enc_n_layers=2, dec_channels=(32, 32),
        dec_num_mid_blocks=1, dec_attention_head_dim=16))

    steps_per_epoch = args.n_utts // args.batch_size
    chunk_steps = steps_per_epoch * args.chunk_epochs
    n_chunks = max(1, args.steps // chunk_steps)
    ckpt_dir = os.path.join(args.out, "run", "checkpoints")

    history = []
    total_epochs = 0
    for chunk in range(n_chunks):
        total_epochs += args.chunk_epochs
        trainer = Trainer(
            model=model, datamodule=dm, lr=1e-4, max_epochs=total_epochs,
            output_dir=os.path.join(args.out, "run"), seed=1234,
            precision="bf16-mixed",
            check_val_every_n_epoch=args.chunk_epochs,
            save_every_n_epochs=args.chunk_epochs, save_top_k=3,
            log_every_n_steps=steps_per_epoch,
            loggers={"tensorboard": {}, "csv": {}},
            log_validation_images=(chunk == 0),
        )
        restore = os.path.join(ckpt_dir, "last")
        t0 = time.time()
        metrics = trainer.fit(restore_from=restore if os.path.isdir(restore) else None)
        dt = time.time() - t0
        ckpts = sorted(os.listdir(ckpt_dir)) if os.path.isdir(ckpt_dir) else []
        rec = {
            "chunk": chunk, "epochs_done": total_epochs,
            "steps": total_epochs * steps_per_epoch,
            "steps_per_s": round(chunk_steps / dt, 3),
            "rss_mb": round(rss_mb(), 1),
            "loss_val": round(float(metrics.get("loss/val", float("nan"))), 4),
            "n_ckpts": len(ckpts),
        }
        history.append(rec)
        print(json.dumps(rec), flush=True)
        # rotation invariant: top-k + last, never unbounded (each ckpt dir
        # has an .hparams.json sidecar; count only the ckpt dirs)
        n_rot = len([c for c in ckpts
                     if c.startswith("checkpoint_") and not c.endswith(".json")])
        assert n_rot <= 3, ckpts

    first, last = history[0], history[-1]
    drift = (last["steps_per_s"] - first["steps_per_s"]) / max(first["steps_per_s"], 1e-9)
    print(json.dumps({
        "soak_summary": True,
        "total_steps": last["steps"],
        "steps_per_s_first": first["steps_per_s"],
        "steps_per_s_last": last["steps_per_s"],
        "throughput_drift_pct": round(100 * drift, 2),
        "rss_growth_mb": round(last["rss_mb"] - first["rss_mb"], 1),
        "final_val_loss": last["loss_val"],
    }))


if __name__ == "__main__":
    main()
