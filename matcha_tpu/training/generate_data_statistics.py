"""``matcha-data-stats``: compute global mel mean/std for normalization.

Equivalent of the reference tool
(matcha/utils/generate_data_statistics.py:25-96): stream the train split
with statistics nulled, accumulate the masked mel sum / sum-of-squares,
and write a JSON with ``mel_mean`` / ``mel_std``.
"""

import argparse
import json
import os
import sys

import numpy as np

from matcha_tpu.utils.config import compose
from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


def compute_data_statistics(datamodule) -> dict:
    total_sum = 0.0
    total_sq = 0.0
    total_count = 0
    for batch in datamodule.train_batches(0):
        y, y_lengths = batch["y"], batch["y_lengths"]  # (B, T, F)
        for i in range(y.shape[0]):
            mel = y[i, : y_lengths[i]]
            total_sum += mel.sum()
            total_sq += (mel**2).sum()
            total_count += mel.size
    mean = total_sum / total_count
    std = float(np.sqrt(total_sq / total_count - mean**2))
    return {"mel_mean": float(mean), "mel_std": std}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Compute mel statistics for a data config")
    parser.add_argument("-i", "--input-config", default="ljspeech", help="data config name (configs/data/<name>.yaml)")
    parser.add_argument("-b", "--batch-size", type=int, default=32)
    parser.add_argument("-f", "--force", action="store_true")
    parser.add_argument("-o", "--output", default=None, help="output JSON path")
    args, extra = parser.parse_known_args(argv)

    cfg = compose(
        "train",
        overrides=[f"data={args.input_config}", f"data.batch_size={args.batch_size}",
                   "data.data_statistics.mel_mean=0.0", "data.data_statistics.mel_std=1.0",
                   *extra],
    )
    out_file = args.output or f"{args.input_config}-stats.json"
    if os.path.exists(out_file) and not args.force:
        print(f"{out_file} exists; use --force to overwrite")
        sys.exit(1)

    from matcha_tpu.train import build_datamodule_from_cfg

    dm = build_datamodule_from_cfg(cfg)
    stats = compute_data_statistics(dm)
    print(stats)
    with open(out_file, "w", encoding="utf-8") as f:
        json.dump(stats, f, indent=4)
    log.info(f"Data statistics saved to {out_file}")


if __name__ == "__main__":
    main()
