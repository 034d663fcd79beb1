"""Multi-HOST training test: 2 JAX processes on CPU (SURVEY §2.4).

The reference's multi-node story is Lightning DDP over NCCL
(configs/trainer/ddp.yaml). Here it is ``jax.distributed.initialize``
(matcha_tpu/parallel/dist.py) + process-sharded filelists + a global
(data, model) mesh fed per-process via
``jax.make_array_from_process_local_data`` (parallel/mesh.py). This test
spawns two REAL processes coordinated over localhost (the closest analog
of the reference's ddp_sim/ddp_spawn debugging config) and runs a full
``Trainer.fit`` epoch:

* each process owns half the filelist (disjoint shards);
* the train step runs on a 4-device global mesh (2 local devices/process);
* validation metrics are aggregated ACROSS processes (the sync_dist
  analog) — both processes must report the same global mean;
* the orbax checkpoint save participates on all processes.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from matcha_tpu.utils.utils import write_wav

SR = 22050

WORKER = r"""
import json, os, sys
pid = int(sys.argv[1])
root = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

os.environ["MATCHA_COORDINATOR_ADDRESS"] = "localhost:12645"
os.environ["MATCHA_NUM_PROCESSES"] = "2"
os.environ["MATCHA_PROCESS_ID"] = str(pid)
from matcha_tpu.parallel.dist import maybe_initialize_distributed
assert maybe_initialize_distributed()
assert jax.process_count() == 2

from matcha_tpu.models import MatchaTTS
from matcha_tpu.training.data import TextMelDataModule
from matcha_tpu.training.trainer import Trainer

dm = TextMelDataModule(
    name="mp", train_filelist_path=os.path.join(root, "train.txt"),
    valid_filelist_path=os.path.join(root, "train.txt"), batch_size=2,
    cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=16,
    f_max=4000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1}, seed=1,
)
dm.setup()
# disjoint per-process filelist shards (2 of 4 utterances each)
shard = list(dm._process_shard(4))
assert len(shard) == 2 and shard == ([0, 1] if pid == 0 else [2, 3])

tiny = dict(
    n_vocab=178, n_feats=16, enc_n_channels=16, enc_filter_channels=32,
    enc_filter_channels_dp=16, enc_n_heads=2, enc_n_layers=1,
    dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
    dec_attention_head_dim=16, enc_prenet=False,
)
trainer = Trainer(
    model=MatchaTTS(**tiny), datamodule=dm, lr=1e-3, max_epochs=1,
    output_dir=os.path.join(root, "run"), seed=3,
    log_every_n_steps=1, log_validation_images=False, loggers={},
)
assert dict(trainer.mesh.shape) == {"data": 4, "model": 1}
metrics = trainer.fit()
print("RESULT" + json.dumps({"pid": pid, **{k: float(v) for k, v in metrics.items()}}), flush=True)
"""


@pytest.mark.slow
def test_two_process_trainer(tmp_path):
    root = tmp_path
    rng = np.random.default_rng(0)
    entries = []
    for i in range(4):
        t = np.arange(int(SR * 0.4)) / SR
        audio = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)).astype(np.float32)
        audio += rng.normal(0, 0.01, audio.shape).astype(np.float32)
        p = root / f"utt{i}.wav"
        write_wav(p, audio, SR)
        entries.append(f"{p}|test sentence number {i}")
    (root / "train.txt").write_text("\n".join(entries), encoding="utf-8")
    script = root / "worker.py"
    script.write_text(WORKER, encoding="utf-8")

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(root)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT")][0]
        r = json.loads(line[len("RESULT"):])
        results[r["pid"]] = r
    # cross-process validation aggregation: both processes see the same
    # GLOBAL val loss even though their val shards differ
    assert np.isfinite(results[0]["loss/val"])
    assert results[0]["loss/val"] == pytest.approx(results[1]["loss/val"], rel=1e-6)
    assert np.isfinite(results[0]["loss/train"])
    # full-state checkpoint written by the coordinated save
    assert os.path.isdir(root / "run" / "checkpoints" / "last")
