"""Overfit sanity run: 400 training steps on a synthetic tone corpus.

Validates end-to-end learning dynamics on real hardware (all three losses
must drop). Run from the repo root: python scripts/overfit_sanity.py
"""

import os
import tempfile

import numpy as np


def make_corpus(root: str):
    from matcha_tpu.utils.utils import write_wav

    SR = 22050
    rng = np.random.default_rng(0)
    entries = []
    for i in range(6):
        dur = 0.4 + 0.15 * i
        t = np.arange(int(SR * dur)) / SR
        audio = (0.4 * np.sin(2 * np.pi * (180 + 40 * i) * t)
                 * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        audio += rng.normal(0, 0.01, audio.shape).astype(np.float32)
        p = os.path.join(root, f"utt{i}.wav")
        write_wav(p, audio, SR)
        entries.append(f"{p}|this is test utterance number {i} for the training pipeline")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(entries))
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(entries[:2]))


_tmp = tempfile.mkdtemp(prefix="matcha_overfit_")
make_corpus(_tmp)

import time, jax, jax.numpy as jnp
from matcha_tpu.models import MatchaTTS
from matcha_tpu.training.data import TextMelDataModule
from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step

dm = TextMelDataModule(
    name="t", train_filelist_path=os.path.join(_tmp, "train.txt"),
    valid_filelist_path=os.path.join(_tmp, "val.txt"), batch_size=4,
    cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=16, f_max=4000,
    data_statistics={"mel_mean": -5.5, "mel_std": 2.1}, seed=1)
batch = next(iter(dm.train_batches(0)))
tiny = dict(n_vocab=178, n_feats=16, enc_n_channels=64, enc_filter_channels=128,
            enc_filter_channels_dp=64, enc_n_heads=2, enc_n_layers=2,
            dec_channels=(64,64), dec_num_mid_blocks=1, dec_num_heads=1, dec_attention_head_dim=32)
model = MatchaTTS(**tiny)
params = model.init({"params": jax.random.PRNGKey(0)},
    jnp.asarray(batch["x"]), jnp.asarray(batch["x_lengths"]),
    jnp.asarray(batch["y"]), jnp.asarray(batch["y_lengths"]), jax.random.PRNGKey(1))
tx = make_optimizer(lr=2e-3)
state = TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))
step = make_train_step(model, tx)
db = {k: (jnp.asarray(v) if v is not None else None) for k, v in batch.items()}
key = jax.random.PRNGKey(7)
hist = []
t0 = time.time()
for i in range(400):
    state, m = step(state, db, key)
    if i % 50 == 0 or i == 399:
        hist.append((i, float(m["loss"]), float(m["dur_loss"]), float(m["diff_loss"]), float(m["prior_loss"])))
        print(f"step {i}: loss={hist[-1][1]:.3f} dur={hist[-1][2]:.3f} diff={hist[-1][3]:.3f} prior={hist[-1][4]:.3f}", flush=True)
print("total time:", round(time.time()-t0,1))
assert hist[-1][1] < hist[0][1] * 0.5, "loss did not halve"
assert hist[-1][2] < hist[0][2] * 0.2, "dur loss did not drop"
print("OVERFIT SANITY PASSED")
