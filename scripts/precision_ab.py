"""bf16-mixed vs f32 training A/B (VERDICT r3 item 5).

The reference trains with ``precision: 16-mixed``
(/root/reference/configs/trainer/default.yaml); our TPU analog is
``bf16-mixed`` (f32 master params/Adam moments/grads, forward/backward on
bf16 param copies — trainer.py make_train_step). This script settles
whether bf16-mixed can be the DEFAULT: it runs the same N steps with the
same corpus, init and RNG keys under both precisions and records the loss
curves side by side. Equivalence bar: the smoothed total-loss curves stay
within a few percent of each other throughout and land at the same
plateau (bf16 rounding makes the trajectories diverge sample-to-sample,
so pointwise bit-equality is not expected — curve-level equivalence is
the Lightning 16-mixed acceptance standard).

Artifacts -> logs/precision_ab/{curves.png,summary.json}.

Run: python scripts/precision_ab.py [steps=500]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from overfit_evidence import make_corpus  # noqa: E402  (same synthetic corpus)

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "logs", "precision_ab")


def main():
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.data import TextMelDataModule
    from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step
    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    os.makedirs(OUT_DIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="matcha_prec_ab_")
    make_corpus(tmp)

    dm = TextMelDataModule(
        name="prec_ab", train_filelist_path=os.path.join(tmp, "train.txt"),
        valid_filelist_path=os.path.join(tmp, "val.txt"), batch_size=4,
        cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=40,
        f_max=8000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1}, seed=1)
    batches = []
    for b in dm.train_batches(0):
        batches.append({k: (jnp.asarray(v) if v is not None else None)
                        for k, v in b.items()})
        if len(batches) == 3:
            break

    cfg = dict(n_vocab=178, n_feats=40, enc_n_channels=96, enc_filter_channels=192,
               enc_filter_channels_dp=96, enc_n_heads=2, enc_n_layers=3,
               dec_channels=(96, 96), dec_num_mid_blocks=2, dec_num_heads=2,
               dec_attention_head_dim=32)
    model = MatchaTTS(**cfg)
    b0 = batches[0]

    def run(precision, base_key=7):
        """One leg: identical init; ``base_key`` seeds the per-step
        stochasticity (CFM t, noise z, dropout). The f32 control leg
        (same precision, different base_key) measures pure trajectory
        decorrelation — the baseline any bf16-vs-f32 gap must exceed to
        count as a precision effect rather than run-to-run noise."""
        params = model.init({"params": jax.random.PRNGKey(0)},
                            b0["x"], b0["x_lengths"], b0["y"], b0["y_lengths"],
                            jax.random.PRNGKey(1))
        tx = make_optimizer(lr=2e-3, scheduler={"name": "cosine",
                                                "decay_steps": n_steps})
        state = TrainState(step=jnp.asarray(0), params=params,
                           opt_state=tx.init(params))
        step = make_train_step(model, tx, precision=precision)
        key = jax.random.PRNGKey(base_key)
        hist = []
        t0 = time.time()
        for i in range(n_steps):
            state, m = step(state, batches[i % 3], jax.random.fold_in(key, i))
            hist.append((i + 1, float(m["loss"]), float(m["dur_loss"]),
                         float(m["diff_loss"]), float(m["prior_loss"])))
        wall = time.time() - t0
        print(f"[{precision}/key{base_key}] {n_steps} steps in {wall:.1f}s "
              f"final loss {hist[-1][1]:.4f}", flush=True)
        return np.asarray(hist), wall

    h32, w32 = run("f32")
    hbf, wbf = run("bf16-mixed")
    hctl, wctl = run("f32", base_key=99)  # decorrelation control

    # smoothed divergence: compare 25-step moving averages (pointwise the
    # trajectories legitimately decorrelate — different rounding -> different
    # MAS paths after a few hundred steps). Clamp the window for short runs
    # so a 'valid' convolution never yields an empty array.
    k = max(1, min(25, len(h32), len(hbf), len(hctl)))
    sm = lambda h: np.convolve(h[:, 1], np.ones(k) / k, mode="valid")  # noqa: E731
    s32, sbf, sctl = sm(h32), sm(hbf), sm(hctl)
    rel = np.abs(s32 - sbf) / np.maximum(np.abs(s32), 1e-6)
    rel_ctl = np.abs(s32 - sctl) / np.maximum(np.abs(s32), 1e-6)

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for h, name in ((h32, "f32"), (hbf, "bf16-mixed"),
                    (hctl, "f32 (control seed)")):
        axes[0].plot(h[:, 0], h[:, 1], label=name, alpha=0.8)
    axes[0].set_yscale("log")
    axes[0].set_xlabel("step")
    axes[0].set_ylabel("total loss (log)")
    axes[0].legend()
    axes[0].set_title("total loss")
    axes[1].plot(np.arange(rel.size) + k, 100 * rel, label="bf16 vs f32")
    axes[1].plot(np.arange(rel_ctl.size) + k, 100 * rel_ctl,
                 label="f32 seed2 vs f32 (decorrelation baseline)")
    axes[1].set_xlabel("step")
    axes[1].set_ylabel("|smoothed a - b| / f32  [%]")
    axes[1].legend()
    axes[1].set_title(f"smoothed divergence (bf16 max {100 * rel.max():.2f}%, "
                      f"control max {100 * rel_ctl.max():.2f}%)")
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "curves.png"), dpi=120)

    summary = {
        "steps": n_steps,
        "f32": {"wall_s": round(w32, 1), "loss_first": h32[0, 1],
                "loss_final": h32[-1, 1], "loss_final_smoothed": float(s32[-1])},
        "bf16_mixed": {"wall_s": round(wbf, 1), "loss_first": hbf[0, 1],
                       "loss_final": hbf[-1, 1], "loss_final_smoothed": float(sbf[-1])},
        "f32_control_seed": {"wall_s": round(wctl, 1), "loss_first": hctl[0, 1],
                             "loss_final": hctl[-1, 1],
                             "loss_final_smoothed": float(sctl[-1])},
        "max_smoothed_rel_divergence_pct": round(100 * float(rel.max()), 3),
        "final_smoothed_rel_divergence_pct": round(100 * float(rel[-1]), 3),
        "control_max_smoothed_rel_divergence_pct": round(100 * float(rel_ctl.max()), 3),
        "control_final_smoothed_rel_divergence_pct": round(100 * float(rel_ctl[-1]), 3),
        "device": jax.devices()[0].platform,
    }
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main()
