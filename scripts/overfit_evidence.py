"""On-chip overfit evidence run (VERDICT r3 item 8).

The analog of the reference's ``debug=overfit`` preset
(/root/reference/configs/debug/overfit.yaml: overfit_batches 3), driven
directly through the jitted train step on the real TPU and ARCHIVED:
loss curve, converged MAS alignment (should be a clean monotone
diagonal), and generated-vs-target mel images land in
``logs/overfit_evidence/`` as PNG + a JSON summary.

Run: python scripts/overfit_evidence.py [steps=800]
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "logs", "overfit_evidence")


def make_corpus(root: str, n: int = 12):
    """Synthetic tone corpus: AM-modulated sines with distinct carriers so
    every utterance has learnable, distinct spectral structure."""
    from matcha_tpu.utils.utils import write_wav

    SR = 22050
    rng = np.random.default_rng(0)
    entries = []
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a stitch in time saves nine they always say",
        "speech synthesis on tensor processing units",
        "flow matching learns straight paths from noise",
        "monotonic alignment search finds the best path",
        "twelve synthetic utterances for the overfit run",
        "the alignment should converge to a clean diagonal",
        "losses must approach zero on three fixed batches",
        "this utterance varies the duration distribution",
        "one more line with different phoneme content",
        "bucketed padding keeps every shape compiled once",
        "the last utterance closes out the tone corpus",
    ]
    for i in range(n):
        # >=2s each: the mel must carry ~2-3 frames per interspersed token
        # (Ty >= Tx), else MAS is FORCED to give some tokens zero frames and
        # their duration target log(1e-8) is an unlearnable data artifact
        # (real speech corpora always satisfy Ty >> Tx).
        #
        # The spectral content must VARY OVER TIME (a melody of distinct
        # tone segments, like phones in speech): a constant carrier makes
        # every frame look alike, the MAS path is then arbitrary, and the
        # duration targets it induces shift every epoch. What the melodic
        # corpus measurably buys is a STABLE MAS path (committed artifact:
        # alignment_monotone_fraction 1.0 across probes); the dur loss
        # itself still plateaus ~0.4 at 3k steps either way
        # (logs/overfit_evidence/summary.json: dur_final 0.396, eval 0.43).
        dur = 2.0 + 0.25 * (i % 6)
        t = np.arange(int(SR * dur)) / SR
        seg_rng = np.random.default_rng(100 + i)
        n_seg = 10 + (i % 4)
        bounds = np.sort(seg_rng.uniform(0.08, 0.92, n_seg - 1))
        bounds = np.concatenate([[0.0], bounds, [1.0]]) * dur
        f0s = seg_rng.uniform(120, 600, n_seg)
        # piecewise-CONSTANT pitch segments (distinct "phones"), phase kept
        # continuous across boundaries by integrating instantaneous freq
        f_inst = f0s[np.searchsorted(bounds[1:-1], t)]
        phase = 2 * np.pi * np.cumsum(f_inst) / SR
        audio = (0.4 * np.sin(phase) + 0.2 * np.sin(2 * phase)) \
            * (0.5 + 0.5 * np.sin(2 * np.pi * (2 + 0.5 * i) * t))
        audio = audio.astype(np.float32)
        audio += rng.normal(0, 0.005, audio.shape).astype(np.float32)
        p = os.path.join(root, f"utt{i}.wav")
        write_wav(p, audio, SR)
        entries.append(f"{p}|{texts[i % len(texts)]}")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(entries))
    with open(os.path.join(root, "val.txt"), "w") as f:
        f.write("\n".join(entries[:2]))


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
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    os.makedirs(OUT_DIR, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix="matcha_overfit_ev_")
    make_corpus(tmp)

    dm = TextMelDataModule(
        name="overfit", train_filelist_path=os.path.join(tmp, "train.txt"),
        valid_filelist_path=os.path.join(tmp, "val.txt"), batch_size=4,
        cleaners=["english_cleaners_no_espeak"], n_spks=1, n_feats=40,
        f_max=8000, data_statistics={"mel_mean": -5.5, "mel_std": 2.1}, seed=1)
    # the reference preset's overfit_batches: 3 — take 3 fixed batches
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
    params = model.init({"params": jax.random.PRNGKey(0)},
                        b0["x"], b0["x_lengths"], b0["y"], b0["y_lengths"],
                        jax.random.PRNGKey(1))
    # cosine-anneal to ~0 over the run: at a flat 2e-3 the duration/CFM
    # losses plateau in an oscillation band (~0.4/1.5) instead of settling
    tx = make_optimizer(lr=2e-3, scheduler={"name": "cosine",
                                            "decay_steps": n_steps})
    state = TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))
    step = make_train_step(model, tx)

    key = jax.random.PRNGKey(7)
    hist = []
    t0 = time.time()
    for i in range(n_steps):
        state, m = step(state, batches[i % 3], jax.random.fold_in(key, i))
        if i % 20 == 19 or i == 0:
            hist.append((i + 1, float(m["loss"]), float(m["dur_loss"]),
                         float(m["diff_loss"]), float(m["prior_loss"])))
            if i % 100 == 99:
                print(f"step {i+1}: loss={hist[-1][1]:.3f} dur={hist[-1][2]:.4f} "
                      f"diff={hist[-1][3]:.3f} prior={hist[-1][4]:.3f}", flush=True)
    wall = time.time() - t0
    print(f"{n_steps} steps in {wall:.1f}s", flush=True)

    # --- loss curve ---------------------------------------------------------
    h = np.asarray(hist)
    fig, ax = plt.subplots(figsize=(7, 4))
    for idx, label in ((1, "total"), (2, "duration"), (3, "diff (CFM)"), (4, "prior")):
        ax.plot(h[:, 0], h[:, idx], label=label)
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("loss (log)")
    ax.set_title(f"overfit 3 batches, TPU v5e-lite — final total {h[-1, 1]:.3f}")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(OUT_DIR, "loss_curve.png"), dpi=120)

    # --- converged MAS alignment + mel reconstructions ----------------------
    dur_loss, prior, diff_loss, attn = model.apply(
        state.params, b0["x"], b0["x_lengths"], b0["y"], b0["y_lengths"],
        jax.random.fold_in(key, 999), method=MatchaTTS.losses)
    attn = np.asarray(attn)
    out = model.apply(state.params, b0["x"][:2], b0["x_lengths"][:2],
                      jax.random.PRNGKey(5), n_timesteps=10,
                      y_max_length=int(b0["y"].shape[1]),
                      method=MatchaTTS.synthesise)

    for i in range(2):
        Tx, Ty = int(b0["x_lengths"][i]), int(b0["y_lengths"][i])
        fig, axes = plt.subplots(1, 3, figsize=(14, 4))
        axes[0].imshow(attn[i, :Tx, :Ty], aspect="auto", origin="lower",
                       interpolation="nearest")
        axes[0].set_title("MAS alignment (text x mel)")
        axes[1].imshow(np.asarray(b0["y"][i]).T[:, :Ty], aspect="auto",
                       origin="lower")
        axes[1].set_title("target mel (normalized)")
        gen = np.asarray(out["decoder_outputs"][i])[:, :Ty]
        axes[2].imshow(gen, aspect="auto", origin="lower")
        axes[2].set_title("generated mel (10 Euler steps)")
        fig.tight_layout()
        fig.savefig(os.path.join(OUT_DIR, f"alignment_mel_{i}.png"), dpi=120)

    # diagonal-ness of the alignment: mean monotone path coverage
    diag_score = []
    for i in range(attn.shape[0]):
        Tx, Ty = int(b0["x_lengths"][i]), int(b0["y_lengths"][i])
        path = attn[i, :Tx, :Ty].argmax(axis=0)
        diag_score.append(float((np.diff(path) >= 0).mean()))
    summary = {
        "steps": n_steps, "wall_s": round(wall, 1),
        "ms_per_step": round(wall / n_steps * 1e3, 1),
        "loss_first": h[0, 1], "loss_final": h[-1, 1],
        "dur_final": h[-1, 2], "diff_final": h[-1, 3], "prior_final": h[-1, 4],
        # the prior loss is -log N(y; mu, I)/dims: even a PERFECT mu == y
        # scores 0.5*log(2*pi) per dim — "near zero" means dur -> ~0,
        # prior -> this floor, diff (CFM regression) -> small
        "prior_analytic_floor": round(0.5 * float(np.log(2 * np.pi)), 4),
        "diff_first": h[0, 3],
        "alignment_monotone_fraction": diag_score,
        "eval_losses": {"dur": float(dur_loss), "prior": float(prior),
                        "diff": float(diff_loss)},
        "device": "TPU v5e-lite (tunnel)",
    }
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    print("wrote", OUT_DIR)


if __name__ == "__main__":
    main()
