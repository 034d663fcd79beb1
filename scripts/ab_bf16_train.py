"""500-step f32 vs bf16-mixed training A/B on the attached TPU.

VERDICT r3 item 5: settle `precision: bf16-mixed` as the training default
or record the counter-evidence. Runs the flagship-scale train step (same
shapes as scripts/bench_train_step.py) for 500 steps in BOTH precisions
from identical init/data/keys, records the loss curves + steady step
time, and prints a JSON verdict. Loss-curve equivalence = the smoothed
total-loss curves stay within a few percent of each other (bf16 rounding
is a different but equally valid trajectory; what must match is the
learning DYNAMICS, not bitwise values).

Run: python scripts/ab_bf16_train.py [steps=500]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from matcha_tpu.models import MatchaTTS
    from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step
    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    B, Tx, Ty = 32, 384, 832
    rng = np.random.default_rng(0)
    model = MatchaTTS()

    # 4 fixed synthetic batches cycled (identical data stream both arms);
    # mel targets get low-rank structure so diff/prior losses have
    # something learnable, not just noise floor
    basis = rng.normal(size=(8, 80)).astype(np.float32)
    batches = []
    for b in range(4):
        coef = rng.normal(size=(B, Ty, 8)).astype(np.float32) * 0.5
        batches.append({
            "x": jnp.asarray(rng.integers(1, 178, size=(B, Tx)).astype(np.int32)),
            "x_lengths": jnp.asarray(rng.integers(Tx // 2, Tx + 1, size=B).astype(np.int32)),
            "y": jnp.asarray(coef @ basis),
            "y_lengths": jnp.asarray(rng.integers(Ty // 2, Ty + 1, size=B).astype(np.int32)),
            "spks": None,
        })

    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batches[0]["x"][:2], batches[0]["x_lengths"][:2],
        batches[0]["y"][:2], batches[0]["y_lengths"][:2], jax.random.PRNGKey(1))

    curves, times = {}, {}
    for precision in ("f32", "bf16-mixed"):
        tx = make_optimizer()
        state = TrainState(step=jnp.asarray(0), params=params,
                           opt_state=tx.init(params))
        step = make_train_step(model, tx, precision=precision)
        key = jax.random.PRNGKey(7)
        t0 = time.time()
        state, m = step(state, batches[0], key)
        float(m["loss"])
        print(f"[{precision}] compile+first step {time.time()-t0:.1f}s", flush=True)
        hist = []
        t0 = time.time()
        for i in range(n_steps):
            state, m = step(state, batches[i % 4], jax.random.fold_in(key, i))
            if i % 10 == 9:
                hist.append((i + 1, float(m["loss"]), float(m["dur_loss"]),
                             float(m["diff_loss"]), float(m["prior_loss"])))
        wall = time.time() - t0
        times[precision] = wall / n_steps * 1e3
        curves[precision] = hist
        print(f"[{precision}] {n_steps} steps in {wall:.1f}s "
              f"({times[precision]:.1f} ms/step), final loss {hist[-1][1]:.4f}",
              flush=True)

    # smoothed-curve divergence over the second half (past warm-in noise)
    f = np.asarray([h[1] for h in curves["f32"]])
    b = np.asarray([h[1] for h in curves["bf16-mixed"]])
    half = len(f) // 2
    k = np.ones(5) / 5

    def smooth(a):
        return np.convolve(a, k, mode="valid")

    sf, sb = smooth(f[half:]), smooth(b[half:])
    rel = float(np.max(np.abs(sf - sb) / np.maximum(np.abs(sf), 1e-6)))
    verdict = {
        "steps": n_steps,
        "ms_per_step": {k2: round(v, 2) for k2, v in times.items()},
        "final_loss": {"f32": curves["f32"][-1][1],
                       "bf16-mixed": curves["bf16-mixed"][-1][1]},
        "smoothed_rel_divergence_2nd_half": round(rel, 4),
        "equivalent": rel < 0.05,
        "curves": {k2: v for k2, v in curves.items()},
    }
    print(json.dumps({k2: v for k2, v in verdict.items() if k2 != "curves"}))
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "logs", "ab_bf16_train.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fjson:
        json.dump(verdict, fjson, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
