"""Training-step microbenchmark on the attached TPU (see PERFORMANCE.md).

Completion is forced by fetching the loss — on tunnel-attached devices
block_until_ready() can return before the device finishes.
"""

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

    precision = sys.argv[1] if len(sys.argv) > 1 else "f32"
    print("precision:", precision)
    B, Tx, Ty = 32, 384, 832
    rng = np.random.default_rng(0)
    model = MatchaTTS()
    batch = {
        "x": jnp.asarray(rng.integers(1, 178, size=(B, Tx)).astype(np.int32)),
        "x_lengths": jnp.asarray(rng.integers(Tx // 2, Tx + 1, size=B).astype(np.int32)),
        "y": jnp.asarray(rng.normal(size=(B, Ty, 80)).astype(np.float32)),
        "y_lengths": jnp.asarray(rng.integers(Ty // 2, Ty + 1, size=B).astype(np.int32)),
        "spks": None,
    }
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["x"][:2], batch["x_lengths"][:2], batch["y"][:2], batch["y_lengths"][:2],
        jax.random.PRNGKey(1),
    )
    tx = make_optimizer()
    state = TrainState(step=jnp.asarray(0), params=params, opt_state=tx.init(params))
    step = make_train_step(model, tx, precision=precision)

    t0 = time.time()
    state, m = step(state, batch, jax.random.PRNGKey(2))
    print("compile+first step:", round(time.time() - t0, 1), "loss:", float(m["loss"]))

    n = 20
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(2))
    _ = float(m["loss"])  # forces the chained steps to completion
    dt = (time.time() - t0) / n
    print(f"steady train step: {dt*1000:.1f} ms  ({B/dt:.0f} utt/s, {B*Ty*256/22050/dt:.0f} audio-sec/s)")


if __name__ == "__main__":
    main()
