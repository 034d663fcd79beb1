"""Is the corpus serving protocol host-dispatch-bound or device-bound?

The timed bench loop (bench.py run_batched) never fetches payloads: every
stage dispatch queues asynchronously and ONE final scalar fetch drains the
chain. Therefore
  wall = max(host dispatch time, device time) + drain tail,
and comparing loop-exit time (all work queued) against total wall tells us
which side is the bottleneck:

  * loop_exit ~= wall      -> HOST-bound: the device finishes each batch
                              before the host can queue the next; cutting
                              per-batch dispatches/eager ops wins directly.
  * loop_exit << wall      -> DEVICE-bound: host queues far ahead; only
                              device-time optimizations move the headline.

Also breaks host time down by call site (asarray/encode/decode/vocode/
eager-accounting) to rank dispatch-reduction targets.

Usage: python scripts/profile_corpus.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import BATCH, LENGTH_SCALE, N_STEPS, TEMPERATURE, build_pipeline, make_corpus

    print(f"# devices: {jax.devices()}", flush=True)
    pipeline = build_pipeline()
    rng = np.random.default_rng(0)
    utts = make_corpus(rng)
    key = jax.random.PRNGKey(0)

    def sweep(k, fuse):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        n = 0
        for _chunk, out in pipeline.synthesise_corpus(
            utts, k, n_timesteps=N_STEPS, temperature=TEMPERATURE,
            length_scale=LENGTH_SCALE, batch_size=BATCH, fuse_stages=fuse,
        ):
            fs = out.get("first_sample")
            acc = acc + (fs if fs is not None else out["waveform"][0, 0])
            n += 1
        t_loop = time.perf_counter() - t0
        float(acc)
        t_wall = time.perf_counter() - t0
        return t_loop, t_wall, n

    for fuse in (False, True):
        sweep(key, fuse)  # warmup compiles
        for trial in range(3):
            t_loop, t_wall, n = sweep(jax.random.fold_in(key, trial + 1), fuse)
            print(
                f"fuse={fuse} trial {trial}: loop_exit {t_loop*1e3:.0f} ms, "
                f"wall {t_wall*1e3:.0f} ms, host_fraction {t_loop/t_wall:.2f}, "
                f"batches {n}, drain_tail {1e3*(t_wall-t_loop):.0f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
