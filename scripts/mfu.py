"""MFU / roofline accounting for the headline stages (PERFORMANCE.md).

For each hot compiled graph this prints FLOPs and HBM bytes (XLA's own
cost analysis of the optimized executable), measured steady-state time on
the attached TPU, achieved TFLOP/s and GB/s, their fraction of the v5e
peaks, and the roofline verdict (compute- vs bandwidth-bound from the
arithmetic intensity vs the machine balance point).

Stages (the BENCH protocol's components):
  * train_step        flagship CFM training step, B=32 bucket
  * encode            text encoder + duration predictor, B=1, T_x=128
  * decode_10step     CFM Euler x10 (the U-Net hot loop), B=1, T_y=448
  * vocode_B1_448     HiFi-GAN + denoiser at the latency shape
  * vocode_B8_1024    HiFi-GAN + denoiser at the throughput shape

Timing: K dispatches queued back-to-back with varied inputs, ONE result
fetch (block_until_ready can return early through the tunnel; identical
repeated calls can be deduped — both pitfalls documented in BENCH notes).

Usage:  python scripts/mfu.py [--steps K] [--json out.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (v5 lite) public peaks: 197 TFLOP/s bf16 (MXU; f32 inputs run
# through the same MXU passes at the same rate class), 819 GB/s HBM.
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9
BALANCE = PEAK_FLOPS / PEAK_BYTES  # ~240 flops/byte


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _timing import cost_of, timeit_dispatch as timeit  # noqa: E402


def row(name, flops, byts, secs):
    tf = flops / secs / 1e12
    gb = byts / secs / 1e9
    intensity = flops / max(byts, 1.0)
    bound = "compute" if intensity >= BALANCE else "bandwidth"
    # achievable peak under the roofline for this intensity
    roof = min(PEAK_FLOPS, intensity * PEAK_BYTES)
    return {
        "stage": name,
        "gflops": round(flops / 1e9, 2),
        "mbytes": round(byts / 1e6, 1),
        "time_ms": round(secs * 1e3, 2),
        "tflops_s": round(tf, 2),
        "mfu_pct": round(100 * flops / secs / PEAK_FLOPS, 2),
        "hbm_gb_s": round(gb, 1),
        "hbm_pct": round(100 * gb * 1e9 / PEAK_BYTES, 1),
        "intensity": round(intensity, 1),
        "bound": bound,
        "roofline_pct": round(100 * flops / secs / roof, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
    from bench import build_pipeline
    from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step

    print(f"# devices: {jax.devices()}", flush=True)
    pipeline = build_pipeline()
    model, params = pipeline.model, pipeline.params
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    rows = []

    # ---- train step (flagship training protocol shape) -------------------
    B, Tx, Ty = 32, 384, 832
    batch = {
        "x": jnp.asarray(rng.integers(1, 178, size=(B, Tx)).astype(np.int32)),
        "x_lengths": jnp.asarray(rng.integers(Tx // 2, Tx + 1, size=B).astype(np.int32)),
        "y": jnp.asarray(rng.normal(size=(B, Ty, 80)).astype(np.float32)),
        "y_lengths": jnp.asarray(rng.integers(Ty // 2, Ty + 1, size=B).astype(np.int32)),
        "spks": None,
    }
    tx = make_optimizer()
    # the jitted step donates its input state: give it a COPY of the
    # params so the serving pipeline's buffers survive the timing loop
    params_t = jax.tree.map(jnp.array, params)
    state = TrainState(step=jnp.asarray(0), params=params_t,
                       opt_state=tx.init(jax.device_get(params_t)))
    step = make_train_step(model, tx)
    lowered = jax.jit(lambda s, b, k: step(s, b, k)).lower(state, batch, key)
    flops, byts = cost_of(lowered.compile())
    state, m = step(state, batch, key)  # warm (the persistent cache makes this fast)
    float(m["loss"])

    keys_t = list(jax.random.split(key, 2 * args.steps))
    jax.block_until_ready(keys_t)

    def disp_train(i):
        nonlocal state
        state, mm = step(state, batch, keys_t[i])
        return mm["loss"]

    secs = timeit(disp_train, lambda o: float(o), args.steps)
    rows.append(row(f"train_step B={B} ({Tx}x{Ty})", flops, byts, secs))
    print(json.dumps(rows[-1]), flush=True)

    # ---- encode (B=1, Tx=128) --------------------------------------------
    x = np.zeros((1, 128), np.int32)
    x[0, :110] = rng.integers(1, 178, size=110)
    xl = jnp.asarray([110], jnp.int32)
    xj = jnp.asarray(x)
    enc = pipeline._encode_fn(128, 3.5)
    flops, byts = cost_of(enc.lower(params, xj, xl, None).compile())
    mu_x, w_ceil, y_lengths = enc(params, xj, xl, None)
    float(y_lengths[0])

    xs_enc = [jnp.asarray((x + i) % 178) for i in range(2 * args.steps)]
    jax.block_until_ready(xs_enc)

    def disp_enc(i):
        return enc(params, xs_enc[i], xl, None)[2]

    secs = timeit(disp_enc, lambda o: float(o[0]), args.steps)
    rows.append(row("encode B=1 Tx=128", flops, byts, secs))
    print(json.dumps(rows[-1]), flush=True)

    # ---- decode, 10 Euler steps (B=1, Ty=448 latency bucket) -------------
    dec = pipeline._decode_fn(128, 448, 10, 0.667)
    flops, byts = cost_of(
        dec.lower(params, mu_x, w_ceil, xl, y_lengths, key, spks=None).compile())
    out = dec(params, mu_x, w_ceil, xl, y_lengths, key, spks=None)
    float(out["mel"][0, 0, 0])

    keys_d = list(jax.random.split(jax.random.fold_in(key, 7), 2 * args.steps))
    jax.block_until_ready(keys_d)

    def disp_dec(i):
        return dec(params, mu_x, w_ceil, xl, y_lengths, keys_d[i], spks=None)

    secs = timeit(disp_dec, lambda o: float(o["mel"][0, 0, 0]), args.steps)
    rows.append(row("decode 10xEuler B=1 Ty=448", flops, byts, secs))
    print(json.dumps(rows[-1]), flush=True)
    mel448 = jnp.swapaxes(out["mel"], 1, 2)

    # ---- vocoder + denoiser ----------------------------------------------
    voc = pipeline._vocode_fn()
    for label, mel in (
        ("vocode B=1 Ty=448", mel448),
        ("vocode B=8 Ty=1024",
         jnp.asarray(rng.normal(size=(8, 1024, 80)).astype(np.float32) - 6.0)),
    ):
        s = jnp.float32(pipeline.denoiser_strength)
        flops, byts = cost_of(voc.lower(pipeline.vocoder_params, mel, s).compile())
        wav = voc(pipeline.vocoder_params, mel, s)
        float(wav[0, 0])

        mels = [mel + jnp.float32(i) * 1e-6 for i in range(2 * args.steps)]
        jax.block_until_ready(mels)

        def disp_voc(i, mels=mels, s=s):
            return voc(pipeline.vocoder_params, mels[i], s)

        secs = timeit(disp_voc, lambda o: float(o[0, 0]), args.steps)
        rows.append(row(label, flops, byts, secs))
        print(json.dumps(rows[-1]), flush=True)

    # ---- markdown table ---------------------------------------------------
    cols = ["stage", "gflops", "mbytes", "time_ms", "tflops_s", "mfu_pct",
            "hbm_gb_s", "hbm_pct", "intensity", "bound", "roofline_pct"]
    print("\n| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r[c]) for c in cols) + " |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
