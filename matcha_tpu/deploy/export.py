"""Deployment export: serialize the fused synthesis graph (StableHLO).

The reference deploys via ONNX export with n_timesteps baked in at export
time and a ``scales=[temperature, length_scale]`` runtime tensor
(matcha/onnx/export.py:35-63). The TPU-native deployment unit is a
serialized jax.export artifact of the same fused graph:

* signature ``(params, x, x_lengths, scales, key) -> (mel, mel_lengths)``
  or, with ``--vocoder``, ``-> (wav, wav_lengths)`` (wav_lengths =
  mel_lengths * 256, matching MatchaWithVocoder, onnx/export.py:22-32);
* n_timesteps is baked at export (same contract as the reference);
* batch is fixed per artifact and time axes are bucket-static — export
  one artifact per bucket (the runtime picks the bucket like the CLI).

Usage: python -m matcha_tpu.deploy.export <ckpt> <output.mx> [flags]
"""

import argparse
import random

import numpy as np

DEFAULT_OPSET_NOTE = "stablehlo via jax.export"


def get_exportable_fn(model, with_vocoder=None, n_timesteps: int = 5, T_y: int = 1024):
    """Build the deployable fn: scales tensor = [temperature, length_scale]
    (reference onnx/export.py:41-53)."""
    import jax.numpy as jnp

    from matcha_tpu.models.matcha import MatchaTTS

    def fn(params, x, x_lengths, scales, key):
        temperature, length_scale = scales[0], scales[1]
        spk_emb = None
        x_mask_len = x.shape[1]
        from matcha_tpu.ops.seq import generate_path, sequence_mask

        x_mask = sequence_mask(x_lengths, x_mask_len).astype(jnp.float32)[..., None]
        mu_x, logw = model.apply(params, x, x_mask, spk_emb, method=lambda m, *a, **k: m.encoder(*a, **k))
        w = jnp.exp(logw) * x_mask
        w_ceil = jnp.ceil(w) * length_scale
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), min=1.0)
        y_lengths = jnp.minimum(y_lengths, float(T_y)).astype(jnp.int32)
        out = model.apply(
            params, mu_x, w_ceil, x_lengths, y_lengths, key,
            n_timesteps=n_timesteps, temperature=temperature, y_max_length=T_y,
            method=MatchaTTS.decode,
        )
        if with_vocoder is not None:
            vocoder, voc_params = with_vocoder
            mel_btc = jnp.swapaxes(out["mel"], 1, 2)
            wav = vocoder.apply(voc_params, mel_btc)[..., 0]
            hop = 1
            for u in vocoder.config.upsample_rates:
                hop *= int(u)
            return jnp.clip(wav, -1.0, 1.0), out["mel_lengths"] * hop
        return out["mel"], out["mel_lengths"]

    return fn


def export_graph(model, params, path: str, batch: int = 1, T_x: int = 256, T_y: int = 1024,
                 n_timesteps: int = 5, with_vocoder=None) -> None:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    fn = get_exportable_fn(model, with_vocoder, n_timesteps, T_y)
    x = jnp.zeros((batch, T_x), jnp.int32)
    x_lengths = jnp.full((batch,), T_x, jnp.int32)
    scales = jnp.asarray([0.667, 1.0], jnp.float32)
    key = jax.random.PRNGKey(0)
    exported = jexport.export(jax.jit(fn))(params, x, x_lengths, scales, key)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    print(f"[🍵] Exported {len(data)/1e6:.1f} MB StableHLO artifact to {path}")
    print(f"     signature: (params, x[{batch},{T_x}], x_lengths, scales[2], key) "
          f"n_timesteps={n_timesteps} T_y={T_y} vocoder={'yes' if with_vocoder else 'no'}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Export Matcha-TPU to a serialized StableHLO graph")
    parser.add_argument("checkpoint_path", type=str, help="Matcha checkpoint (torch .ckpt or native dir)")
    parser.add_argument("output", type=str, help="Output artifact path (.mx)")
    parser.add_argument("--vocoder-name", type=str, default=None, choices=["hifigan_T2_v1", "hifigan_univ_v1"])
    parser.add_argument("--vocoder-checkpoint-path", type=str, default=None)
    parser.add_argument("--n-timesteps", type=int, default=5, help="ODE steps baked at export (default 5, like the reference)")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--t-x", type=int, default=256, help="text bucket length")
    parser.add_argument("--t-y", type=int, default=1024, help="mel bucket length")
    args = parser.parse_args(argv)

    # Determinism note: the exported graph threads an explicit PRNG key, so
    # no global seeding is needed (reference fixes torch/cudnn seeds,
    # onnx/export.py:13-19).
    random.seed(1234)
    np.random.seed(1234)

    from matcha_tpu.cli import load_matcha

    model, params = load_matcha("export", args.checkpoint_path)

    with_vocoder = None
    if args.vocoder_name or args.vocoder_checkpoint_path:
        from matcha_tpu.cli import load_vocoder

        vocoder, voc_params, _ = load_vocoder(args.vocoder_name or "hifigan_univ_v1",
                                              args.vocoder_checkpoint_path)
        with_vocoder = (vocoder, voc_params)

    export_graph(model, params, args.output, args.batch, args.t_x, args.t_y,
                 args.n_timesteps, with_vocoder)


if __name__ == "__main__":
    main()
