"""Run a serialized synthesis artifact (the onnx/infer analog).

Loads a jax.export StableHLO artifact produced by
``matcha_tpu.deploy.export`` and synthesizes a line-per-utterance text
file, reporting RTF with the reference's formula
(matcha/onnx/infer.py:53-63) and writing wav (embedded vocoder) or
mel npy+png outputs (onnx/infer.py:24-82).
"""

import argparse
import os
import time

import numpy as np

from matcha_tpu.cli import load_matcha, process_text
from matcha_tpu.utils.utils import save_plot, write_wav


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Inference from a serialized Matcha-TPU artifact")
    parser.add_argument("artifact", type=str, help=".mx artifact from matcha_tpu.deploy.export")
    parser.add_argument("checkpoint_path", type=str, help="checkpoint providing the params pytree")
    parser.add_argument("--text", type=str, default=None)
    parser.add_argument("--file", type=str, default=None)
    parser.add_argument("--temperature", type=float, default=0.667)
    parser.add_argument("--speaking-rate", type=float, default=1.0)
    parser.add_argument("--output-dir", type=str, default=os.getcwd())
    parser.add_argument("--cleaner", type=str, default="english_cleaners2")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args(argv)
    assert args.text or args.file, "provide --text or --file"

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(args.artifact, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    _, params = load_matcha("infer", args.checkpoint_path)

    texts = [args.text] if args.text else [l.strip() for l in open(args.file, encoding="utf-8") if l.strip()]
    os.makedirs(args.output_dir, exist_ok=True)

    # artifact input spec: (params, x[B,Tx], x_lengths, scales, key)
    x_spec = exported.in_avals[len(jax.tree.leaves(params))]
    # in_avals is flattened; recover (B, T_x) from the first non-param aval
    B, T_x = x_spec.shape

    rtfs = []
    for i, text in enumerate(texts):
        tp = process_text(i, text, args.cleaner)
        ids = tp["x"][0][:T_x]
        x = np.zeros((B, T_x), np.int32)
        x[0, : len(ids)] = ids
        x_lengths = np.zeros((B,), np.int32)
        x_lengths[0] = len(ids)
        scales = np.asarray([args.temperature, args.speaking_rate], np.float32)
        key = jax.random.PRNGKey(args.seed + i)

        t0 = time.perf_counter()
        out, out_lengths = exported.call(params, jnp.asarray(x), jnp.asarray(x_lengths), jnp.asarray(scales), key)
        out = np.asarray(out)
        n = int(np.asarray(out_lengths)[0])
        t = time.perf_counter() - t0

        if out.ndim == 2:  # embedded vocoder -> waveform (B, T)
            wav = out[0][:n]
            rtf = t * 22050 / max(len(wav), 1)
            write_wav(os.path.join(args.output_dir, f"output_{i+1}.wav"), wav)
        else:  # mel (B, n_feats, T)
            mel = out[0][:, :n]
            rtf = t * 22050 / max(n * 256, 1)
            np.save(os.path.join(args.output_dir, f"output_{i+1}.npy"), mel)
            save_plot(mel, os.path.join(args.output_dir, f"output_{i+1}.png"))
        rtfs.append(rtf)
        print(f"[🍵-{i+1}] RTF: {rtf:.4f}")

    print(f"[🍵] Average RTF: {np.mean(rtfs):.4f} ± {np.std(rtfs):.4f}")


if __name__ == "__main__":
    main()
