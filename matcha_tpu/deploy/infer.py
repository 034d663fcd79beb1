"""Run a serialized synthesis artifact (the onnx/infer analog).

Loads a jax.export StableHLO artifact produced by
``matcha_tpu.deploy.export`` and synthesizes a line-per-utterance text
file. Parity with the reference ONNX runner (matcha/onnx/infer.py):

* multiple lines are padded into the artifact's batch dimension and run
  in batches of B (onnx/infer.py:136-146);
* three output modes (onnx/infer.py:75-82,155-164):
  - embedded vocoder  -> wavs (artifact exported with --vocoder-name),
  - EXTERNAL vocoder  -> mel artifact + a separately loaded HiFi-GAN
    (``--vocoder-name/--vocoder-checkpoint-path``) vocodes the mels,
  - no vocoder        -> mel .npy + .png;
* RTF reported per batch with the reference's formula (onnx/infer.py:53-63).
"""

import argparse
import os
import time

import numpy as np

from matcha_tpu.cli import load_matcha, process_text
from matcha_tpu.utils.utils import save_plot, write_wav


def write_wav_outputs(wavs, lengths, indices, output_dir):
    for row, idx in enumerate(indices):
        n = int(lengths[row])
        write_wav(os.path.join(output_dir, f"output_{idx + 1}.wav"), wavs[row][:n])


def write_mel_outputs(mels, lengths, indices, output_dir):
    for row, idx in enumerate(indices):
        n = int(lengths[row])
        mel = mels[row][:, :n]
        np.save(os.path.join(output_dir, f"output_{idx + 1}.npy"), mel)
        save_plot(mel, os.path.join(output_dir, f"output_{idx + 1}.png"))


def main(argv=None) -> None:
    from matcha_tpu.utils.utils import enable_compilation_cache

    enable_compilation_cache()
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
    parser.add_argument("--vocoder-name", type=str, default=None,
                        choices=["hifigan_T2_v1", "hifigan_univ_v1"],
                        help="EXTERNAL vocoder for mel artifacts (onnx/infer.py:155-164 analog)")
    parser.add_argument("--vocoder-checkpoint-path", type=str, default=None)
    args = parser.parse_args(argv)
    assert args.text or args.file, "provide --text or --file"

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(args.artifact, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))

    _, params = load_matcha("infer", args.checkpoint_path)

    external_vocode = None
    if args.vocoder_name or args.vocoder_checkpoint_path:
        from matcha_tpu.cli import load_vocoder

        vocoder, voc_params, _ = load_vocoder(
            args.vocoder_name or "hifigan_univ_v1", args.vocoder_checkpoint_path
        )
        voc_jit = jax.jit(vocoder.apply)

        def external_vocode(mel):  # (B, n_feats, T) -> (B, T*256)
            wav = voc_jit(voc_params, jnp.swapaxes(jnp.asarray(mel), 1, 2))[..., 0]
            return np.asarray(jnp.clip(wav, -1.0, 1.0))

    texts = [args.text] if args.text else [l.strip() for l in open(args.file, encoding="utf-8") if l.strip()]
    os.makedirs(args.output_dir, exist_ok=True)

    # artifact input spec: (params, x[B,Tx], x_lengths, scales, key);
    # in_avals is flattened — the first non-param aval is x.
    x_spec = exported.in_avals[len(jax.tree.leaves(params))]
    B, T_x = x_spec.shape

    processed = [process_text(i, t, args.cleaner) for i, t in enumerate(texts)]
    scales = jnp.asarray([args.temperature, args.speaking_rate], jnp.float32)

    rtfs = []
    for start in range(0, len(processed), B):
        chunk = list(range(start, min(start + B, len(processed))))
        x = np.zeros((B, T_x), np.int32)
        x_lengths = np.zeros((B,), np.int32)
        for row, idx in enumerate(chunk):
            ids = processed[idx]["x"][0][:T_x]
            x[row, : len(ids)] = ids
            x_lengths[row] = len(ids)
        key = jax.random.PRNGKey(args.seed + start)

        t0 = time.perf_counter()
        out, out_lengths = exported.call(params, jnp.asarray(x), jnp.asarray(x_lengths), scales, key)
        out = np.asarray(out)
        out_lengths = np.asarray(out_lengths)
        t = time.perf_counter() - t0

        n_rows = len(chunk)
        if out.ndim == 2:  # embedded vocoder -> waveforms (B, T)
            audio_samples = int(out_lengths[:n_rows].sum())
            write_wav_outputs(out, out_lengths, chunk, args.output_dir)
        elif external_vocode is not None:  # mel artifact + external vocoder
            t1 = time.perf_counter()
            wavs = external_vocode(out)
            t += time.perf_counter() - t1
            wav_lengths = out_lengths * (wavs.shape[1] // out.shape[2])  # hop from the vocoder
            audio_samples = int(wav_lengths[:n_rows].sum())
            write_wav_outputs(wavs, wav_lengths, chunk, args.output_dir)
        else:  # mel npy + png
            audio_samples = int(out_lengths[:n_rows].sum()) * 256
            write_mel_outputs(out, out_lengths, chunk, args.output_dir)

        rtf = t * 22050 / max(audio_samples, 1)
        rtfs.append(rtf)
        print(f"[🍵-batch {start // B + 1}] {n_rows} utterances, RTF: {rtf:.4f}")

    print(f"[🍵] Average RTF: {np.mean(rtfs):.4f} ± {np.std(rtfs):.4f}")


if __name__ == "__main__":
    main()
