"""Parity vs the ACTUAL reference decoder / CFM / MatchaTTS modules.

Round-2 verdict: the U-Net decoder, transformer blocks and the end-to-end
``synthesise`` were only ever compared against hand-written torch twins —
a twin can encode the same misreading as the port. These tests import the
reference's own classes (tests/reference_loader.py fabricates the narrow
diffusers/conformer/lightning slices they need), load the SAME synthetic
reference-named state dict both stacks use, and assert numerical
agreement on:

1. the standalone Decoder forward (decoder.py:200-443),
2. the full ``MatchaTTS.synthesise`` with identical injected noise
   (matcha_tts.py:73-148),
3. the full training ``forward`` losses with identical injected t/z
   (matcha_tts.py:150-239).

This harness doubles as the dry-run of the real-checkpoint MCD gate
(BASELINE.json): swap the synthetic state dict for a downloaded one and
the same assertions apply.
"""

import functools
from types import SimpleNamespace as NS

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os  # noqa: E402

if not os.path.exists("/root/reference/matcha/models/matcha_tts.py"):
    pytest.skip("reference repository not available", allow_module_level=True)

from tests.reference_loader import load_reference_models  # noqa: E402
from tests.test_convert import TINY, synthetic_matcha_state_dict  # noqa: E402

from matcha_tpu.models import MatchaTTS  # noqa: E402
from matcha_tpu.utils.checkpoints import convert_matcha_state_dict  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    return load_reference_models()


def _ref_matcha(ref, sd):
    """Construct the reference MatchaTTS at the TINY config and load sd."""
    enc_cfg = NS(
        encoder_type="RoPE Encoder",
        encoder_params=NS(
            n_feats=TINY["n_feats"], n_channels=TINY["enc_n_channels"],
            filter_channels=TINY["enc_filter_channels"],
            filter_channels_dp=TINY["enc_filter_channels_dp"],
            n_heads=TINY["enc_n_heads"], n_layers=TINY["enc_n_layers"],
            kernel_size=3, p_dropout=0.1, prenet=True,
        ),
        duration_predictor_params=NS(
            filter_channels_dp=TINY["enc_filter_channels_dp"],
            kernel_size=3, p_dropout=0.1,
        ),
    )
    dec_cfg = {
        "channels": list(TINY["dec_channels"]), "dropout": 0.05,
        "attention_head_dim": TINY["dec_attention_head_dim"], "n_blocks": 1,
        "num_mid_blocks": TINY["dec_num_mid_blocks"],
        "num_heads": TINY["dec_num_heads"], "act_fn": "snakebeta",
    }
    cfm_cfg = NS(name="CFM", solver="euler", sigma_min=1e-4)
    model = ref.matcha_tts.MatchaTTS(
        n_vocab=TINY["n_vocab"], n_spks=1, spk_emb_dim=64,
        n_feats=TINY["n_feats"], encoder=enc_cfg, decoder=dec_cfg,
        cfm=cfm_cfg, data_statistics={"mel_mean": -5.5, "mel_std": 2.1},
        out_size=None,
    )
    model.load_state_dict(sd, strict=True)
    model.eval()
    return model


def test_decoder_forward_matches_reference(ref, rng):
    """The reference's own Decoder class is the oracle for the U-Net."""
    sd = synthetic_matcha_state_dict(rng)
    dec_sd = {k[len("decoder.estimator."):]: v for k, v in sd.items()
              if k.startswith("decoder.estimator.")}
    nf = TINY["n_feats"]
    ref_dec = ref.decoder.Decoder(
        in_channels=2 * nf, out_channels=nf,
        channels=TINY["dec_channels"], dropout=0.05,
        attention_head_dim=TINY["dec_attention_head_dim"], n_blocks=1,
        num_mid_blocks=TINY["dec_num_mid_blocks"],
        num_heads=TINY["dec_num_heads"], act_fn="snakebeta",
    )
    ref_dec.load_state_dict(dec_sd, strict=True)
    ref_dec.eval()

    B, T = 2, 16  # multiple of 2**n_downsamples
    x = rng.normal(size=(B, nf, T)).astype(np.float32)
    mu = rng.normal(size=(B, nf, T)).astype(np.float32)
    t = rng.uniform(size=(B,)).astype(np.float32)
    lengths = np.array([T, T - 5])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)

    with torch.no_grad():
        out_ref = ref_dec(
            torch.from_numpy(x), torch.from_numpy(mask[:, None, :]),
            torch.from_numpy(mu), torch.from_numpy(t)).numpy()

    params = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])
    model = MatchaTTS(**TINY)
    out_j = model.apply(
        params,
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask[..., None]),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t), None,
        method=lambda mdl, xx, mm, uu, tt, ss: mdl.decoder(
            xx, mm, uu, tt, ss, deterministic=True),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 2, 1), out_ref, atol=3e-4)

@pytest.mark.slow
def test_synthesise_end_to_end_matches_reference(ref, rng, monkeypatch):
    """Full text->mel parity: the reference MatchaTTS.synthesise (run with
    OUR jax-drawn terminal noise injected via torch.randn_like) must match
    our fused synthesise() at the same static mel length."""
    sd = synthetic_matcha_state_dict(rng)
    ref_model = _ref_matcha(ref, sd)

    B, T_x = 2, 14
    n_timesteps, temperature, length_scale = 4, 0.667, 1.0  # exact fp t_span
    x_ids = rng.integers(1, TINY["n_vocab"], size=(B, T_x)).astype(np.int64)
    x_lengths = np.array([T_x, T_x - 5], dtype=np.int64)

    params = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])
    model = MatchaTTS(**TINY, mel_mean=-5.5, mel_std=2.1)  # sd's data stats

    # Predict the reference's dynamic padded length (fix_len_compatibility
    # of max y_length) so our static bucket matches it exactly — the
    # additive-mask attention makes valid frames depend on padded length.
    _, w_ceil, y_lengths = model.apply(
        params, jnp.asarray(x_ids, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        method=MatchaTTS.encode)
    y_max = int(np.max(np.asarray(y_lengths)))
    y_max_pad = int(ref.model_utils.fix_len_compatibility(torch.tensor(y_max)))

    # OUR noise draw, replayed into the reference via torch.randn_like.
    key = jax.random.PRNGKey(42)
    z = jax.random.normal(key, (B, y_max_pad, TINY["n_feats"]), jnp.float32)
    z_cf = torch.from_numpy(np.asarray(z).transpose(0, 2, 1).copy())
    monkeypatch.setattr(torch, "randn_like", lambda mu: z_cf.to(mu.dtype))

    with torch.no_grad():
        out_ref = ref_model.synthesise(
            torch.from_numpy(x_ids), torch.from_numpy(x_lengths),
            n_timesteps=n_timesteps, temperature=temperature,
            length_scale=length_scale)

    out_j = jax.jit(functools.partial(
        model.apply, method=MatchaTTS.synthesise, n_timesteps=n_timesteps,
        temperature=temperature, length_scale=length_scale,
        y_max_length=y_max_pad))(
        params, jnp.asarray(x_ids, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        key)

    np.testing.assert_array_equal(
        np.asarray(out_j["mel_lengths"]), out_ref["mel_lengths"].numpy())
    # reference slices outputs to the unpadded max length
    assert out_ref["mel"].shape[-1] == y_max
    np.testing.assert_allclose(
        np.asarray(out_j["attn"])[:, :, :y_max],
        out_ref["attn"].squeeze(1).numpy()[:, :, :y_max], atol=0)
    np.testing.assert_allclose(
        np.asarray(out_j["encoder_outputs"])[:, :, :y_max],
        out_ref["encoder_outputs"].numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["decoder_outputs"])[:, :, :y_max],
        out_ref["decoder_outputs"].numpy(), atol=6e-4)
    np.testing.assert_allclose(
        np.asarray(out_j["mel"])[:, :, :y_max],
        out_ref["mel"].numpy(), atol=2e-3)  # denormalize scales by mel_std

@pytest.mark.slow
def test_training_forward_matches_reference(ref, rng, monkeypatch):
    """dur/prior/diff losses vs the reference training forward, with OUR
    jax-drawn CFM timestep/noise replayed into torch.rand/randn_like."""
    sd = synthetic_matcha_state_dict(rng)
    ref_model = _ref_matcha(ref, sd)

    B, T_x, T_y = 2, 12, 32
    nf = TINY["n_feats"]
    x_ids = rng.integers(1, TINY["n_vocab"], size=(B, T_x)).astype(np.int64)
    x_lengths = np.array([T_x, T_x - 4], dtype=np.int64)
    y = rng.normal(size=(B, T_y, nf)).astype(np.float32)
    y_lengths = np.array([T_y, T_y - 9], dtype=np.int64)
    # zero padded frames like the collate does (MAS sees masked grids, but
    # the CFM loss sums the full tensor — padding must agree across stacks)
    y[1, T_y - 9:] = 0.0

    key = jax.random.PRNGKey(7)
    k_t, k_z = jax.random.split(key)  # mirrors cfm_loss's internal split
    t_np = np.asarray(jax.random.uniform(k_t, (B, 1, 1), jnp.float32))
    z_np = np.asarray(jax.random.normal(k_z, (B, T_y, nf), jnp.float32))
    monkeypatch.setattr(
        torch, "rand", lambda *a, **k: torch.from_numpy(t_np.copy()))
    monkeypatch.setattr(
        torch, "randn_like",
        lambda x1: torch.from_numpy(z_np.transpose(0, 2, 1).copy()))

    with torch.no_grad():
        dur_r, prior_r, diff_r = ref_model(
            torch.from_numpy(x_ids), torch.from_numpy(x_lengths),
            torch.from_numpy(y.transpose(0, 2, 1).copy()),
            torch.from_numpy(y_lengths))

    params = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])
    model = MatchaTTS(**TINY)
    dur_j, prior_j, diff_j, attn = model.apply(
        params, jnp.asarray(x_ids, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        jnp.asarray(y), jnp.asarray(y_lengths, jnp.int32), key,
        method=MatchaTTS.losses)

    assert np.isfinite(np.asarray(attn)).all()
    np.testing.assert_allclose(float(dur_j), float(dur_r), atol=1e-5)
    np.testing.assert_allclose(float(prior_j), float(prior_r), atol=1e-5)
    np.testing.assert_allclose(float(diff_j), float(diff_r), atol=5e-5)
