"""Conformer block torch-parity (VERDICT r3 item 6).

The conformer is the reference decoder's optional block type
(/root/reference/matcha/models/components/decoder.py:161-198
``ConformerWrapper``, :318 ``get_block``); its conv module uses torch
``BatchNorm1d``, which our default flax block replaces with a stateless
GroupNorm (documented divergence). These tests pin the torch-faithful
``use_batch_norm`` mode and the checkpoint conversion rule, so a conformer
checkpoint COULD convert:

1. the reference's real ConformerWrapper (driven through
   tests/reference_loader.py, whose ``conformer`` slice replicates the
   lucidrains package incl. its state_dict key layout) vs our
   ConformerBlock(use_batch_norm=True) at converted weights with
   randomized BatchNorm running stats;
2. a full Decoder with all three stages set to "conformer", converted via
   ``convert_matcha_state_dict`` (which emits the ``batch_stats``
   collection) through MatchaTTS, versus the reference Decoder.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os  # noqa: E402

if not os.path.exists("/root/reference/matcha/models/components/decoder.py"):
    pytest.skip("reference repository not available", allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from tests.reference_loader import load_reference_models  # noqa: E402
from tests.test_convert import TINY, synthetic_matcha_state_dict  # noqa: E402

from matcha_tpu.models import MatchaTTS  # noqa: E402
from matcha_tpu.models.components.conformer import ConformerBlock  # noqa: E402
from matcha_tpu.utils.checkpoints import (  # noqa: E402
    _convert_conformer_block,
    convert_matcha_state_dict,
)


@pytest.fixture(scope="module")
def ref():
    return load_reference_models()


@pytest.fixture()
def rng():
    return np.random.default_rng(11)


def _randomize_bn_stats(module, rng):
    """Fresh BatchNorm running stats are (0, 1) — identity-ish; randomize
    them so the parity test actually exercises the running-stats math."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(size=m.running_mean.shape).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                (np.abs(rng.normal(size=m.running_var.shape)) + 0.5).astype(np.float32)))


def test_conformer_wrapper_matches_reference(ref, rng):
    """Reference ConformerWrapper (decoder.py:161-198) == our flax
    ConformerBlock(use_batch_norm=True) at converted weights."""
    dim, heads, dim_head = 32, 2, 16
    wrapper = ref.decoder.ConformerWrapper(
        dim=dim, dim_head=dim_head, heads=heads, ff_mult=1,
        conv_expansion_factor=2, conv_kernel_size=31,
        attn_dropout=0.0, ff_dropout=0.0, conv_dropout=0.0)
    with torch.no_grad():
        _randomize_bn_stats(wrapper, rng)
    wrapper.eval()

    sd = {f"blk.{k}": v for k, v in wrapper.state_dict().items()}
    out, bstats = {}, {}
    _convert_conformer_block(sd, "blk", out, bstats, "blk")
    variables = {"params": out["blk"], "batch_stats": bstats["blk"]}

    B, T = 2, 24
    x = rng.normal(size=(B, T, dim)).astype(np.float32)
    lengths = np.array([T, T - 7])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)

    with torch.no_grad():
        # ConformerWrapper.forward(hidden_states, attention_mask) ->
        # super().forward(x, mask.bool())  (decoder.py:189-198)
        out_ref = wrapper(
            hidden_states=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask)).numpy()

    block = ConformerBlock(dim, heads=heads, dim_head=dim_head, ff_mult=1,
                           use_batch_norm=True)
    out_j = np.asarray(block.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                                   deterministic=True))
    # compare at valid positions (our block masks its output; the reference
    # leaves padded rows unmasked until the surrounding U-Net does)
    m = mask[..., None]
    np.testing.assert_allclose(out_j * m, out_ref * m, atol=2e-4)


def test_decoder_all_conformer_matches_reference(ref, rng):
    """Full U-Net with down/mid/up blocks all 'conformer': the reference
    Decoder is the oracle; weights flow through convert_matcha_state_dict
    (incl. the batch_stats collection) into MatchaTTS."""
    nf = TINY["n_feats"]
    ref_dec = ref.decoder.Decoder(
        in_channels=2 * nf, out_channels=nf,
        channels=TINY["dec_channels"], dropout=0.05,
        attention_head_dim=TINY["dec_attention_head_dim"], n_blocks=1,
        num_mid_blocks=TINY["dec_num_mid_blocks"],
        num_heads=TINY["dec_num_heads"], act_fn="snakebeta",
        down_block_type="conformer", mid_block_type="conformer",
        up_block_type="conformer")
    with torch.no_grad():
        _randomize_bn_stats(ref_dec, rng)
    ref_dec.eval()

    # graft the conformer decoder into a synthetic full-model state dict
    sd = {k: v for k, v in synthetic_matcha_state_dict(rng, TINY).items()
          if not k.startswith("decoder.estimator.")}
    sd.update({f"decoder.estimator.{k}": v for k, v in ref_dec.state_dict().items()})

    variables = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])
    assert "batch_stats" in variables, "conformer conversion must emit running stats"

    B, T = 2, 16
    x = rng.normal(size=(B, nf, T)).astype(np.float32)
    mu = rng.normal(size=(B, nf, T)).astype(np.float32)
    t = rng.uniform(size=(B,)).astype(np.float32)
    lengths = np.array([T, T - 5])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)

    with torch.no_grad():
        out_ref = ref_dec(
            torch.from_numpy(x), torch.from_numpy(mask[:, None, :]),
            torch.from_numpy(mu), torch.from_numpy(t)).numpy()

    model = MatchaTTS(**TINY, dec_down_block_type="conformer",
                      dec_mid_block_type="conformer",
                      dec_up_block_type="conformer",
                      dec_conformer_batch_norm=True)
    out_j = model.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask[..., None]),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t), None,
        method=lambda mdl, xx, mm, uu, tt, ss: mdl.decoder(
            xx, mm, uu, tt, ss, deterministic=True),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 2, 1), out_ref, atol=5e-4)
