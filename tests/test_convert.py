"""Checkpoint-converter tests.

1. Structural: a synthetic torch state_dict with the reference's exact
   parameter names/shapes converts into a tree that matches
   ``MatchaTTS.init`` path-for-path and shape-for-shape.
2. Numerical: a tiny HiFi-GAN generator forward matches a torch twin
   (functional ops) run on the same (weight-normed) weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from matcha_tpu.models import MatchaTTS  # noqa: E402
from matcha_tpu.models.hifigan import Generator, HiFiGANConfig  # noqa: E402
from matcha_tpu.utils.checkpoints import (  # noqa: E402
    convert_hifigan_state_dict,
    convert_matcha_state_dict,
)

TINY = dict(
    n_vocab=20, n_feats=8, enc_n_channels=16, enc_filter_channels=24,
    enc_filter_channels_dp=12, enc_n_heads=2, enc_n_layers=2,
    dec_channels=(16, 16), dec_num_mid_blocks=1, dec_num_heads=1,
    dec_attention_head_dim=8,
)


def _rand(rng, *shape):
    return torch.from_numpy(rng.normal(size=shape).astype(np.float32) * 0.1)


def synthetic_matcha_state_dict(rng, cfg=TINY):
    """Reference-named state_dict for the tiny config."""
    C = cfg["enc_n_channels"]
    Fc = cfg["enc_filter_channels"]
    Fdp = cfg["enc_filter_channels_dp"]
    nf = cfg["n_feats"]
    sd = {}
    sd["mel_mean"] = torch.tensor(-5.5)
    sd["mel_std"] = torch.tensor(2.1)
    sd["encoder.emb.weight"] = _rand(rng, cfg["n_vocab"], C)
    for i in range(3):
        sd[f"encoder.prenet.conv_layers.{i}.weight"] = _rand(rng, C, C, 5)
        sd[f"encoder.prenet.conv_layers.{i}.bias"] = _rand(rng, C)
        sd[f"encoder.prenet.norm_layers.{i}.gamma"] = _rand(rng, C)
        sd[f"encoder.prenet.norm_layers.{i}.beta"] = _rand(rng, C)
    sd["encoder.prenet.proj.weight"] = _rand(rng, C, C, 1)
    sd["encoder.prenet.proj.bias"] = _rand(rng, C)
    for i in range(cfg["enc_n_layers"]):
        for nm in ("conv_q", "conv_k", "conv_v", "conv_o"):
            sd[f"encoder.encoder.attn_layers.{i}.{nm}.weight"] = _rand(rng, C, C, 1)
            sd[f"encoder.encoder.attn_layers.{i}.{nm}.bias"] = _rand(rng, C)
        for g in (1, 2):
            sd[f"encoder.encoder.norm_layers_{g}.{i}.gamma"] = _rand(rng, C)
            sd[f"encoder.encoder.norm_layers_{g}.{i}.beta"] = _rand(rng, C)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_1.weight"] = _rand(rng, Fc, C, 3)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_1.bias"] = _rand(rng, Fc)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_2.weight"] = _rand(rng, C, Fc, 3)
        sd[f"encoder.encoder.ffn_layers.{i}.conv_2.bias"] = _rand(rng, C)
    sd["encoder.proj_m.weight"] = _rand(rng, nf, C, 1)
    sd["encoder.proj_m.bias"] = _rand(rng, nf)
    sd["encoder.proj_w.conv_1.weight"] = _rand(rng, Fdp, C, 3)
    sd["encoder.proj_w.conv_1.bias"] = _rand(rng, Fdp)
    sd["encoder.proj_w.norm_1.gamma"] = _rand(rng, Fdp)
    sd["encoder.proj_w.norm_1.beta"] = _rand(rng, Fdp)
    sd["encoder.proj_w.conv_2.weight"] = _rand(rng, Fdp, Fdp, 3)
    sd["encoder.proj_w.conv_2.bias"] = _rand(rng, Fdp)
    sd["encoder.proj_w.norm_2.gamma"] = _rand(rng, Fdp)
    sd["encoder.proj_w.norm_2.beta"] = _rand(rng, Fdp)
    sd["encoder.proj_w.proj.weight"] = _rand(rng, 1, Fdp, 1)
    sd["encoder.proj_w.proj.bias"] = _rand(rng, 1)

    est = "decoder.estimator"
    chans = cfg["dec_channels"]
    in_ch = 2 * nf
    ted = chans[0] * 4
    head = cfg["dec_num_heads"] * cfg["dec_attention_head_dim"]
    ff_mult = 4
    sd[f"{est}.time_mlp.linear_1.weight"] = _rand(rng, ted, in_ch)
    sd[f"{est}.time_mlp.linear_1.bias"] = _rand(rng, ted)
    sd[f"{est}.time_mlp.linear_2.weight"] = _rand(rng, ted, ted)
    sd[f"{est}.time_mlp.linear_2.bias"] = _rand(rng, ted)

    def resnet(prefix, din, dout):
        sd[f"{prefix}.mlp.1.weight"] = _rand(rng, dout, ted)
        sd[f"{prefix}.mlp.1.bias"] = _rand(rng, dout)
        sd[f"{prefix}.block1.block.0.weight"] = _rand(rng, dout, din, 3)
        sd[f"{prefix}.block1.block.0.bias"] = _rand(rng, dout)
        sd[f"{prefix}.block1.block.1.weight"] = _rand(rng, dout)
        sd[f"{prefix}.block1.block.1.bias"] = _rand(rng, dout)
        sd[f"{prefix}.block2.block.0.weight"] = _rand(rng, dout, dout, 3)
        sd[f"{prefix}.block2.block.0.bias"] = _rand(rng, dout)
        sd[f"{prefix}.block2.block.1.weight"] = _rand(rng, dout)
        sd[f"{prefix}.block2.block.1.bias"] = _rand(rng, dout)
        sd[f"{prefix}.res_conv.weight"] = _rand(rng, dout, din, 1)
        sd[f"{prefix}.res_conv.bias"] = _rand(rng, dout)

    def tblock(prefix, dim):
        sd[f"{prefix}.norm1.weight"] = _rand(rng, dim)
        sd[f"{prefix}.norm1.bias"] = _rand(rng, dim)
        for nm in ("to_q", "to_k", "to_v"):
            sd[f"{prefix}.attn1.{nm}.weight"] = _rand(rng, head, dim)
        sd[f"{prefix}.attn1.to_out.0.weight"] = _rand(rng, dim, head)
        sd[f"{prefix}.attn1.to_out.0.bias"] = _rand(rng, dim)
        sd[f"{prefix}.norm3.weight"] = _rand(rng, dim)
        sd[f"{prefix}.norm3.bias"] = _rand(rng, dim)
        sd[f"{prefix}.ff.net.0.proj.weight"] = _rand(rng, dim * ff_mult, dim)
        sd[f"{prefix}.ff.net.0.proj.bias"] = _rand(rng, dim * ff_mult)
        sd[f"{prefix}.ff.net.0.alpha"] = _rand(rng, dim * ff_mult)
        sd[f"{prefix}.ff.net.0.beta"] = _rand(rng, dim * ff_mult)
        sd[f"{prefix}.ff.net.2.weight"] = _rand(rng, dim, dim * ff_mult)
        sd[f"{prefix}.ff.net.2.bias"] = _rand(rng, dim)

    dprev = in_ch
    for i, ch in enumerate(chans):
        resnet(f"{est}.down_blocks.{i}.0", dprev, ch)
        tblock(f"{est}.down_blocks.{i}.1.0", ch)
        if i == len(chans) - 1:
            sd[f"{est}.down_blocks.{i}.2.weight"] = _rand(rng, ch, ch, 3)
            sd[f"{est}.down_blocks.{i}.2.bias"] = _rand(rng, ch)
        else:
            sd[f"{est}.down_blocks.{i}.2.conv.weight"] = _rand(rng, ch, ch, 3)
            sd[f"{est}.down_blocks.{i}.2.conv.bias"] = _rand(rng, ch)
        dprev = ch

    for i in range(cfg["dec_num_mid_blocks"]):
        resnet(f"{est}.mid_blocks.{i}.0", chans[-1], chans[-1])
        tblock(f"{est}.mid_blocks.{i}.1.0", chans[-1])

    up = chans[::-1] + (chans[0],)
    for i in range(len(up) - 1):
        resnet(f"{est}.up_blocks.{i}.0", 2 * up[i], up[i + 1])
        tblock(f"{est}.up_blocks.{i}.1.0", up[i + 1])
        if i == len(up) - 2:
            sd[f"{est}.up_blocks.{i}.2.weight"] = _rand(rng, up[i + 1], up[i + 1], 3)
            sd[f"{est}.up_blocks.{i}.2.bias"] = _rand(rng, up[i + 1])
        else:
            sd[f"{est}.up_blocks.{i}.2.conv.weight"] = _rand(rng, up[i + 1], up[i + 1], 4)
            sd[f"{est}.up_blocks.{i}.2.conv.bias"] = _rand(rng, up[i + 1])

    sd[f"{est}.final_block.block.0.weight"] = _rand(rng, up[-1], up[-1], 3)
    sd[f"{est}.final_block.block.0.bias"] = _rand(rng, up[-1])
    sd[f"{est}.final_block.block.1.weight"] = _rand(rng, up[-1])
    sd[f"{est}.final_block.block.1.bias"] = _rand(rng, up[-1])
    sd[f"{est}.final_proj.weight"] = _rand(rng, nf, up[-1], 1)
    sd[f"{est}.final_proj.bias"] = _rand(rng, nf)
    return sd


def tree_paths_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_paths_shapes(v, p))
        else:
            out[p] = tuple(v.shape)
    return out

@pytest.mark.slow
def test_matcha_converter_structural(rng):
    sd = synthetic_matcha_state_dict(rng)
    converted = convert_matcha_state_dict(sd, n_down_blocks=2, num_mid_blocks=TINY["dec_num_mid_blocks"])

    model = MatchaTTS(**TINY)
    x = jnp.zeros((1, 8), jnp.int32)
    xl = jnp.array([8])
    y = jnp.zeros((1, 16, TINY["n_feats"]))
    yl = jnp.array([16])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, xl, y, yl, jax.random.PRNGKey(1))

    got = tree_paths_shapes(converted["params"])
    want = tree_paths_shapes(jax.tree.map(np.asarray, variables)["params"])
    missing = set(want) - set(got)
    extra = set(got) - set(want)
    assert not missing, f"converter missing params: {sorted(missing)[:10]}"
    assert not extra, f"converter produced unknown params: {sorted(extra)[:10]}"
    mismatched = {k for k in want if want[k] != got[k]}
    assert not mismatched, {k: (want[k], got[k]) for k in sorted(mismatched)[:10]}


TINY_HIFI = HiFiGANConfig(
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)),
    num_mels=6,
)


def synthetic_hifigan_state_dict(rng, h=TINY_HIFI):
    sd = {}

    def wn(prefix, out, inp, k):
        v = _rand(rng, out, inp, k)
        g = torch.abs(_rand(rng, out, 1, 1)) + 0.5
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = v
        sd[f"{prefix}.bias"] = _rand(rng, out)

    def wn_t(prefix, inp, out, k):
        v = _rand(rng, inp, out, k)
        g = torch.abs(_rand(rng, inp, 1, 1)) + 0.5
        sd[f"{prefix}.weight_g"] = g
        sd[f"{prefix}.weight_v"] = v
        sd[f"{prefix}.bias"] = _rand(rng, out)

    wn("conv_pre", h.upsample_initial_channel, h.num_mels, 7)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        cin = h.upsample_initial_channel // (2**i)
        cout = h.upsample_initial_channel // (2 ** (i + 1))
        wn_t(f"ups.{i}", cin, cout, k)
        for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
            n = i * len(h.resblock_kernel_sizes) + j
            for jj in range(len(rd)):
                wn(f"resblocks.{n}.convs1.{jj}", cout, cout, rk)
                wn(f"resblocks.{n}.convs2.{jj}", cout, cout, rk)
    last = h.upsample_initial_channel // (2 ** len(h.upsample_rates))
    wn("conv_post", 1, last, 7)
    return sd


def _torch_hifigan_forward(sd, x, h=TINY_HIFI):
    """Functional torch twin of the tiny generator (oracle)."""

    def w(prefix):
        g, v = sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"]
        norm = v.pow(2).sum(dim=tuple(range(1, v.ndim)), keepdim=True).sqrt()
        return g * v / norm

    def conv(prefix, x, padding, dilation=1):
        return F.conv1d(x, w(prefix), sd[f"{prefix}.bias"], padding=padding, dilation=dilation)

    x = conv("conv_pre", x, 3)
    nk = len(h.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
        x = F.leaky_relu(x, 0.1)
        x = F.conv_transpose1d(x, w(f"ups.{i}"), sd[f"ups.{i}.bias"], stride=u, padding=(k - u) // 2)
        xs = None
        for j, (rk, rd) in enumerate(zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)):
            n = i * nk + j
            xb = x
            for jj, d in enumerate(rd):
                xt = F.leaky_relu(xb, 0.1)
                xt = conv(f"resblocks.{n}.convs1.{jj}", xt, (rk * d - d) // 2, d)
                xt = F.leaky_relu(xt, 0.1)
                xt = conv(f"resblocks.{n}.convs2.{jj}", xt, (rk - 1) // 2)
                xb = xt + xb
            xs = xb if xs is None else xs + xb
        x = xs / nk
    x = F.leaky_relu(x)  # default slope, matching the reference quirk
    x = conv("conv_post", x, 3)
    return torch.tanh(x)


def test_hifigan_converter_numerical(rng):
    sd = synthetic_hifigan_state_dict(rng)
    mel = rng.normal(size=(2, TINY_HIFI.num_mels, 20)).astype(np.float32)

    ref = _torch_hifigan_forward(sd, torch.from_numpy(mel)).numpy()

    params = convert_hifigan_state_dict(sd)
    gen = Generator(TINY_HIFI)
    ours = np.asarray(gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
    ours = ours.transpose(0, 2, 1)  # (B, 1, T)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4)
