"""Numerical parity of the text encoder and decoder blocks vs torch twins.

The twins are built from torch functional ops on the synthetic
reference-named state dict (tests/test_convert.py), so they exercise both
the architecture semantics (RoPE convention, channel LayerNorm eps=1e-4,
masked convs, post-norm residuals, additive decoder attention mask) and
the converter's layout transposes end to end.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from tests.test_convert import TINY, synthetic_matcha_state_dict  # noqa: E402

from matcha_tpu.models import MatchaTTS  # noqa: E402
from matcha_tpu.utils.checkpoints import convert_matcha_state_dict  # noqa: E402


def t_channel_layernorm(x, gamma, beta, eps=1e-4):
    mean = x.mean(1, keepdim=True)
    var = ((x - mean) ** 2).mean(1, keepdim=True)
    xn = (x - mean) * torch.rsqrt(var + eps)
    return xn * gamma[None, :, None] + beta[None, :, None]


def t_rope(x, d_rope):
    # x: (B, H, T, D); rotate-half convention on the first d_rope dims.
    B, H, T, D = x.shape
    x_rope, x_pass = x[..., :d_rope], x[..., d_rope:]
    half = d_rope // 2
    theta = 10000.0 ** (-torch.arange(0, half, dtype=torch.float32) / half)
    pos = torch.arange(T, dtype=torch.float32)
    ang = pos[:, None] * theta[None, :]
    cos = torch.cat([ang.cos(), ang.cos()], dim=-1)
    sin = torch.cat([ang.sin(), ang.sin()], dim=-1)
    neg_half = torch.cat([-x_rope[..., half:], x_rope[..., :half]], dim=-1)
    out = x_rope * cos[None, None] + neg_half * sin[None, None]
    return torch.cat([out, x_pass], dim=-1)


def torch_text_encoder(sd, x_ids, x_lengths, cfg=TINY):
    """Reference-architecture text encoder in torch functional ops."""
    C = cfg["enc_n_channels"]
    H = cfg["enc_n_heads"]
    B, T = x_ids.shape
    x = F.embedding(x_ids, sd["encoder.emb.weight"]) * math.sqrt(C)
    x = x.transpose(1, 2)  # (B, C, T)
    mask = (torch.arange(T)[None, :] < x_lengths[:, None]).float()[:, None, :]

    # prenet (eval: dropout off)
    x_org = x
    h = x
    for i in range(3):
        h = F.conv1d(h * mask, sd[f"encoder.prenet.conv_layers.{i}.weight"],
                     sd[f"encoder.prenet.conv_layers.{i}.bias"], padding=2)
        h = t_channel_layernorm(h, sd[f"encoder.prenet.norm_layers.{i}.gamma"],
                                sd[f"encoder.prenet.norm_layers.{i}.beta"])
        h = F.relu(h)
    x = x_org + F.conv1d(h, sd["encoder.prenet.proj.weight"], sd["encoder.prenet.proj.bias"])
    x = x * mask

    attn_mask = (mask.unsqueeze(2) * mask.unsqueeze(-1))  # (B,1,T,T)
    k_ch = C // H
    d_rope = int(k_ch * 0.5)
    for i in range(cfg["enc_n_layers"]):
        base = f"encoder.encoder.attn_layers.{i}"
        x = x * mask
        q = F.conv1d(x, sd[f"{base}.conv_q.weight"], sd[f"{base}.conv_q.bias"])
        k = F.conv1d(x, sd[f"{base}.conv_k.weight"], sd[f"{base}.conv_k.bias"])
        v = F.conv1d(x, sd[f"{base}.conv_v.weight"], sd[f"{base}.conv_v.bias"])

        def heads(t):
            return t.view(B, H, k_ch, T).transpose(2, 3)  # (B,H,T,d)

        q, k, v = heads(q), heads(k), heads(v)
        q, k = t_rope(q, d_rope), t_rope(k, d_rope)
        scores = q @ k.transpose(-2, -1) / math.sqrt(k_ch)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        p = scores.softmax(-1)
        out = (p @ v).transpose(2, 3).contiguous().view(B, C, T)
        y = F.conv1d(out, sd[f"{base}.conv_o.weight"], sd[f"{base}.conv_o.bias"])
        x = t_channel_layernorm(x + y, sd[f"encoder.encoder.norm_layers_1.{i}.gamma"],
                                sd[f"encoder.encoder.norm_layers_1.{i}.beta"])
        h = F.conv1d(x * mask, sd[f"encoder.encoder.ffn_layers.{i}.conv_1.weight"],
                     sd[f"encoder.encoder.ffn_layers.{i}.conv_1.bias"], padding=1)
        h = F.relu(h)
        h = F.conv1d(h * mask, sd[f"encoder.encoder.ffn_layers.{i}.conv_2.weight"],
                     sd[f"encoder.encoder.ffn_layers.{i}.conv_2.bias"], padding=1)
        h = h * mask
        x = t_channel_layernorm(x + h, sd[f"encoder.encoder.norm_layers_2.{i}.gamma"],
                                sd[f"encoder.encoder.norm_layers_2.{i}.beta"])
    x = x * mask

    mu = F.conv1d(x, sd["encoder.proj_m.weight"], sd["encoder.proj_m.bias"]) * mask

    # duration predictor
    h = F.conv1d(x * mask, sd["encoder.proj_w.conv_1.weight"], sd["encoder.proj_w.conv_1.bias"], padding=1)
    h = t_channel_layernorm(F.relu(h), sd["encoder.proj_w.norm_1.gamma"], sd["encoder.proj_w.norm_1.beta"])
    h = F.conv1d(h * mask, sd["encoder.proj_w.conv_2.weight"], sd["encoder.proj_w.conv_2.bias"], padding=1)
    h = t_channel_layernorm(F.relu(h), sd["encoder.proj_w.norm_2.gamma"], sd["encoder.proj_w.norm_2.beta"])
    logw = F.conv1d(h * mask, sd["encoder.proj_w.proj.weight"], sd["encoder.proj_w.proj.bias"]) * mask
    return mu, logw


def test_text_encoder_matches_torch_twin(rng):
    sd = synthetic_matcha_state_dict(rng)
    params = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])

    B, T = 2, 12
    x_ids = rng.integers(1, TINY["n_vocab"], size=(B, T))
    x_lengths = np.array([12, 9])

    mu_t, logw_t = torch_text_encoder(sd, torch.from_numpy(x_ids), torch.from_numpy(x_lengths))

    model = MatchaTTS(**TINY)
    mu_j, w_ceil, _ = model.apply(
        params, jnp.asarray(x_ids), jnp.asarray(x_lengths), method=MatchaTTS.encode
    )
    # ours is (B, T, F) channels-last
    np.testing.assert_allclose(
        np.asarray(mu_j).transpose(0, 2, 1), mu_t.numpy(), atol=2e-4
    )
    # encode returns ceil(exp(logw)); compare at the logw level via w_ceil
    w_t = np.ceil(np.exp(np.minimum(logw_t.numpy(), 11.0)))
    w_t = w_t * (np.arange(T)[None, None, :] < x_lengths[:, None, None])
    np.testing.assert_allclose(np.asarray(w_ceil).transpose(0, 2, 1), w_t, atol=1e-5)


REFERENCE_ENCODER_PATH = "/root/reference/matcha/models/components/text_encoder.py"


def _load_reference_text_encoder_class():
    """Import the ACTUAL reference TextEncoder class (torch+einops only).

    The file's only matcha.* imports are ``matcha.utils.get_pylogger`` and
    ``matcha.utils.model.sequence_mask``; stub those two modules and load
    the file standalone (bypassing the reference package __init__, which
    pulls in lightning/diffusers that are not installed here).
    """
    import importlib.util
    import logging
    import os
    import sys
    import types

    if not os.path.exists(REFERENCE_ENCODER_PATH):
        pytest.skip("reference repository not available")

    mat = types.ModuleType("matcha")
    utils_mod = types.ModuleType("matcha.utils")
    utils_mod.get_pylogger = logging.getLogger
    model_mod = types.ModuleType("matcha.utils.model")

    def sequence_mask(length, max_length=None):  # matcha/utils/model.py:7
        if max_length is None:
            max_length = length.max()
        x = torch.arange(max_length, dtype=length.dtype, device=length.device)
        return x.unsqueeze(0) < length.unsqueeze(1)

    model_mod.sequence_mask = sequence_mask
    mat.utils = utils_mod
    saved = {k: sys.modules.get(k) for k in ("matcha", "matcha.utils", "matcha.utils.model")}
    sys.modules.update({"matcha": mat, "matcha.utils": utils_mod, "matcha.utils.model": model_mod})
    try:
        spec = importlib.util.spec_from_file_location("reference_text_encoder", REFERENCE_ENCODER_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod.TextEncoder


def test_encoder_matches_real_reference_module(rng):
    """Oracle = the reference's own TextEncoder module, not a hand-written
    twin: same synthetic weights through both stacks must agree."""
    from types import SimpleNamespace

    RefTextEncoder = _load_reference_text_encoder_class()
    sd = synthetic_matcha_state_dict(rng)

    enc_params = SimpleNamespace(
        n_feats=TINY["n_feats"], n_channels=TINY["enc_n_channels"],
        filter_channels=TINY["enc_filter_channels"],
        filter_channels_dp=TINY["enc_filter_channels_dp"],
        n_heads=TINY["enc_n_heads"], n_layers=TINY["enc_n_layers"],
        kernel_size=3, p_dropout=0.1, prenet=True,
    )
    dp_params = SimpleNamespace(
        filter_channels_dp=TINY["enc_filter_channels_dp"], kernel_size=3, p_dropout=0.1
    )
    ref = RefTextEncoder("RoPE Encoder", enc_params, dp_params, n_vocab=TINY["n_vocab"])
    enc_sd = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    ref.load_state_dict(enc_sd, strict=True)
    ref.eval()

    B, T = 2, 24
    x_ids = rng.integers(1, TINY["n_vocab"], size=(B, T)).astype(np.int64)
    x_lengths = np.array([T, T - 7], dtype=np.int64)
    with torch.no_grad():
        mu_t, logw_t, _ = ref(torch.from_numpy(x_ids), torch.from_numpy(x_lengths))

    params = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])
    model = MatchaTTS(**TINY)
    mu_j, w_ceil, _ = model.apply(
        params, jnp.asarray(x_ids, jnp.int32), jnp.asarray(x_lengths, jnp.int32),
        method=MatchaTTS.encode,
    )
    np.testing.assert_allclose(
        np.asarray(mu_j).transpose(0, 2, 1), mu_t.numpy(), atol=2e-4
    )
    w_t = np.ceil(np.exp(np.minimum(logw_t.numpy(), 11.0)))
    w_t = w_t * (np.arange(T)[None, None, :] < x_lengths[:, None, None])
    np.testing.assert_allclose(np.asarray(w_ceil).transpose(0, 2, 1), w_t, atol=1e-5)


def torch_decoder_block(sd, x, mask, temb, prefix_r, prefix_t):
    """ResnetBlock1D + BasicTransformerBlock torch twin (eval mode)."""

    def block1d(x, mask, p):
        h = F.conv1d(x * mask, sd[f"{p}.block.0.weight"], sd[f"{p}.block.0.bias"], padding=1)
        h = F.group_norm(h, 8, sd[f"{p}.block.1.weight"], sd[f"{p}.block.1.bias"])
        return F.mish(h) * mask

    h = block1d(x, mask, f"{prefix_r}.block1")
    temb_p = F.linear(F.mish(temb), sd[f"{prefix_r}.mlp.1.weight"], sd[f"{prefix_r}.mlp.1.bias"])
    h = h + temb_p.unsqueeze(-1)
    h = block1d(h, mask, f"{prefix_r}.block2")
    res = F.conv1d(x * mask, sd[f"{prefix_r}.res_conv.weight"], sd[f"{prefix_r}.res_conv.bias"])
    x = h + res

    # transformer block over (B, T, C)
    ht = x.transpose(1, 2)
    mask_2d = mask[:, 0, :]
    n = F.layer_norm(ht, ht.shape[-1:], sd[f"{prefix_t}.norm1.weight"], sd[f"{prefix_t}.norm1.bias"])
    heads, dim_head = TINY["dec_num_heads"], TINY["dec_attention_head_dim"]
    inner = heads * dim_head
    q = F.linear(n, sd[f"{prefix_t}.attn1.to_q.weight"])
    k = F.linear(n, sd[f"{prefix_t}.attn1.to_k.weight"])
    v = F.linear(n, sd[f"{prefix_t}.attn1.to_v.weight"])
    B, T, _ = n.shape

    def split(t):
        return t.view(B, T, heads, dim_head).transpose(1, 2)

    q, k, v = split(q), split(k), split(v)
    scores = q @ k.transpose(-2, -1) / math.sqrt(dim_head)
    # additive 0/1 mask quirk (reference diffusers behaviour)
    scores = scores + mask_2d[:, None, None, :]
    p = scores.softmax(-1)
    out = (p @ v).transpose(1, 2).contiguous().view(B, T, inner)
    out = F.linear(out, sd[f"{prefix_t}.attn1.to_out.0.weight"], sd[f"{prefix_t}.attn1.to_out.0.bias"])
    ht = out + ht

    n = F.layer_norm(ht, ht.shape[-1:], sd[f"{prefix_t}.norm3.weight"], sd[f"{prefix_t}.norm3.bias"])
    proj = F.linear(n, sd[f"{prefix_t}.ff.net.0.proj.weight"], sd[f"{prefix_t}.ff.net.0.proj.bias"])
    alpha = sd[f"{prefix_t}.ff.net.0.alpha"].exp()
    beta = sd[f"{prefix_t}.ff.net.0.beta"].exp()
    act = proj + (1.0 / (beta + 1e-9)) * torch.sin(proj * alpha) ** 2
    ff = F.linear(act, sd[f"{prefix_t}.ff.net.2.weight"], sd[f"{prefix_t}.ff.net.2.bias"])
    ht = ff + ht
    return ht.transpose(1, 2)


def test_decoder_down_block_matches_torch_twin(rng):
    from matcha_tpu.models.components.decoder import ResnetBlock1D
    from matcha_tpu.models.components.transformer import BasicTransformerBlock

    sd = synthetic_matcha_state_dict(rng)
    full = convert_matcha_state_dict(sd, 2, TINY["dec_num_mid_blocks"])["params"]["decoder"]

    B, T = 2, 16
    C_in = 2 * TINY["n_feats"]
    ch = TINY["dec_channels"][0]
    x = rng.normal(size=(B, C_in, T)).astype(np.float32)
    temb = rng.normal(size=(B, ch * 4)).astype(np.float32)
    lengths = np.array([16, 11])
    mask = (np.arange(T)[None, :] < lengths[:, None]).astype(np.float32)[:, None, :]

    ref = torch_decoder_block(
        sd, torch.from_numpy(x), torch.from_numpy(mask), torch.from_numpy(temb),
        "decoder.estimator.down_blocks.0.0", "decoder.estimator.down_blocks.0.1.0",
    ).numpy()

    res = ResnetBlock1D(ch)
    h = res.apply({"params": full["down_0_resnet"]},
                  jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(mask.transpose(0, 2, 1)),
                  jnp.asarray(temb))
    tb = BasicTransformerBlock(ch, TINY["dec_num_heads"], TINY["dec_attention_head_dim"], 0.0, "snakebeta")
    h = tb.apply({"params": full["down_0_transformer_0"]}, h, jnp.asarray(mask[:, 0, :]))
    np.testing.assert_allclose(np.asarray(h).transpose(0, 2, 1), ref, atol=2e-4)
