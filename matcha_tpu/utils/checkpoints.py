"""Checkpoint IO: torch-reference conversion + native orbax checkpoints.

Two jobs (SURVEY.md §5.4):
1. Read the reference formats — Lightning ``.ckpt`` for MatchaTTS and the
   raw ``{"generator": state_dict}`` torch dict for HiFi-GAN — and convert
   them to our flax param pytrees. Weight-norm is folded (g, v) -> w at
   load time, the XLA-friendly equivalent of the reference's
   ``remove_weight_norm`` (matcha/hifigan/models.py:199-206).
2. Write/read native checkpoints (orbax) with hparams embedded, mirroring
   the ``save_hyperparameters`` contract that lets a checkpoint rebuild
   its model with no external config (matcha/models/matcha_tts.py:41).

Layout rules (torch -> channels-last flax):
* Conv1d  (out, in, k)  -> kernel (k, in, out):  ``transpose(2, 1, 0)``
* 1x1 Conv1d == Dense   -> kernel (in, out):     ``w[:, :, 0].T``
* ConvTranspose1d (in, out, k) -> kernel (k, in, out) of an input-dilated
  conv: ``flip(k) + transpose``: ``w[:, :, ::-1].transpose(2, 0, 1)``
* Linear (out, in) -> kernel (in, out): ``w.T``
"""

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


# ---------------------------------------------------------------------------
# low-level layout converters
# ---------------------------------------------------------------------------


def conv1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    if w.ndim == 3:  # 1x1 conv used as dense
        w = w[:, :, 0]
    return np.ascontiguousarray(w.T)


def conv_transpose1d_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1], (2, 0, 1)))


def conv2d_kernel(w: np.ndarray) -> np.ndarray:
    # torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """weight_norm(dim=0): w = g * v / ||v|| with the norm over all
    non-output dims."""
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
    return g * v / norm


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t, dtype=np.float32)


# ---------------------------------------------------------------------------
# nested-dict helpers
# ---------------------------------------------------------------------------


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# ---------------------------------------------------------------------------
# MatchaTTS conversion
# ---------------------------------------------------------------------------


def _convert_channel_layernorm(sd, prefix: str, out: dict, path: str) -> None:
    _set(out, f"{path}/gamma", _np(sd[f"{prefix}.gamma"]))
    _set(out, f"{path}/beta", _np(sd[f"{prefix}.beta"]))


def _convert_conv1d(sd, prefix: str, out: dict, path: str) -> None:
    _set(out, f"{path}/conv/kernel", conv1d_kernel(_np(sd[f"{prefix}.weight"])))
    if f"{prefix}.bias" in sd:
        _set(out, f"{path}/conv/bias", _np(sd[f"{prefix}.bias"]))


def _convert_dense(sd, prefix: str, out: dict, path: str, bias: bool = True) -> None:
    _set(out, f"{path}/kernel", dense_kernel(_np(sd[f"{prefix}.weight"])))
    if bias and f"{prefix}.bias" in sd:
        _set(out, f"{path}/bias", _np(sd[f"{prefix}.bias"]))


def _convert_groupnorm(sd, prefix: str, out: dict, path: str) -> None:
    _set(out, f"{path}/scale", _np(sd[f"{prefix}.weight"]))
    _set(out, f"{path}/bias", _np(sd[f"{prefix}.bias"]))


def _convert_layernorm(sd, prefix: str, out: dict, path: str) -> None:
    _set(out, f"{path}/scale", _np(sd[f"{prefix}.weight"]))
    _set(out, f"{path}/bias", _np(sd[f"{prefix}.bias"]))


def _convert_resnet_block(sd, prefix: str, out: dict, path: str) -> None:
    _convert_conv1d(sd, f"{prefix}.block1.block.0", out, f"{path}/block1/conv")
    _convert_groupnorm(sd, f"{prefix}.block1.block.1", out, f"{path}/block1/norm")
    _convert_conv1d(sd, f"{prefix}.block2.block.0", out, f"{path}/block2/conv")
    _convert_groupnorm(sd, f"{prefix}.block2.block.1", out, f"{path}/block2/norm")
    _convert_dense(sd, f"{prefix}.mlp.1", out, f"{path}/mlp")
    _convert_dense(sd, f"{prefix}.res_conv", out, f"{path}/res_conv")


def _convert_transformer_block(sd, prefix: str, out: dict, path: str) -> None:
    _convert_layernorm(sd, f"{prefix}.norm1", out, f"{path}/norm1")
    _convert_dense(sd, f"{prefix}.attn1.to_q", out, f"{path}/attn1/to_q", bias=False)
    _convert_dense(sd, f"{prefix}.attn1.to_k", out, f"{path}/attn1/to_k", bias=False)
    _convert_dense(sd, f"{prefix}.attn1.to_v", out, f"{path}/attn1/to_v", bias=False)
    _convert_dense(sd, f"{prefix}.attn1.to_out.0", out, f"{path}/attn1/to_out")
    _convert_layernorm(sd, f"{prefix}.norm3", out, f"{path}/norm3")
    _convert_dense(sd, f"{prefix}.ff.net.0.proj", out, f"{path}/ff/act/proj")
    if f"{prefix}.ff.net.0.alpha" in sd:  # snakebeta
        _set(out, f"{path}/ff/act/alpha", _np(sd[f"{prefix}.ff.net.0.alpha"]))
        _set(out, f"{path}/ff/act/beta", _np(sd[f"{prefix}.ff.net.0.beta"]))
    _convert_dense(sd, f"{prefix}.ff.net.2", out, f"{path}/ff/proj_out")


def _convert_conformer_block(sd, prefix: str, out: dict, bstats: dict, path: str) -> None:
    """Reference ConformerWrapper (decoder.py:161-198 — the lucidrains
    conformer.ConformerBlock) -> our flax ConformerBlock(use_batch_norm).

    Torch key layout (lucidrains 0.3.x): ff1/ff2 = Scale(0.5, PreNorm(dim,
    FeedForward(net=Sequential[Linear, Swish, Dropout, Linear, Dropout]))),
    attn = PreNorm(dim, Attention(to_q/to_kv/to_out/rel_pos_emb)), conv =
    Sequential[LayerNorm, Rearrange, Conv1d k=1, GLU, DepthWiseConv1d,
    BatchNorm1d, Swish, Conv1d k=1, Rearrange, Dropout], post_norm.
    BatchNorm running stats land in the ``batch_stats`` collection
    (inference form — models/components/conformer.py use_batch_norm)."""
    for ff in ("ff1", "ff2"):
        _convert_layernorm(sd, f"{prefix}.{ff}.fn.norm", out, f"{path}/{ff}/norm")
        _convert_dense(sd, f"{prefix}.{ff}.fn.fn.net.0", out, f"{path}/{ff}/ff1")
        _convert_dense(sd, f"{prefix}.{ff}.fn.fn.net.3", out, f"{path}/{ff}/ff2")
    _convert_layernorm(sd, f"{prefix}.attn.norm", out, f"{path}/attn/norm")
    _convert_dense(sd, f"{prefix}.attn.fn.to_q", out, f"{path}/attn/to_q", bias=False)
    _convert_dense(sd, f"{prefix}.attn.fn.to_kv", out, f"{path}/attn/to_kv", bias=False)
    _convert_dense(sd, f"{prefix}.attn.fn.to_out", out, f"{path}/attn/to_out")
    _set(out, f"{path}/attn/rel_pos_emb/embedding",
         _np(sd[f"{prefix}.attn.fn.rel_pos_emb.weight"]))
    _convert_layernorm(sd, f"{prefix}.conv.net.0", out, f"{path}/conv/norm")
    # k=1 convs map to Dense: (out, in, 1) torch weight -> (in, out) kernel
    _set(out, f"{path}/conv/pw1/kernel", _np(sd[f"{prefix}.conv.net.2.weight"])[:, :, 0].T)
    _set(out, f"{path}/conv/pw1/bias", _np(sd[f"{prefix}.conv.net.2.bias"]))
    # bare nn.Conv named "depthwise" (no inner /conv scope): (inner,1,k)
    # torch depthwise weight -> (k,1,inner) flax grouped-conv kernel
    _set(out, f"{path}/conv/depthwise/kernel",
         conv1d_kernel(_np(sd[f"{prefix}.conv.net.4.conv.weight"])))
    _set(out, f"{path}/conv/depthwise/bias", _np(sd[f"{prefix}.conv.net.4.conv.bias"]))
    _set(out, f"{path}/conv/bn/scale", _np(sd[f"{prefix}.conv.net.5.weight"]))
    _set(out, f"{path}/conv/bn/bias", _np(sd[f"{prefix}.conv.net.5.bias"]))
    _set(bstats, f"{path}/conv/bn/mean", _np(sd[f"{prefix}.conv.net.5.running_mean"]))
    _set(bstats, f"{path}/conv/bn/var", _np(sd[f"{prefix}.conv.net.5.running_var"]))
    _set(out, f"{path}/conv/pw2/kernel", _np(sd[f"{prefix}.conv.net.7.weight"])[:, :, 0].T)
    _set(out, f"{path}/conv/pw2/bias", _np(sd[f"{prefix}.conv.net.7.bias"]))
    _convert_layernorm(sd, f"{prefix}.post_norm", out, f"{path}/post_norm")


def convert_matcha_state_dict(sd: Dict[str, Any], n_down_blocks: int = 2, num_mid_blocks: int = 2) -> dict:
    """Convert a reference MatchaTTS torch state_dict to a flax param tree.

    Naming follows the reference modules (matcha/models/matcha_tts.py,
    components/text_encoder.py, components/decoder.py). Conformer-block
    checkpoints additionally yield a ``batch_stats`` collection (BatchNorm
    running stats, inference form).
    """
    out: dict = {}
    bstats: dict = {}

    # --- text encoder -----------------------------------------------------
    _set(out, "encoder/emb/embedding", _np(sd["encoder.emb.weight"]))
    if "spk_emb.weight" in sd:
        _set(out, "spk_emb/embedding", _np(sd["spk_emb.weight"]))

    prenet_layers = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"encoder\.prenet\.conv_layers\.(\d+)\.weight", k))}
    )
    for i in prenet_layers:
        _convert_conv1d(sd, f"encoder.prenet.conv_layers.{i}", out, f"encoder/prenet/conv_layers_{i}")
        _convert_channel_layernorm(sd, f"encoder.prenet.norm_layers.{i}", out, f"encoder/prenet/norm_layers_{i}")
    if "encoder.prenet.proj.weight" in sd:
        _convert_dense(sd, "encoder.prenet.proj", out, "encoder/prenet/proj")

    enc_layers = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"encoder\.encoder\.attn_layers\.(\d+)\.", k))}
    )
    for i in enc_layers:
        base = f"encoder.encoder.attn_layers.{i}"
        for name in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _convert_dense(sd, f"{base}.{name}", out, f"encoder/encoder/attn_layers_{i}/{name}")
        _convert_channel_layernorm(sd, f"encoder.encoder.norm_layers_1.{i}", out, f"encoder/encoder/norm_layers_1_{i}")
        _convert_conv1d(sd, f"encoder.encoder.ffn_layers.{i}.conv_1", out, f"encoder/encoder/ffn_layers_{i}/conv_1")
        _convert_conv1d(sd, f"encoder.encoder.ffn_layers.{i}.conv_2", out, f"encoder/encoder/ffn_layers_{i}/conv_2")
        _convert_channel_layernorm(sd, f"encoder.encoder.norm_layers_2.{i}", out, f"encoder/encoder/norm_layers_2_{i}")

    _convert_dense(sd, "encoder.proj_m", out, "encoder/proj_m")
    _convert_conv1d(sd, "encoder.proj_w.conv_1", out, "encoder/proj_w/conv_1")
    _convert_channel_layernorm(sd, "encoder.proj_w.norm_1", out, "encoder/proj_w/norm_1")
    _convert_conv1d(sd, "encoder.proj_w.conv_2", out, "encoder/proj_w/conv_2")
    _convert_channel_layernorm(sd, "encoder.proj_w.norm_2", out, "encoder/proj_w/norm_2")
    _convert_dense(sd, "encoder.proj_w.proj", out, "encoder/proj_w/proj")

    # --- CFM estimator (U-Net) -------------------------------------------
    est = "decoder.estimator"
    _convert_dense(sd, f"{est}.time_mlp.linear_1", out, "decoder/time_mlp/linear_1")
    _convert_dense(sd, f"{est}.time_mlp.linear_2", out, "decoder/time_mlp/linear_2")

    def tblocks(prefix: str, path_prefix: str) -> None:
        js = sorted({int(m.group(1)) for k in sd if (m := re.match(re.escape(prefix) + r"\.(\d+)\.norm1\.", k))})
        for j in js:
            _convert_transformer_block(sd, f"{prefix}.{j}", out, f"{path_prefix}_transformer_{j}")
        # conformer blocks are recognised by their post_norm (decoder.py:318)
        cs = sorted({int(m.group(1)) for k in sd if (m := re.match(re.escape(prefix) + r"\.(\d+)\.post_norm\.", k))})
        for j in cs:
            _convert_conformer_block(sd, f"{prefix}.{j}", out, bstats, f"{path_prefix}_conformer_{j}")

    for i in range(n_down_blocks):
        _convert_resnet_block(sd, f"{est}.down_blocks.{i}.0", out, f"decoder/down_{i}_resnet")
        tblocks(f"{est}.down_blocks.{i}.1", f"decoder/down_{i}")
        is_last = i == n_down_blocks - 1
        if is_last:
            # bare Conv1d
            _set(out, f"decoder/down_{i}_downsample/conv/kernel", conv1d_kernel(_np(sd[f"{est}.down_blocks.{i}.2.weight"])))
            _set(out, f"decoder/down_{i}_downsample/conv/bias", _np(sd[f"{est}.down_blocks.{i}.2.bias"]))
        else:
            _convert_conv1d(sd, f"{est}.down_blocks.{i}.2.conv", out, f"decoder/down_{i}_downsample/conv")

    for i in range(num_mid_blocks):
        _convert_resnet_block(sd, f"{est}.mid_blocks.{i}.0", out, f"decoder/mid_{i}_resnet")
        tblocks(f"{est}.mid_blocks.{i}.1", f"decoder/mid_{i}")

    n_up_blocks = n_down_blocks
    for i in range(n_up_blocks):
        _convert_resnet_block(sd, f"{est}.up_blocks.{i}.0", out, f"decoder/up_{i}_resnet")
        tblocks(f"{est}.up_blocks.{i}.1", f"decoder/up_{i}")
        is_last = i == n_up_blocks - 1
        if is_last:
            _set(out, f"decoder/up_{i}_upsample/conv/kernel", conv1d_kernel(_np(sd[f"{est}.up_blocks.{i}.2.weight"])))
            _set(out, f"decoder/up_{i}_upsample/conv/bias", _np(sd[f"{est}.up_blocks.{i}.2.bias"]))
        else:
            w = _np(sd[f"{est}.up_blocks.{i}.2.conv.weight"])
            _set(out, f"decoder/up_{i}_upsample/conv/kernel", conv_transpose1d_kernel(w))
            _set(out, f"decoder/up_{i}_upsample/conv/bias", _np(sd[f"{est}.up_blocks.{i}.2.conv.bias"]))

    _convert_conv1d(sd, f"{est}.final_block.block.0", out, "decoder/final_block/conv")
    _convert_groupnorm(sd, f"{est}.final_block.block.1", out, "decoder/final_block/norm")
    _convert_dense(sd, f"{est}.final_proj", out, "decoder/final_proj")

    if bstats:
        return {"params": out, "batch_stats": bstats}
    return {"params": out}


def load_torch_matcha_checkpoint(path: str) -> Tuple[dict, dict]:
    """Load a reference Lightning .ckpt -> (model_kwargs, flax params).

    The embedded ``hyper_parameters`` rebuild the model config, mirroring
    ``load_from_checkpoint`` (matcha/cli.py:110).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v for k, v in ckpt["state_dict"].items()}
    hp = ckpt.get("hyper_parameters", {})

    def _get(d, k, default=None):
        try:
            v = d[k]
        except (KeyError, TypeError):
            return default
        return v

    enc = _get(hp, "encoder")
    dec = _get(hp, "decoder")
    cfm = _get(hp, "cfm")
    enc_p = _get(enc, "encoder_params") if enc is not None else None
    dp_p = _get(enc, "duration_predictor_params") if enc is not None else None

    kwargs = dict(
        n_vocab=int(_get(hp, "n_vocab", 178)),
        n_spks=int(_get(hp, "n_spks", 1)),
        spk_emb_dim=int(_get(hp, "spk_emb_dim", 64)),
        n_feats=int(_get(hp, "n_feats", 80)),
        prior_loss=bool(_get(hp, "prior_loss", True)),
    )
    if enc_p is not None:
        kwargs.update(
            enc_n_channels=int(_get(enc_p, "n_channels", 192)),
            enc_filter_channels=int(_get(enc_p, "filter_channels", 768)),
            enc_filter_channels_dp=int(_get(enc_p, "filter_channels_dp", 256)),
            enc_n_heads=int(_get(enc_p, "n_heads", 2)),
            enc_n_layers=int(_get(enc_p, "n_layers", 6)),
            enc_kernel_size=int(_get(enc_p, "kernel_size", 3)),
            enc_p_dropout=float(_get(enc_p, "p_dropout", 0.1)),
            enc_prenet=bool(_get(enc_p, "prenet", True)),
        )
    if dp_p is not None:
        kwargs.update(dp_kernel_size=int(_get(dp_p, "kernel_size", 3)))
    if dec is not None:
        kwargs.update(
            dec_channels=tuple(_get(dec, "channels", (256, 256))),
            dec_dropout=float(_get(dec, "dropout", 0.05)),
            dec_attention_head_dim=int(_get(dec, "attention_head_dim", 64)),
            dec_n_blocks=int(_get(dec, "n_blocks", 1)),
            dec_num_mid_blocks=int(_get(dec, "num_mid_blocks", 2)),
            dec_num_heads=int(_get(dec, "num_heads", 2)),
            dec_act_fn=str(_get(dec, "act_fn", "snakebeta")),
            dec_down_block_type=str(_get(dec, "down_block_type", "transformer")),
            dec_mid_block_type=str(_get(dec, "mid_block_type", "transformer")),
            dec_up_block_type=str(_get(dec, "up_block_type", "transformer")),
        )
    if cfm is not None:
        kwargs.update(sigma_min=float(_get(cfm, "sigma_min", 1e-4)))
    if any(k.endswith(".conv.net.5.running_mean") for k in sd):
        # conformer blocks with BatchNorm running stats: select the
        # torch-faithful inference BatchNorm form so the stats convert
        kwargs.update(dec_conformer_batch_norm=True)
    if "mel_mean" in sd:
        kwargs.update(mel_mean=float(_np(sd["mel_mean"])), mel_std=float(_np(sd["mel_std"])))

    params = convert_matcha_state_dict(
        sd,
        n_down_blocks=len(kwargs.get("dec_channels", (256, 256))),
        num_mid_blocks=kwargs.get("dec_num_mid_blocks", 2),
    )
    return kwargs, params


# ---------------------------------------------------------------------------
# HiFi-GAN conversion
# ---------------------------------------------------------------------------


def convert_hifigan_state_dict(sd: Dict[str, Any], fold: bool = True) -> dict:
    """Convert a torch HiFi-GAN generator state_dict (weight-normed) to a
    flax param tree.

    ``fold=True`` (default) folds weight norm into plain conv kernels
    (inference form); ``fold=False`` keeps the (g, v) parameterisation for
    the training-mode ``Generator(weight_norm=True)``.
    """
    out: dict = {}

    def gv(prefix: str):
        if f"{prefix}.weight_g" in sd:
            return _np(sd[f"{prefix}.weight_g"]), _np(sd[f"{prefix}.weight_v"])
        # torch >= 2.1 parametrized naming
        if f"{prefix}.parametrizations.weight.original0" in sd:
            return (
                _np(sd[f"{prefix}.parametrizations.weight.original0"]),
                _np(sd[f"{prefix}.parametrizations.weight.original1"]),
            )
        return None, _np(sd[f"{prefix}.weight"])

    def folded(prefix: str) -> np.ndarray:
        g, v = gv(prefix)
        return fold_weight_norm(g, v) if g is not None else v

    def put_conv(prefix: str, path: str, transpose: bool = False) -> None:
        to_kernel = conv_transpose1d_kernel if transpose else conv1d_kernel
        if fold:
            _set(out, f"{path}/conv/kernel" if not transpose else f"{path}/kernel",
                 to_kernel(folded(prefix)))
            _set(out, f"{path}/conv/bias" if not transpose else f"{path}/bias",
                 _np(sd[f"{prefix}.bias"]))
        else:
            g, v = gv(prefix)
            if g is None:
                raise ValueError(f"{prefix}: no weight_norm params to keep unfolded")
            _set(out, f"{path}/weight_v", to_kernel(v))
            _set(out, f"{path}/weight_g", g.reshape(-1))
            _set(out, f"{path}/bias", _np(sd[f"{prefix}.bias"]))

    put_conv("conv_pre", "conv_pre")

    ups = sorted({int(m.group(1)) for k in sd if (m := re.match(r"ups\.(\d+)\.", k))})
    for i in ups:
        put_conv(f"ups.{i}", f"ups_{i}", transpose=True)

    res = sorted({int(m.group(1)) for k in sd if (m := re.match(r"resblocks\.(\d+)\.", k))})
    for n in res:
        for group in ("convs1", "convs2", "convs"):
            js = sorted(
                {int(m.group(1)) for k in sd if (m := re.match(rf"resblocks\.{n}\.{group}\.(\d+)\.", k))}
            )
            for j in js:
                put_conv(f"resblocks.{n}.{group}.{j}", f"resblocks_{n}/{group}_{j}")

    put_conv("conv_post", "conv_post")
    return {"params": out}


def load_torch_hifigan_checkpoint(path: str) -> dict:
    """Load the reference vocoder ckpt ({"generator": state_dict})."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["generator"] if "generator" in ckpt else ckpt
    return convert_hifigan_state_dict(sd)


def convert_mpd_state_dict(sd: Dict[str, Any]) -> dict:
    """torch MultiPeriodDiscriminator state_dict (weight-normed, the
    reference's training form — models.py:247-273) -> flax params for
    ``MultiPeriodDiscriminator(weight_norm=True)``.

    torch Conv2d weight_v is (out, in, kh, kw); flax HWIO is
    (kh, kw, in, out). weight_g (out, 1, 1, 1) -> (out,)."""
    out: dict = {}

    def put(prefix: str, path: str) -> None:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
        _set(out, f"{path}/weight_v", v.transpose(2, 3, 1, 0))
        _set(out, f"{path}/weight_g", g.reshape(-1))
        _set(out, f"{path}/bias", _np(sd[f"{prefix}.bias"]))

    discs = sorted({int(m.group(1)) for k in sd if (m := re.match(r"discriminators\.(\d+)\.", k))})
    for i in discs:
        convs = sorted(
            {int(m.group(1)) for k in sd if (m := re.match(rf"discriminators\.{i}\.convs\.(\d+)\.", k))}
        )
        for j in convs:
            put(f"discriminators.{i}.convs.{j}", f"discriminators_{i}/convs_{j}")
        put(f"discriminators.{i}.conv_post", f"discriminators_{i}/conv_post")
    return {"params": out}


def convert_msd_scale_state_dict(sd: Dict[str, Any], index: int) -> dict:
    """One weight-normed MSD scale (reference ``discriminators.{index}``,
    index >= 1 — scale 0 is spectral-normed and carries torch power-
    iteration buffers instead) -> flax params for
    ``DiscriminatorS(weight_norm=True)``.

    torch grouped Conv1d weight_v is (out, in/groups, k); flax HIO is
    (k, in/groups, out)."""
    out: dict = {}

    def put(prefix: str, path: str) -> None:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
        _set(out, f"{path}/weight_v", v.transpose(2, 1, 0))
        _set(out, f"{path}/weight_g", g.reshape(-1))
        _set(out, f"{path}/bias", _np(sd[f"{prefix}.bias"]))

    convs = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(rf"discriminators\.{index}\.convs\.(\d+)\.", k))}
    )
    for j in convs:
        put(f"discriminators.{index}.convs.{j}", f"convs_{j}")
    put(f"discriminators.{index}.conv_post", "conv_post")
    return {"params": out}


# ---------------------------------------------------------------------------
# native (orbax) checkpoints
# ---------------------------------------------------------------------------


def save_native_checkpoint(
    ckpt_dir: str,
    params,
    hparams: dict,
    step: int = 0,
    extra=None,
    opt_state=None,
    epoch: int = 0,
    name: Optional[str] = None,
) -> str:
    """Save a native checkpoint: orbax pytree + hparams json.

    With ``opt_state`` the FULL training state is checkpointed (the
    reference restores optimizer + scheduler state on resume,
    matcha/models/baselightningmodule.py:35-43; train.py:79 ``ckpt_path``).
    Optimizer state is stored as its flat leaf list — the treedef (optax
    namedtuples) is rebuilt from ``tx.init(params)`` at restore time.
    ``epoch`` records the number of COMPLETED epochs at save time.
    """
    import jax
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    name = name if name is not None else f"checkpoint_{step:06d}"
    path = os.path.join(ckpt_dir, name)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_leaves"] = [np.asarray(x) for x in jax.tree.leaves(opt_state)]
    if extra is not None:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, f"{name}.hparams.json"), "w", encoding="utf-8") as f:
            json.dump({"hparams": hparams, "step": step, "epoch": epoch}, f, indent=2, default=str)
    return path


def load_native_checkpoint(path: str):
    """Load a native checkpoint -> (params, hparams, step, extra).

    ``extra`` is a dict with ``opt_leaves`` (flat optimizer-state arrays,
    or None for params-only checkpoints), ``epoch`` (completed epochs),
    and any user payload under ``user``.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    hp_file = path + ".hparams.json"
    hparams, step, epoch = {}, 0, 0
    if os.path.exists(hp_file):
        with open(hp_file, encoding="utf-8") as f:
            meta = json.load(f)
        hparams, step, epoch = meta.get("hparams", {}), meta.get("step", 0), meta.get("epoch", 0)
    extra = {
        "opt_leaves": payload.get("opt_leaves"),
        "epoch": epoch,
        "user": payload.get("extra"),
    }
    return payload["params"], hparams, step, extra


def restore_opt_state(opt_leaves, template):
    """Rebuild an optax state pytree from saved flat leaves + a treedef
    template (``tx.init(params)``)."""
    import jax

    treedef = jax.tree.structure(template)
    shapes = [np.shape(x) for x in jax.tree.leaves(template)]
    got = [np.shape(x) for x in opt_leaves]
    if shapes != got:
        raise ValueError(
            f"optimizer state mismatch: checkpoint has {len(got)} leaves "
            f"{got[:3]}..., optimizer expects {len(shapes)} {shapes[:3]}..."
        )
    return jax.tree.unflatten(treedef, list(opt_leaves))


def scan_checkpoints(ckpt_dir: str) -> Optional[str]:
    """Latest native checkpoint path in a dir (by step), or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [
        d for d in os.listdir(ckpt_dir)
        if d.startswith("checkpoint_") and not d.endswith(".json") and
        os.path.isdir(os.path.join(ckpt_dir, d))
    ]
    if not cands:
        return None
    return os.path.join(ckpt_dir, sorted(cands)[-1])
