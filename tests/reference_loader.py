"""Standalone importer for the ACTUAL reference model modules.

The reference's decoder/transformer/flow_matching/matcha_tts files import
``diffusers`` (0.25.0), ``conformer`` and ``lightning`` — none of which is
installed here. But the reference only uses a narrow slice of each:

* ``diffusers.models.attention_processor.Attention`` with default args =
  plain multi-head attention (AttnProcessor2_0 = F.scaled_dot_product_
  attention; a FLOAT attention_mask is ADDED to the logits, so the 0/1
  mask the decoder passes is the "+1 on valid keys" additive quirk).
* ``diffusers.models.attention.GEGLU/GELU/ApproximateGELU`` = tiny
  Linear(+chunk) wrappers; AdaLayerNorm/Zero are imported but unused in
  the default config.
* ``diffusers.models.lora.LoRACompatibleLinear`` = nn.Linear when no
  lora_layer is set (always, here).
* ``diffusers.models.activations.get_activation`` = name -> nn.Module.
* ``lightning.LightningModule`` = used only for save_hyperparameters()
  and buffer registration at construction time.
* ``conformer.ConformerBlock`` = only instantiated for the non-default
  "conformer" block type.

This module fabricates exactly those slices (faithful to diffusers
0.25.0 semantics — see each stub's docstring), injects them plus the
reference's own intra-package deps into ``sys.modules``, and imports the
real files from /root/reference so parity tests can drive the reference
classes THEMSELVES rather than hand-written twins (VERDICT r2 item 1).

Nothing here ships in matcha_tpu; it is a test-only oracle harness.
"""

import importlib.util
import logging
import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# diffusers 0.25.0 slice
# ---------------------------------------------------------------------------
class LoRACompatibleLinear(nn.Linear):
    """diffusers.models.lora.LoRACompatibleLinear: plain nn.Linear when
    lora_layer is None (matcha never sets one)."""

    def __init__(self, *args, lora_layer=None, **kwargs):
        super().__init__(*args, **kwargs)


class GEGLU(nn.Module):
    """diffusers.models.attention.GEGLU (0.25.0)."""

    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = LoRACompatibleLinear(dim_in, dim_out * 2)

    def forward(self, hidden_states):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class GELU(nn.Module):
    """diffusers.models.attention.GELU (proj then gelu)."""

    def __init__(self, dim_in, dim_out, approximate="none"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class ApproximateGELU(nn.Module):
    """diffusers.models.attention.ApproximateGELU: x * sigmoid(1.702 x)."""

    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        x = self.proj(x)
        return x * torch.sigmoid(1.702 * x)


class _UnusedAdaNorm(nn.Module):
    """AdaLayerNorm/AdaLayerNormZero are imported by the reference but only
    constructed when num_embeds_ada_norm is set (never, in matcha)."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            "AdaLayerNorm is not used by any matcha config; the stub only "
            "satisfies the import")


class Attention(nn.Module):
    """diffusers.models.attention_processor.Attention, 0.25.0 semantics for
    the argument subset matcha uses (query_dim/heads/dim_head/dropout,
    bias=False, no cross attention, scale_qk=True -> AttnProcessor2_0).

    Mask semantics replicated exactly: prepare_attention_mask leaves a
    (B, T_k) FLOAT mask's values untouched (no 0/1 -> -inf conversion),
    repeats it per head, views it (B, heads, 1, T_k), and SDPA ADDS it to
    the attention logits — i.e. valid keys get +1, padded keys +0.
    """

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False,
                 upcast_attention=False, out_bias=True, scale_qk=True,
                 **_unused):
        super().__init__()
        assert not upcast_attention and scale_qk, \
            "stub only models the configuration matcha uses"
        self.inner_dim = dim_head * heads
        self.heads = heads
        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim or query_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim or query_dim, self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList([
            nn.Linear(self.inner_dim, query_dim, bias=out_bias),
            nn.Dropout(dropout),
        ])

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **_unused):
        B, T_q, _ = hidden_states.shape
        context = hidden_states if encoder_hidden_states is None else encoder_hidden_states
        q = self.to_q(hidden_states)
        k = self.to_k(context)
        v = self.to_v(context)
        head_dim = self.inner_dim // self.heads
        q = q.view(B, -1, self.heads, head_dim).transpose(1, 2)
        k = k.view(B, -1, self.heads, head_dim).transpose(1, 2)
        v = v.view(B, -1, self.heads, head_dim).transpose(1, 2)
        if attention_mask is not None:
            assert attention_mask.shape[-1] == k.shape[2], \
                "stub assumes mask length == key length (always true in matcha)"
            am = attention_mask.repeat_interleave(self.heads, dim=0)
            am = am.view(B, self.heads, -1, am.shape[-1])
            out = F.scaled_dot_product_attention(q, k, v, attn_mask=am)
        else:
            out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(B, -1, self.inner_dim)
        out = self.to_out[0](out)
        return self.to_out[1](out)


def get_activation(name: str) -> nn.Module:
    """diffusers.models.activations.get_activation."""
    table = {"silu": nn.SiLU, "swish": nn.SiLU, "mish": nn.Mish,
             "gelu": nn.GELU, "relu": nn.ReLU}
    return table[name]()


def maybe_allow_in_graph(cls):
    """diffusers.utils.torch_utils.maybe_allow_in_graph: torch.compile
    annotation — identity for eager parity runs."""
    return cls


# ---------------------------------------------------------------------------
# conformer (lucidrains) slice — faithful to conformer 0.3.x semantics so the
# reference's ConformerWrapper (decoder.py:161-198) runs as a real oracle and
# its state_dict carries the EXACT key names a real conformer checkpoint
# would (ff1.fn.fn.net.*, attn.fn.to_kv, conv.net.4.conv, conv.net.5 BN, …)
# ---------------------------------------------------------------------------
def _calc_same_padding(kernel_size):
    pad = kernel_size // 2
    return (pad, pad - (kernel_size + 1) % 2)


class _Swish(nn.Module):
    def forward(self, x):
        return x * x.sigmoid()


class _GLU(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        out, gate = x.chunk(2, dim=self.dim)
        return out * gate.sigmoid()


class _Transpose12(nn.Module):
    """einops Rearrange('b n c -> b c n') equivalent (stateless)."""

    def forward(self, x):
        return x.transpose(1, 2)


class _DepthWiseConv1d(nn.Module):
    def __init__(self, chan_in, chan_out, kernel_size, padding):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv1d(chan_in, chan_out, kernel_size, groups=chan_in)

    def forward(self, x):
        x = F.pad(x, self.padding)
        return self.conv(x)


class _Scale(nn.Module):
    def __init__(self, scale, fn):
        super().__init__()
        self.fn, self.scale = fn, scale

    def forward(self, x, **kwargs):
        return self.fn(x, **kwargs) * self.scale


class _PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = fn
        self.norm = nn.LayerNorm(dim)

    def forward(self, x, **kwargs):
        return self.fn(self.norm(x), **kwargs)


class _ConformerAttention(nn.Module):
    """lucidrains conformer Attention: MHSA + Shaw relative position bias
    (rel_pos_emb over clipped distances), combined query x key bool mask."""

    def __init__(self, dim, heads=8, dim_head=64, dropout=0.0, max_pos_emb=512):
        super().__init__()
        inner_dim = dim_head * heads
        self.heads, self.scale, self.max_pos_emb = heads, dim_head ** -0.5, max_pos_emb
        self.to_q = nn.Linear(dim, inner_dim, bias=False)
        self.to_kv = nn.Linear(dim, inner_dim * 2, bias=False)
        self.to_out = nn.Linear(inner_dim, dim)
        self.rel_pos_emb = nn.Embedding(2 * max_pos_emb + 1, dim_head)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x, mask=None):
        B, n, _ = x.shape
        h = self.heads
        q = self.to_q(x)
        k, v = self.to_kv(x).chunk(2, dim=-1)
        q, k, v = (t.view(B, n, h, -1).transpose(1, 2) for t in (q, k, v))
        dots = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
        seq = torch.arange(n, device=x.device)
        dist = (seq[:, None] - seq[None, :]).clamp(
            -self.max_pos_emb, self.max_pos_emb) + self.max_pos_emb
        rel = self.rel_pos_emb(dist).to(q.dtype)
        dots = dots + torch.einsum("bhnd,nrd->bhnr", q, rel) * self.scale
        if mask is not None:
            mask2d = mask[:, None, :, None] * mask[:, None, None, :]
            dots = dots.masked_fill(~mask2d, -torch.finfo(dots.dtype).max)
        attn = dots.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(1, 2).reshape(B, n, -1)
        return self.dropout(self.to_out(out))


class _ConformerFeedForward(nn.Module):
    def __init__(self, dim, mult=4, dropout=0.0):
        super().__init__()
        self.net = nn.Sequential(
            nn.Linear(dim, dim * mult), _Swish(), nn.Dropout(dropout),
            nn.Linear(dim * mult, dim), nn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class _ConformerConvModule(nn.Module):
    def __init__(self, dim, causal=False, expansion_factor=2,
                 kernel_size=31, dropout=0.0):
        super().__init__()
        inner = dim * expansion_factor
        padding = _calc_same_padding(kernel_size) if not causal else (kernel_size - 1, 0)
        self.net = nn.Sequential(
            nn.LayerNorm(dim),
            _Transpose12(),
            nn.Conv1d(dim, inner * 2, 1),
            _GLU(dim=1),
            _DepthWiseConv1d(inner, inner, kernel_size=kernel_size, padding=padding),
            nn.BatchNorm1d(inner) if not causal else nn.Identity(),
            _Swish(),
            nn.Conv1d(inner, dim, 1),
            _Transpose12(),
            nn.Dropout(dropout))

    def forward(self, x):
        return self.net(x)


class _ConformerBlock(nn.Module):
    """conformer.ConformerBlock (lucidrains): half-step FF sandwich around
    MHSA + conv module, post LayerNorm. Same wrapping order as upstream so
    state_dict keys match (ff1 = Scale(0.5, PreNorm(dim, FeedForward)))."""

    def __init__(self, *, dim, dim_head=64, heads=8, ff_mult=4,
                 conv_expansion_factor=2, conv_kernel_size=31,
                 attn_dropout=0.0, ff_dropout=0.0, conv_dropout=0.0,
                 conv_causal=False):
        super().__init__()
        self.ff1 = _ConformerFeedForward(dim=dim, mult=ff_mult, dropout=ff_dropout)
        self.attn = _ConformerAttention(dim=dim, dim_head=dim_head, heads=heads,
                                        dropout=attn_dropout)
        self.conv = _ConformerConvModule(
            dim=dim, causal=conv_causal, expansion_factor=conv_expansion_factor,
            kernel_size=conv_kernel_size, dropout=conv_dropout)
        self.ff2 = _ConformerFeedForward(dim=dim, mult=ff_mult, dropout=ff_dropout)
        self.attn = _PreNorm(dim, self.attn)
        self.ff1 = _Scale(0.5, _PreNorm(dim, self.ff1))
        self.ff2 = _Scale(0.5, _PreNorm(dim, self.ff2))
        self.post_norm = nn.LayerNorm(dim)

    def forward(self, x, mask=None):
        x = self.ff1(x) + x
        x = self.attn(x, mask=mask) + x
        x = self.conv(x) + x
        x = self.ff2(x) + x
        return self.post_norm(x)


class _StubLightningModule(nn.Module):
    """lightning.LightningModule -> torch.nn.Module shim: just enough for
    BaseLightningClass construction (save_hyperparameters, trainer-less)."""

    def __init__(self):
        super().__init__()
        self.hparams = types.SimpleNamespace()

    def save_hyperparameters(self, *a, logger=True, **k):
        pass


def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _import_real(fullname, relpath, registry):
    """Import a real reference file under its package name so that its own
    ``from matcha....`` imports resolve against the registry."""
    spec = importlib.util.spec_from_file_location(
        fullname, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    registry[fullname] = mod
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_models():
    """Import the actual reference model stack; returns a namespace with
    ``matcha_tts``, ``decoder``, ``transformer``, ``flow_matching``,
    ``text_encoder`` and ``model_utils`` modules.

    sys.modules is restored afterwards, so this can coexist with other
    tests that stub different matcha submodules.
    """
    registry = {}

    def plot_tensor(tensor):  # matcha.utils.utils.plot_tensor (unused in tests)
        return None

    stubs = {
        "diffusers": _module("diffusers"),
        "diffusers.models": _module("diffusers.models"),
        "diffusers.models.attention": _module(
            "diffusers.models.attention", GEGLU=GEGLU, GELU=GELU,
            AdaLayerNorm=_UnusedAdaNorm, AdaLayerNormZero=_UnusedAdaNorm,
            ApproximateGELU=ApproximateGELU),
        "diffusers.models.attention_processor": _module(
            "diffusers.models.attention_processor", Attention=Attention),
        "diffusers.models.lora": _module(
            "diffusers.models.lora", LoRACompatibleLinear=LoRACompatibleLinear),
        "diffusers.models.activations": _module(
            "diffusers.models.activations", get_activation=get_activation),
        "diffusers.utils": _module("diffusers.utils"),
        "diffusers.utils.torch_utils": _module(
            "diffusers.utils.torch_utils", maybe_allow_in_graph=maybe_allow_in_graph),
        "conformer": _module("conformer", ConformerBlock=_ConformerBlock),
        "lightning": _module("lightning", LightningModule=_StubLightningModule),
        "lightning.pytorch": _module("lightning.pytorch"),
        "lightning.pytorch.utilities": _module(
            "lightning.pytorch.utilities", grad_norm=lambda *a, **k: {}),
    }

    # matcha intra-package deps: get_pylogger + the REAL utils/model.py.
    mat = _module("matcha")
    mat_utils = _module("matcha.utils", get_pylogger=logging.getLogger)
    mat.utils = mat_utils
    stubs.update({
        "matcha": mat,
        "matcha.utils": mat_utils,
        "matcha.utils.pylogger": _module(
            "matcha.utils.pylogger", get_pylogger=logging.getLogger),
        "matcha.utils.utils": _module(
            "matcha.utils.utils", plot_tensor=plot_tensor),
        "matcha.models": _module("matcha.models"),
        "matcha.models.components": _module("matcha.models.components"),
    })

    # MAS for the reference training forward: our numpy oracle wrapped in
    # the reference's torch-in/torch-out contract (monotonic_align/__init__.py).
    from matcha_tpu.ops.mas import maximum_path_numpy

    def maximum_path(value, mask):
        import numpy as np
        attn = maximum_path_numpy(
            value.detach().cpu().numpy().astype(np.float32),
            mask.detach().cpu().numpy().astype(np.float32))
        return torch.from_numpy(attn.astype(np.float32)).to(value.device)

    stubs["matcha.utils.monotonic_align"] = _module(
        "matcha.utils.monotonic_align", maximum_path=maximum_path)

    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        model_utils = _import_real("matcha.utils.model", "matcha/utils/model.py", stubs)
        mat_utils.model = model_utils
        transformer = _import_real(
            "matcha.models.components.transformer",
            "matcha/models/components/transformer.py", stubs)
        decoder = _import_real(
            "matcha.models.components.decoder",
            "matcha/models/components/decoder.py", stubs)
        text_encoder = _import_real(
            "matcha.models.components.text_encoder",
            "matcha/models/components/text_encoder.py", stubs)
        flow_matching = _import_real(
            "matcha.models.components.flow_matching",
            "matcha/models/components/flow_matching.py", stubs)
        base = _import_real(
            "matcha.models.baselightningmodule",
            "matcha/models/baselightningmodule.py", stubs)
        matcha_tts = _import_real(
            "matcha.models.matcha_tts", "matcha/models/matcha_tts.py", stubs)
    finally:
        for k in stubs:
            if saved.get(k) is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = saved[k]

    return types.SimpleNamespace(
        matcha_tts=matcha_tts, decoder=decoder, transformer=transformer,
        flow_matching=flow_matching, text_encoder=text_encoder,
        baselightningmodule=base, model_utils=model_utils)
