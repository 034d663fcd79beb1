"""Layer-level numerical parity vs torch functional ops.

These tests pin the exact layout/semantics contracts the checkpoint
converter depends on (conv / transposed conv / groupnorm / weight-norm
folding), using torch (CPU) as the oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from matcha_tpu.models.components.common import Conv1d, ConvTranspose1d, mish  # noqa: E402
from matcha_tpu.utils.checkpoints import (  # noqa: E402
    conv1d_kernel,
    conv_transpose1d_kernel,
    dense_kernel,
    fold_weight_norm,
)


@pytest.mark.parametrize("k,stride,pad,dil", [(3, 1, 1, 1), (5, 1, 2, 1), (3, 2, 1, 1), (7, 1, 9, 3)])
def test_conv1d_matches_torch(rng, k, stride, pad, dil):
    B, T, Cin, Cout = 2, 32, 6, 10
    x = rng.normal(size=(B, Cin, T)).astype(np.float32)
    w = rng.normal(size=(Cout, Cin, k)).astype(np.float32) * 0.2
    b = rng.normal(size=(Cout,)).astype(np.float32)

    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                   stride=stride, padding=pad, dilation=dil).numpy()

    mod = Conv1d(Cout, k, stride=stride, padding=pad, dilation=dil)
    params = {"params": {"conv": {"kernel": jnp.asarray(conv1d_kernel(w)), "bias": jnp.asarray(b)}}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-4)


@pytest.mark.parametrize("k,stride,pad", [(16, 8, 4), (4, 2, 1), (16, 16, 0)])
def test_conv_transpose1d_matches_torch(rng, k, stride, pad):
    B, T, Cin, Cout = 2, 12, 4, 6
    x = rng.normal(size=(B, Cin, T)).astype(np.float32)
    w = rng.normal(size=(Cin, Cout, k)).astype(np.float32) * 0.2
    b = rng.normal(size=(Cout,)).astype(np.float32)

    ref = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
                             stride=stride, padding=pad).numpy()

    mod = ConvTranspose1d(Cout, k, stride=stride, padding=pad)
    params = {"params": {"kernel": jnp.asarray(conv_transpose1d_kernel(w)), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    assert ours.shape[1] == ref.shape[2]
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-4)


def test_groupnorm_matches_torch(rng):
    from flax import linen as nn

    B, C, T, G = 2, 16, 20, 8
    x = rng.normal(size=(B, C, T)).astype(np.float32)
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    ref = F.group_norm(torch.from_numpy(x), G, torch.from_numpy(w), torch.from_numpy(b)).numpy()

    mod = nn.GroupNorm(num_groups=G, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, atol=1e-4)


def test_weight_norm_folding_matches_torch(rng):
    conv = torch.nn.Conv1d(4, 8, 3)
    conv = torch.nn.utils.weight_norm(conv)
    g = conv.weight_g.detach().numpy()
    v = conv.weight_v.detach().numpy()
    w_eff = conv.weight.detach().numpy()
    np.testing.assert_allclose(fold_weight_norm(g, v), w_eff, atol=1e-6)


def test_dense_kernel_roundtrip(rng):
    w = rng.normal(size=(10, 6, 1)).astype(np.float32)  # 1x1 conv
    x = rng.normal(size=(2, 6, 5)).astype(np.float32)
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w)).numpy()
    ours = np.einsum("bct,cd->bdt", x, dense_kernel(w))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_mish_matches_torch(rng):
    x = rng.normal(size=(128,)).astype(np.float32) * 3
    ref = F.mish(torch.from_numpy(x)).numpy()
    ours = np.asarray(mish(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_snakebeta_formula(rng):
    """SnakeBeta: x + 1/(e^beta + eps) * sin^2(e^alpha x), log-scale params."""
    from matcha_tpu.models.components.transformer import SnakeBeta

    C_in, C_out = 6, 8
    x = rng.normal(size=(2, 5, C_in)).astype(np.float32)
    w = rng.normal(size=(C_out, C_in)).astype(np.float32)
    b = rng.normal(size=(C_out,)).astype(np.float32)
    alpha = rng.normal(size=(C_out,)).astype(np.float32) * 0.1
    beta = rng.normal(size=(C_out,)).astype(np.float32) * 0.1

    proj = x @ w.T + b
    expected = proj + (1.0 / (np.exp(beta) + 1e-9)) * np.sin(proj * np.exp(alpha)) ** 2

    mod = SnakeBeta(C_out)
    params = {"params": {"proj": {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)},
                         "alpha": jnp.asarray(alpha), "beta": jnp.asarray(beta)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_rope_rotation_properties(rng):
    """RoPE: norm-preserving on the rotated dims; relative-position property
    <q_m, k_n> depends only on m - n."""
    from matcha_tpu.models.components.text_encoder import apply_rope

    B, H, T, D = 1, 1, 16, 8
    d_rope = 4
    x = rng.normal(size=(B, H, T, D)).astype(np.float32)
    out = np.asarray(apply_rope(jnp.asarray(x), d_rope))
    # position 0 is unrotated; pass-through dims untouched
    np.testing.assert_allclose(out[0, 0, 0], x[0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[..., d_rope:], x[..., d_rope:], atol=1e-6)
    # norms preserved on rotated dims
    np.testing.assert_allclose(
        np.linalg.norm(out[..., :d_rope], axis=-1),
        np.linalg.norm(x[..., :d_rope], axis=-1),
        atol=1e-5,
    )
    # relative property: dot(rope(q)_m, rope(k)_n) == dot(rope(q)_{m+s}, rope(k)_{n+s})
    q = rng.normal(size=(1, 1, T, d_rope)).astype(np.float32)
    k = rng.normal(size=(1, 1, T, d_rope)).astype(np.float32)
    q_const = np.broadcast_to(q[:, :, :1], q.shape).copy()
    k_const = np.broadcast_to(k[:, :, :1], k.shape).copy()
    qr = np.asarray(apply_rope(jnp.asarray(q_const), d_rope))
    kr = np.asarray(apply_rope(jnp.asarray(k_const), d_rope))
    dots = np.einsum("bhtd,bhsd->ts", qr, kr)
    # check a diagonal: all (m, m+2) pairs equal
    diag = np.array([dots[i, i + 2] for i in range(T - 2)])
    np.testing.assert_allclose(diag, diag[0], atol=1e-4)
