"""Parity of ops/seq.py against the ACTUAL reference matcha/utils/model.py
(imports standalone: numpy+torch only). These are the alignment-math
contracts everything downstream leans on — sequence_mask, generate_path
(durations -> binary alignment), fix_len_compatibility (U-Net length
rounding), duration_loss, normalize/denormalize.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODEL_PY = "/root/reference/matcha/utils/model.py"
if not os.path.exists(REF_MODEL_PY):  # pragma: no cover
    pytest.skip("reference checkout not present", allow_module_level=True)

# model.py imports only numpy+torch — load it standalone, bypassing the
# matcha.utils package __init__ (which pulls hydra, not installed here).
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location("reference_model_utils", REF_MODEL_PY)
ref = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ref)

import jax.numpy as jnp  # noqa: E402

from matcha_tpu.ops import seq  # noqa: E402


def test_sequence_mask_matches_reference(rng):
    lengths = rng.integers(1, 12, size=7)
    ref_mask = ref.sequence_mask(torch.from_numpy(lengths), 12).numpy()
    got = np.asarray(seq.sequence_mask(jnp.asarray(lengths), 12))
    np.testing.assert_array_equal(got, ref_mask)


def test_fix_len_compatibility_matches_reference():
    for n in (1, 3, 4, 5, 171, 172, 173, 1000):
        for d in (1, 2, 3):
            assert seq.fix_len_compatibility(n, d) == ref.fix_len_compatibility(
                torch.scalar_tensor(float(n)), d)


def test_generate_path_matches_reference(rng):
    B, T_x, T_y = 3, 7, 25
    durations = rng.integers(0, 6, size=(B, T_x)).astype(np.float32)
    t_xs = rng.integers(2, T_x + 1, size=B)
    mask = (
        (np.arange(T_x)[None, :, None] < t_xs[:, None, None])
        & (np.arange(T_y)[None, None, :] < T_y)
    ).astype(np.float32)
    ref_path = ref.generate_path(torch.from_numpy(durations), torch.from_numpy(mask)).numpy()
    got = np.asarray(seq.generate_path(jnp.asarray(durations), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, ref_path)


def test_duration_loss_matches_reference(rng):
    logw = rng.normal(size=(4, 9)).astype(np.float32)
    logw_ = rng.normal(size=(4, 9)).astype(np.float32)
    lengths = rng.integers(1, 10, size=4).astype(np.float32)
    ref_loss = float(ref.duration_loss(
        torch.from_numpy(logw), torch.from_numpy(logw_), torch.from_numpy(lengths)))
    got = float(seq.duration_loss(jnp.asarray(logw), jnp.asarray(logw_), jnp.asarray(lengths)))
    np.testing.assert_allclose(got, ref_loss, rtol=1e-6)


def test_normalize_denormalize_match_reference(rng):
    data = rng.normal(size=(2, 80, 13)).astype(np.float32)
    for mu, std in [(-5.5367, 2.1161), ([0.5] * 80, [1.5] * 80),
                    (np.float32(-1.25), np.float32(0.75))]:
        # reference treats non-float stats as per-channel tensors
        mu_t = float(mu) if isinstance(mu, (float, np.floating)) else mu
        std_t = float(std) if isinstance(std, (float, np.floating)) else std
        ref_n = ref.normalize(torch.from_numpy(data), mu_t, std_t).numpy()
        got_n = np.asarray(seq.normalize(jnp.asarray(data), mu_t, std_t))
        np.testing.assert_allclose(got_n, ref_n, atol=1e-6)
        ref_d = ref.denormalize(torch.from_numpy(data), mu_t, std_t).numpy()
        got_d = np.asarray(seq.denormalize(jnp.asarray(data), mu_t, std_t))
        np.testing.assert_allclose(got_d, ref_d, atol=1e-6)


def test_convert_pad_shape_matches_reference():
    shape = [[0, 0], [1, 0], [2, 3]]
    assert seq.convert_pad_shape(shape) == ref.convert_pad_shape(shape)
