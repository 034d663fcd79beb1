"""Numerical parity of the text encoder vs the ACTUAL reference module.

The round-1/2 hand-written torch twins retired once the reference's own
classes became importable as oracles (tests/reference_loader.py and the
standalone import below): the encoder is checked against the real
TextEncoder here, and the decoder / transformer / full synthesise against
the real Decoder/CFM/MatchaTTS in tests/test_reference_decoder_parity.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_convert import TINY, synthetic_matcha_state_dict  # noqa: E402

from matcha_tpu.models import MatchaTTS  # noqa: E402
from matcha_tpu.utils.checkpoints import convert_matcha_state_dict  # noqa: E402


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
