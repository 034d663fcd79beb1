"""Weight-norm (g, v) parameterisation: unfolded == folded numerically."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_convert import TINY_HIFI, synthetic_hifigan_state_dict  # noqa: E402

from matcha_tpu.models.hifigan import Generator  # noqa: E402
from matcha_tpu.utils.checkpoints import convert_hifigan_state_dict  # noqa: E402


def test_unfolded_generator_matches_folded(rng):
    sd = synthetic_hifigan_state_dict(rng)
    mel = jnp.asarray(rng.normal(size=(2, 20, TINY_HIFI.num_mels)).astype(np.float32))

    folded_params = convert_hifigan_state_dict(sd, fold=True)
    unfolded_params = convert_hifigan_state_dict(sd, fold=False)

    gen_plain = Generator(TINY_HIFI)
    gen_wn = Generator(TINY_HIFI, weight_norm=True)

    out_plain = np.asarray(gen_plain.apply(folded_params, mel))
    out_wn = np.asarray(gen_wn.apply(unfolded_params, mel))
    np.testing.assert_allclose(out_wn, out_plain, atol=2e-5)


def test_wn_param_shapes(rng):
    sd = synthetic_hifigan_state_dict(rng)
    p = convert_hifigan_state_dict(sd, fold=False)["params"]
    # conv: v (k, in, out), g (out,)
    assert p["conv_pre"]["weight_v"].shape == (7, TINY_HIFI.num_mels, TINY_HIFI.upsample_initial_channel)
    assert p["conv_pre"]["weight_g"].shape == (TINY_HIFI.upsample_initial_channel,)
    # conv transpose: v (k, in, out), g (in,)
    k0 = TINY_HIFI.upsample_kernel_sizes[0]
    cin = TINY_HIFI.upsample_initial_channel
    assert p["ups_0"]["weight_v"].shape == (k0, cin, cin // 2)
    assert p["ups_0"]["weight_g"].shape == (cin,)
