"""Tests for sequence/model math primitives (matcha_tpu/ops/seq.py)."""

import jax.numpy as jnp
import numpy as np

from matcha_tpu.ops import seq


def test_sequence_mask():
    lengths = jnp.array([2, 4, 0])
    m = seq.sequence_mask(lengths, 5)
    expected = np.array(
        [
            [1, 1, 0, 0, 0],
            [1, 1, 1, 1, 0],
            [0, 0, 0, 0, 0],
        ],
        dtype=bool,
    )
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_fix_len_compatibility():
    assert seq.fix_len_compatibility(1) == 4
    assert seq.fix_len_compatibility(4) == 4
    assert seq.fix_len_compatibility(5) == 8
    assert seq.fix_len_compatibility(17, num_downsamplings_in_unet=3) == 24
    assert int(seq.fix_len_compatibility_jnp(jnp.array(5))) == 8


def test_generate_path():
    # durations [2, 1, 3] over 6 frames: token0 covers frames 0-1,
    # token1 covers frame 2, token2 covers frames 3-5.
    dur = jnp.array([[2.0, 1.0, 3.0]])
    mask = jnp.ones((1, 3, 6), dtype=jnp.float32)
    path = np.asarray(seq.generate_path(dur, mask))
    expected = np.array(
        [
            [1, 1, 0, 0, 0, 0],
            [0, 0, 1, 0, 0, 0],
            [0, 0, 0, 1, 1, 1],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(path[0], expected)


def test_generate_path_masked():
    dur = jnp.array([[1.0, 2.0, 0.0]])
    x_mask = jnp.array([[1.0, 1.0, 0.0]])
    y_mask = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    attn_mask = x_mask[:, :, None] * y_mask[:, None, :]
    path = np.asarray(seq.generate_path(dur, attn_mask))
    expected = np.array(
        [
            [1, 0, 0, 0],
            [0, 1, 1, 0],
            [0, 0, 0, 0],
        ],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(path[0], expected)


def test_duration_loss():
    logw = jnp.array([[1.0, 2.0]])
    logw_ = jnp.array([[0.0, 0.0]])
    lengths = jnp.array([2.0])
    assert float(seq.duration_loss(logw, logw_, lengths)) == 2.5


def test_normalize_roundtrip(rng):
    data = jnp.asarray(rng.normal(size=(2, 80, 17)).astype(np.float32))
    out = seq.denormalize(seq.normalize(data, -5.5, 2.1), -5.5, 2.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(data), atol=1e-5)
    # Per-channel stats
    mu = jnp.asarray(rng.normal(size=(80,)).astype(np.float32))
    std = jnp.asarray(rng.uniform(0.5, 2.0, size=(80,)).astype(np.float32))
    out = seq.denormalize(seq.normalize(data, mu, std), mu, std)
    np.testing.assert_allclose(np.asarray(out), np.asarray(data), atol=1e-5)
