"""Monotonic Alignment Search: all backends agree with the DP oracle.

The oracle below is an independent numpy implementation of the banded
Viterbi recurrence + backtrack with the reference kernel's exact
tie-breaking (described in SURVEY.md §2.2).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.ops.mas import maximum_path, maximum_path_numpy
from matcha_tpu.ops.mas_ref import maximum_path_jax

MAX_NEG = -1e9


def oracle_single(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """Banded Viterbi + backtrack for one sample (numpy, loops)."""
    value = value.copy()
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            v_cur = MAX_NEG if x == y else value[x, y - 1]
            if x == 0:
                v_prev = 0.0 if y == 0 else MAX_NEG
            else:
                v_prev = value[x - 1, y - 1]
            value[x, y] += max(v_cur, v_prev)

    path = np.zeros_like(value, dtype=np.float32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and y > 0 and (index == y or value[index, y - 1] < value[index - 1, y - 1]):
            index -= 1
    return path


def oracle(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    value = value * mask
    t_xs = mask[:, :, 0].sum(1).astype(int)
    t_ys = mask[:, 0, :].sum(1).astype(int)
    out = np.zeros_like(mask, dtype=np.float32)
    for b in range(value.shape[0]):
        out[b] = oracle_single(value[b].astype(np.float32), t_xs[b], t_ys[b])
    return out * mask


def make_problem(rng, B=4, T_x=11, T_y=29):
    value = rng.normal(size=(B, T_x, T_y)).astype(np.float32)
    t_xs = rng.integers(2, T_x + 1, size=B)
    t_ys = np.minimum(rng.integers(2, T_y + 1, size=B), T_y)
    t_ys = np.maximum(t_ys, t_xs)  # feasible: at least one frame per token
    mask = (
        (np.arange(T_x)[None, :, None] < t_xs[:, None, None])
        & (np.arange(T_y)[None, None, :] < t_ys[:, None, None])
    ).astype(np.float32)
    return value, mask


def assert_valid_path(path: np.ndarray, mask: np.ndarray):
    """Every active frame has exactly one token; paths are monotonic."""
    t_ys = mask[:, 0, :].sum(1).astype(int)
    t_xs = mask[:, :, 0].sum(1).astype(int)
    for b in range(path.shape[0]):
        p = path[b, : t_xs[b], : t_ys[b]]
        np.testing.assert_array_equal(p.sum(0), np.ones(t_ys[b]))
        tok = p.argmax(0)
        assert (np.diff(tok) >= 0).all() and (np.diff(tok) <= 1).all()
        assert tok[0] == 0 and tok[-1] == t_xs[b] - 1


def test_scan_matches_oracle(rng):
    value, mask = make_problem(rng)
    expected = oracle(value, mask)
    got = np.asarray(maximum_path_jax(jnp.asarray(value), jnp.asarray(mask)))
    assert_valid_path(expected, mask)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.slow
def test_scan_matches_oracle_large(rng):
    value, mask = make_problem(rng, B=2, T_x=64, T_y=256)
    expected = oracle(value, mask)
    got = np.asarray(maximum_path_jax(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, expected)


def test_cpp_matches_oracle(rng):
    value, mask = make_problem(rng, B=8, T_x=23, T_y=57)
    expected = oracle(value, mask)
    got = maximum_path_numpy(value, mask)
    np.testing.assert_array_equal(got, expected)


def test_dispatcher_cpu(rng):
    value, mask = make_problem(rng)
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(got, oracle(value, mask))


@pytest.mark.slow
def test_pallas_interpret_matches_oracle(rng):
    """Pallas kernel in interpreter mode (no TPU needed; slow)."""
    from matcha_tpu.ops.mas_pallas import maximum_path_pallas

    value, mask = make_problem(rng, B=2, T_x=8, T_y=16)
    expected = oracle(value, mask)
    got = np.asarray(maximum_path_pallas(jnp.asarray(value), jnp.asarray(mask), interpret=True))
    np.testing.assert_array_equal(got, expected)


def test_full_mask_path_shape(rng):
    value, mask = make_problem(rng, B=1, T_x=5, T_y=5)
    mask[:] = 1.0  # t_x == t_y: diagonal path forced
    got = np.asarray(maximum_path(jnp.asarray(value), jnp.asarray(mask)))
    np.testing.assert_array_equal(got[0], np.eye(5, dtype=np.float32))


def test_single_token_rows(rng):
    """t_x=1 (one-phoneme utterance): every active frame must map to
    token 0 — a real serving case for very short inputs, and a classic
    off-by-one trap in the DP band bounds."""
    B, T_x, T_y = 3, 6, 12
    value = rng.normal(size=(B, T_x, T_y)).astype(np.float32)
    t_xs = np.array([1, 1, 3])
    t_ys = np.array([1, 7, 12])
    mask = (
        (np.arange(T_x)[None, :, None] < t_xs[:, None, None])
        & (np.arange(T_y)[None, None, :] < t_ys[:, None, None])
    ).astype(np.float32)
    expected = oracle(value, mask)
    assert_valid_path(expected, mask)
    np.testing.assert_array_equal(
        np.asarray(maximum_path_jax(jnp.asarray(value), jnp.asarray(mask))), expected)
    np.testing.assert_array_equal(maximum_path_numpy(value, mask), expected)
    # rows with t_x=1: all frames on token 0
    assert expected[0, 0, 0] == 1 and expected[0].sum() == 1
    assert (expected[1, 0, :7] == 1).all()
