"""Monotonic Alignment Search — pure-JAX reference implementation.

Replaces the reference's Cython/OpenMP kernel + GPU->CPU round-trip
(matcha/utils/monotonic_align/core.pyx:11-47 and __init__.py:7-22) with an
on-device `lax.scan` dynamic program, so MAS stays inside the compiled
training graph instead of breaking it with a host copy every step.

Semantics match the Cython kernel exactly, including tie-breaking:

* forward, for y in [0, t_y):  within the monotonic band
  ``x in [max(0, t_x + y - t_y), min(t_x, y + 1))``:
  ``value[x, y] += max(v_cur, v_prev)`` where ``v_cur = value[x, y-1]``
  (or -BIG when ``x == y``) and ``v_prev = value[x-1, y-1]`` (0 at (0, 0),
  -BIG for x == 0 otherwise);
* backtrack from ``index = t_x - 1``: set ``path[index, y] = 1`` and move
  up when ``index != 0 and (index == y or
  value[index, y-1] < value[index-1, y-1])``.

All shapes are static; per-sample true lengths come in via ``t_xs/t_ys``.
"""

import jax
import jax.numpy as jnp

MAX_NEG_VAL = -1e9


def _forward(value: jnp.ndarray, t_xs: jnp.ndarray, t_ys: jnp.ndarray) -> jnp.ndarray:
    """Accumulate the banded DP table.

    Args:
        value: (B, T_x, T_y) masked log-prior.
        t_xs: (B,) int32 true text lengths.
        t_ys: (B,) int32 true mel lengths.

    Returns:
        (B, T_x, T_y) accumulated values; cells outside the band hold
        MAX_NEG_VAL (never read by backtracking).
    """
    B, T_x, T_y = value.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)[None, :]  # (1, T_x)
    t_xs = t_xs[:, None].astype(jnp.int32)  # (B, 1)
    t_ys = t_ys[:, None].astype(jnp.int32)

    def step(prev_row, inputs):
        lp_y, y = inputs  # lp_y: (B, T_x), y: scalar
        first_col = jnp.where(y == 0, 0.0, MAX_NEG_VAL)
        shifted = jnp.concatenate(
            [jnp.full((B, 1), first_col, dtype=prev_row.dtype), prev_row[:, :-1]], axis=1
        )
        cand = jnp.maximum(prev_row, shifted)
        new_row = cand + lp_y
        in_band = (xs <= y) & (xs >= t_xs + y - t_ys) & (xs < t_xs) & (y < t_ys)
        new_row = jnp.where(in_band, new_row, MAX_NEG_VAL)
        return new_row, new_row

    lp_ymajor = jnp.moveaxis(value, 2, 0)  # (T_y, B, T_x)
    init = jnp.full((B, T_x), MAX_NEG_VAL, dtype=value.dtype)
    _, rows = jax.lax.scan(step, init, (lp_ymajor, jnp.arange(T_y, dtype=jnp.int32)))
    return jnp.moveaxis(rows, 0, 2)  # (B, T_x, T_y)


def _backtrack(acc: jnp.ndarray, t_xs: jnp.ndarray, t_ys: jnp.ndarray) -> jnp.ndarray:
    """Trace the argmax monotonic path through the accumulated table."""
    B, T_x, T_y = acc.shape
    xs = jnp.arange(T_x, dtype=jnp.int32)[None, :]
    t_xs = t_xs.astype(jnp.int32)
    t_ys = t_ys.astype(jnp.int32)

    acc_ymajor = jnp.moveaxis(acc, 2, 0)  # (T_y, B, T_x)
    # Row y-1 for each step y (row -1 is unused: guarded by y > 0).
    prev_rows = jnp.concatenate([jnp.full((1, B, T_x), MAX_NEG_VAL, acc.dtype), acc_ymajor[:-1]], axis=0)

    def step(index, inputs):
        prev_row, y = inputs  # prev_row: (B, T_x)
        active = y < t_ys  # (B,)
        path_row = ((xs == index[:, None]) & active[:, None]).astype(acc.dtype)
        v_idx = jnp.take_along_axis(prev_row, index[:, None], axis=1)[:, 0]
        idx_m1 = jnp.maximum(index - 1, 0)
        v_im1 = jnp.take_along_axis(prev_row, idx_m1[:, None], axis=1)[:, 0]
        move = (index != 0) & ((index == y) | (v_idx < v_im1)) & (y > 0) & active
        return index - move.astype(index.dtype), path_row

    init_index = t_xs - 1
    _, path_rows = jax.lax.scan(
        step,
        init_index,
        (prev_rows, jnp.arange(T_y, dtype=jnp.int32)),
        reverse=True,
    )
    return jnp.moveaxis(path_rows, 0, 2)  # (B, T_x, T_y)


def maximum_path_jax(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """On-device MAS. Drop-in for the reference's ``maximum_path`` wrapper.

    Args:
        value: (B, T_x, T_y) log-prior grid.
        mask: (B, T_x, T_y) 0/1 attention mask.

    Returns:
        (B, T_x, T_y) binary alignment path, dtype of ``mask``.
    """
    out_dtype = mask.dtype
    mask_f = mask.astype(jnp.float32)
    value = value.astype(jnp.float32) * mask_f
    t_xs = jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask_f[:, 0, :], axis=1).astype(jnp.int32)
    acc = _forward(value, t_xs, t_ys)
    path = _backtrack(acc, t_xs, t_ys)
    return (path * mask_f).astype(out_dtype)
