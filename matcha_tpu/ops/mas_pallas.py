"""Monotonic Alignment Search — Pallas TPU kernel.

TPU-native replacement for the reference's Cython/OpenMP MAS kernel
(matcha/utils/monotonic_align/core.pyx): one grid program per batch
element (the OpenMP ``prange`` analog), with the banded Viterbi recurrence
vectorized across the text axis on the VPU (the whole row of ``x`` cells
for a given mel frame ``y`` updates in one 8x128-lane step, instead of the
reference's serial inner loop).

Layout note: the DP is y-serial and x-parallel, so rows are stored
y-major — (T_y, T_x) with ``x`` on the 128-wide lane dimension. The caller
transposes in/out; XLA fuses those transposes with neighbours.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from matcha_tpu.ops.mas_ref import MAX_NEG_VAL


def _mas_kernel(t_xs_ref, t_ys_ref, lp_ref, path_ref, val_scratch):
    """One batch element: lp_ref/(path_ref) are (1, T_y, T_x) VMEM blocks."""
    b = pl.program_id(0)
    T_y, T_x = lp_ref.shape[1], lp_ref.shape[2]
    t_x = t_xs_ref[b]
    t_y = t_ys_ref[b]

    xs = jax.lax.broadcasted_iota(jnp.int32, (1, T_x), 1)

    def fwd(y, prev_row):
        lp_y = lp_ref[0, pl.ds(y, 1), :]  # (1, T_x)
        rolled = pltpu.roll(prev_row, 1, axis=1)
        first = jnp.where(y == 0, 0.0, MAX_NEG_VAL)
        shifted = jnp.where(xs == 0, first, rolled)
        new_row = jnp.maximum(prev_row, shifted) + lp_y
        in_band = (xs <= y) & (xs >= t_x + y - t_y) & (xs < t_x) & (y < t_y)
        new_row = jnp.where(in_band, new_row, MAX_NEG_VAL)
        val_scratch[pl.ds(y, 1), :] = new_row
        return new_row

    init = jnp.full((1, T_x), MAX_NEG_VAL, dtype=jnp.float32)
    jax.lax.fori_loop(0, T_y, fwd, init)

    path_ref[:] = jnp.zeros_like(path_ref)

    def bwd(i, index):
        y = T_y - 1 - i
        active = y < t_y

        @pl.when(active)
        def _():
            onehot = (xs == index).astype(jnp.float32)
            path_ref[0, pl.ds(y, 1), :] = onehot

        prev_row = val_scratch[pl.ds(jnp.maximum(y - 1, 0), 1), :]
        v_idx = jnp.sum(jnp.where(xs == index, prev_row, 0.0))
        v_im1 = jnp.sum(jnp.where(xs == index - 1, prev_row, 0.0))
        move = (index != 0) & ((index == y) | (v_idx < v_im1)) & (y > 0) & active
        return index - move.astype(jnp.int32)

    jax.lax.fori_loop(0, T_y, bwd, t_x - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Pallas-TPU MAS. Same contract as :func:`matcha_tpu.ops.mas_ref.maximum_path_jax`.

    Args:
        value: (B, T_x, T_y) log-prior grid.
        mask: (B, T_x, T_y) 0/1 attention mask.
        interpret: run in the Pallas interpreter (for CPU tests).

    Returns:
        (B, T_x, T_y) binary alignment path, dtype of ``mask``.
    """
    B, T_x, T_y = value.shape
    out_dtype = mask.dtype
    mask_f = mask.astype(jnp.float32)
    lp = value.astype(jnp.float32) * mask_f
    t_xs = jnp.sum(mask_f[:, :, 0], axis=1).astype(jnp.int32)
    t_ys = jnp.sum(mask_f[:, 0, :], axis=1).astype(jnp.int32)

    # Pad to hardware-aligned tiles: x lives on the 128-wide lane dim, y on
    # the sublane dim. Mosaic mis-handles (hangs on) tiny unaligned blocks;
    # the padded region stays out-of-band, so results are unaffected.
    P_x = max(128, -(-T_x // 128) * 128)
    P_y = max(8, -(-T_y // 8) * 8)
    lp = jnp.pad(lp, ((0, 0), (0, P_x - T_x), (0, P_y - T_y)))

    lp_ymajor = jnp.swapaxes(lp, 1, 2)  # (B, P_y, P_x): x on the lane dim

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P_y, P_x), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P_y, P_x), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P_y, P_x), jnp.float32)],
    )

    path_ymajor = pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((B, P_y, P_x), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(t_xs, t_ys, lp_ymajor)

    path = jnp.swapaxes(path_ymajor, 1, 2)[:, :T_x, :T_y]
    return (path * mask_f).astype(out_dtype)
