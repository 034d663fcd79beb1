"""Sequence/model math primitives (pure jnp, jit-friendly, static shapes).

TPU-native equivalents of the reference's model utilities
(matcha/utils/model.py:7-90). All functions take/return jnp arrays and are
shape-polymorphic only over *static* Python ints, so they trace cleanly
under jit.
"""

import math

import jax.numpy as jnp
import numpy as np


def sequence_mask(length: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Boolean mask (B, max_length): True where index < length.

    Unlike the reference (matcha/utils/model.py:7-11), ``max_length`` must
    be a static int — dynamic maxima break XLA's static-shape model; callers
    pick a padded bucket length instead.
    """
    x = jnp.arange(max_length, dtype=length.dtype)
    return x[None, :] < length[:, None]


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round a mel length up to a multiple of 2**num_downsamplings (host-side).

    Reference: matcha/utils/model.py:14-20. Used when choosing static
    bucket lengths, so it operates on Python ints.
    """
    factor = 2**num_downsamplings_in_unet
    return int(math.ceil(length / factor) * factor)


def fix_len_compatibility_jnp(length: jnp.ndarray, num_downsamplings_in_unet: int = 2) -> jnp.ndarray:
    """On-device variant of :func:`fix_len_compatibility` (returns int32)."""
    factor = 2**num_downsamplings_in_unet
    return (jnp.ceil(length / factor) * factor).astype(jnp.int32)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Expand per-token durations into a binary alignment matrix.

    Args:
        duration: (B, T_x) non-negative durations (frames per token).
        mask: (B, T_x, T_y) attention mask.

    Returns:
        (B, T_x, T_y) 0/1 path where row x covers frames
        [cumsum_{<x}, cumsum_{<=x}). Matches matcha/utils/model.py:29-41
        (cumsum + shifted sequence-mask difference), already fully
        vectorized and jittable.
    """
    b, t_x, t_y = mask.shape
    cum_duration = jnp.cumsum(duration, axis=1)
    cum_duration_flat = cum_duration.reshape(b * t_x)
    path = sequence_mask(cum_duration_flat, t_y).astype(mask.dtype)
    path = path.reshape(b, t_x, t_y)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def duration_loss(logw: jnp.ndarray, logw_: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """MSE between predicted and target log-durations, normalised by total
    token count (reference: matcha/utils/model.py:44-46)."""
    return jnp.sum((logw - logw_) ** 2) / jnp.sum(lengths)


def normalize(data: jnp.ndarray, mu, std) -> jnp.ndarray:
    """Normalize mel features: (data - mu) / std.

    ``data`` is (..., n_feats, T) [channel-first, matching stored mels] or
    any shape broadcastable against scalar statistics.
    """
    mu = _as_stat(mu, data)
    std = _as_stat(std, data)
    return (data - mu) / std


def denormalize(data: jnp.ndarray, mu, std) -> jnp.ndarray:
    """Inverse of :func:`normalize`."""
    mu = _as_stat(mu, data)
    std = _as_stat(std, data)
    return data * std + mu


def _as_stat(v, data: jnp.ndarray):
    if isinstance(v, (float, int)):
        return v
    v = jnp.asarray(v, dtype=data.dtype)
    if v.ndim == 1:
        # Per-channel stats broadcast over the trailing time axis.
        v = v[:, None]
    return v


def intersperse_ids(ids: np.ndarray, item: int = 0) -> np.ndarray:
    """Vectorized blank-interleave for numpy id arrays (host-side)."""
    ids = np.asarray(ids)
    out = np.full(2 * ids.shape[-1] + 1, item, dtype=ids.dtype)
    out[1::2] = ids
    return out


def convert_pad_shape(pad_shape):
    """Torch-style pad-shape converter kept for API parity."""
    inverted = pad_shape[::-1]
    return [item for sublist in inverted for item in sublist]
