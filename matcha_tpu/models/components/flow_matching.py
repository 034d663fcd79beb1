"""Optimal-transport conditional flow matching (OT-CFM).

Rebuild of the reference CFM (matcha/models/components/flow_matching.py):
inference draws z ~ N(0, T^2 I) and integrates the learned vector field
with a fixed-step Euler solver; training regresses the estimator onto the
straight-line conditional flow ``u = x1 - (1 - sigma_min) z`` at
``y_t = (1 - (1 - sigma_min) t) z + t x1`` with a masked MSE.

TPU-native design: the Euler loop is a single ``lax.scan`` over the
(t, dt) schedule — one compiled graph regardless of n_timesteps
(reference loops in Python, flow_matching.py:76-84); randomness is
explicit ``jax.random`` keys.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def euler_schedule(n_timesteps: int) -> jnp.ndarray:
    """Uniform t_span in [0, 1] with n_timesteps+1 points."""
    return jnp.linspace(0.0, 1.0, n_timesteps + 1)


def solve_euler(
    estimator: Callable,
    x: jnp.ndarray,
    t_span: jnp.ndarray,
    mu: jnp.ndarray,
    mask: jnp.ndarray,
    spks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fixed-step Euler ODE solver as a lax.scan.

    Args:
        estimator: fn(x, mask, mu, t, spks) -> dphi/dt, the U-Net decoder.
        x: (B, T, C) initial noise.
        t_span: (n+1,) time points (need not be uniform).
        mu: (B, T, C) aligned encoder means.
        mask: (B, T, 1).

    Returns:
        (B, T, C) terminal sample.
    """
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]

    def step(x, t_dt):
        t, dt = t_dt
        dphi_dt = estimator(x, mask, mu, t, spks)
        # dt is f32 (euler_schedule); cast so a bf16 x stays bf16 across
        # the scan carry instead of promoting the whole loop to f32.
        return x + dt.astype(x.dtype) * dphi_dt, None

    x, _ = jax.lax.scan(step, x, (ts, dts))
    return x


def cfm_sample(
    estimator: Callable,
    key: jax.Array,
    mu: jnp.ndarray,
    mask: jnp.ndarray,
    n_timesteps: int,
    temperature: float = 1.0,
    spks: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Generate a sample by integrating the probability flow from noise."""
    # Draw the noise in f32 and cast: a bf16 compute path (mu.dtype ==
    # bfloat16, TTSPipeline bf16_latency) then starts from the same z as
    # the f32 path (modulo rounding) — keys stay comparable across modes.
    z = jax.random.normal(key, mu.shape, dtype=jnp.float32).astype(mu.dtype) * temperature
    t_span = euler_schedule(n_timesteps)
    return solve_euler(estimator, z, t_span, mu, mask, spks)


def cfm_loss(
    estimator: Callable,
    key: jax.Array,
    x1: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    spks: Optional[jnp.ndarray] = None,
    sigma_min: float = 1e-4,
):
    """Conditional flow-matching loss.

    Matches the reference normalisation (flow_matching.py:115-117): the
    squared error is summed over the full padded tensor and divided by
    (sum(mask) * n_feats). The estimator output is masked, so padded
    positions contribute the constant ||u_pad||^2 with zero gradient —
    we keep that for loss-curve comparability with the reference.

    Returns:
        (loss, y_t)
    """
    b = mu.shape[0]
    k_t, k_z = jax.random.split(key)
    t = jax.random.uniform(k_t, (b, 1, 1), dtype=mu.dtype)
    z = jax.random.normal(k_z, x1.shape, dtype=x1.dtype)

    y = (1.0 - (1.0 - sigma_min) * t) * z + t * x1
    u = x1 - (1.0 - sigma_min) * z

    pred = estimator(y, mask, mu, t[:, 0, 0], spks)
    loss = jnp.sum((pred - u) ** 2) / (jnp.sum(mask) * u.shape[-1])
    return loss, y
