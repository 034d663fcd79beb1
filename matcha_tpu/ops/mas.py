"""Monotonic Alignment Search — implementation dispatch.

``maximum_path(value, mask)`` is the single entry point used by the model
(the analog of matcha/utils/monotonic_align/__init__.py:7-22, minus the
device->host round-trip). Three interchangeable backends:

* ``pallas``: Pallas TPU kernel (default on TPU) — batch-parallel grid,
  VPU-vectorized band updates.
* ``scan``: pure-JAX `lax.scan` (default elsewhere; also the autodiff-safe
  and interpret-mode implementation).
* ``cpp``: native C++/OpenMP host kernel (numpy in/out; offline tools).

All three produce bit-identical paths (tested in tests/test_mas.py).
"""

from functools import partial

import jax
import jax.numpy as jnp

from matcha_tpu.ops.mas_ref import maximum_path_jax


def _default_impl() -> str:
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" else "scan"


@partial(jax.jit, static_argnames=("impl",))
def maximum_path(value: jnp.ndarray, mask: jnp.ndarray, impl: str = None) -> jnp.ndarray:
    """Find the most likely monotonic alignment path.

    Args:
        value: (B, T_x, T_y) log-prior grid (gradients are stopped, matching
            the reference's ``torch.no_grad()`` + ``detach`` usage).
        mask: (B, T_x, T_y) 0/1 attention mask.
        impl: 'pallas' | 'scan' | None (auto by backend).

    Returns:
        (B, T_x, T_y) binary path in the dtype of ``mask``.
    """
    if impl is None:
        impl = _default_impl()
    value = jax.lax.stop_gradient(value)
    mask = jax.lax.stop_gradient(mask)
    if impl == "pallas":
        from matcha_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(value, mask)
    if impl == "scan":
        return maximum_path_jax(value, mask)
    raise ValueError(f"Unknown MAS impl: {impl!r}")


def maximum_path_numpy(value, mask):
    """Host-side MAS on numpy arrays via the native C++ kernel."""
    from matcha_tpu.ops.mas_cpp import maximum_path_cpp

    return maximum_path_cpp(value, mask)
