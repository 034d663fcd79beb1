"""Matcha-TPU: a TPU-native text-to-speech framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Matcha-TTS
(non-autoregressive TTS trained with optimal-transport conditional flow
matching), designed TPU-first:

* all compute-path code is JAX (flax modules, functional transforms),
* shapes are static inside ``jit`` via length bucketing,
* the ODE solver is a ``lax.scan``,
* Monotonic Alignment Search runs on-device (Pallas TPU kernel with a
  pure-JAX reference implementation and a C++/OpenMP host kernel),
* multi-device scaling uses ``jax.sharding.Mesh`` + ``pjit`` collectives.

Reference capability map: see SURVEY.md at the repo root.
"""

import os

_VERSION_FILE = os.path.join(os.path.dirname(__file__), "VERSION")
with open(_VERSION_FILE, encoding="utf-8") as _f:
    __version__ = _f.read().strip()

from matcha_tpu.utils.pylogger import get_pylogger  # noqa: E402,F401
