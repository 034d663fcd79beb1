"""Multi-host bootstrap: the NCCL/DDP-rank-management replacement.

The reference delegates multi-process setup to Lightning DDP over NCCL
(configs/trainer/ddp.yaml; SURVEY.md §2.4). In JAX the equivalent is a
single call to ``jax.distributed.initialize()`` per process, after which

* ``jax.devices()`` is the GLOBAL device list (all hosts),
* ``jax.process_index()/process_count()`` replace DDP ranks,
* collectives (grad all-reduce via GSPMD, ``multihost_utils`` for metric
  aggregation) ride ICI within a slice and DCN across slices.

Call :func:`maybe_initialize_distributed` before the first backend touch
(done by ``matcha_tpu.train.main``). It is a no-op unless the environment
opts in, so single-host runs and tests are unaffected.

Environment contract (either style):
* TPU pods / auto-detection: ``MATCHA_DIST=1`` ->
  ``jax.distributed.initialize()`` with no args (JAX discovers the
  coordinator from the TPU metadata).
* Explicit (CPU/GPU clusters, tests): ``MATCHA_COORDINATOR_ADDRESS``,
  ``MATCHA_NUM_PROCESSES``, ``MATCHA_PROCESS_ID``.
"""

import os
from typing import Optional

from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

_initialized = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's distributed runtime if configured; returns True if
    multi-process mode is active after the call.

    Arguments override the ``MATCHA_*`` environment variables. Safe to call
    more than once (subsequent calls are no-ops).
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1

    coordinator_address = coordinator_address or os.environ.get("MATCHA_COORDINATOR_ADDRESS")
    env_np = os.environ.get("MATCHA_NUM_PROCESSES")
    env_pid = os.environ.get("MATCHA_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (int(env_pid) if env_pid else None)

    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
        log.info(
            f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()} "
            f"coordinator={coordinator_address}"
        )
        return jax.process_count() > 1

    if os.environ.get("MATCHA_DIST") == "1":
        # TPU-pod auto-detection path: coordinator/process topology comes
        # from the TPU runtime metadata.
        jax.distributed.initialize()
        _initialized = True
        log.info(
            f"jax.distributed initialized (auto): process "
            f"{jax.process_index()}/{jax.process_count()}"
        )
        return jax.process_count() > 1

    return False
