"""Device mesh + sharding rules (the SPMD scaling layer).

The reference scales with Lightning DDP over NCCL
(configs/trainer/ddp.yaml; SURVEY.md §2.3-2.4). Here scaling is a
``jax.sharding.Mesh`` with two axes:

* ``data`` — batch sharding (the DDP analog). Gradients all-reduce over
  ICI automatically when the loss is jitted with sharded batch inputs and
  replicated (or TP-sharded) params.
* ``model`` — optional tensor parallelism for the wide projections
  (encoder FFN 192->768, decoder FF 256->1024, attention heads),
  Megatron-style column/row splits expressed as PartitionSpecs; XLA/GSPMD
  inserts the psums.

The model is ~18M params, so TP is never required for memory — the axis
exists so the mesh layout generalizes (and for latency experiments).
"""

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"mesh {n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Tensor-parallel rules: path regex -> PartitionSpec for the param.
# Column-split (shard output features) then row-split (shard input
# features) so each attention/FFN pair needs a single psum.
_TP_RULES = [
    # encoder conv FFN: conv_1 (k, C, F) col / conv_2 (k, F, C) row
    (r".*ffn_layers_\d+/conv_1/conv/kernel$", P(None, None, "model")),
    (r".*ffn_layers_\d+/conv_1/conv/bias$", P("model")),
    (r".*ffn_layers_\d+/conv_2/conv/kernel$", P(None, "model", None)),
    # encoder attention: q/k/v col, o row
    (r".*attn_layers_\d+/conv_[qkv]/kernel$", P(None, "model")),
    (r".*attn_layers_\d+/conv_[qkv]/bias$", P("model")),
    (r".*attn_layers_\d+/conv_o/kernel$", P("model", None)),
    # decoder transformer attention
    (r".*/attn1/to_[qkv]/kernel$", P(None, "model")),
    (r".*/attn1/to_out/kernel$", P("model", None)),
    # decoder snakebeta FF
    (r".*/ff/act/proj/kernel$", P(None, "model")),
    (r".*/ff/act/proj/bias$", P("model")),
    (r".*/ff/act/(alpha|beta)$", P("model")),
    (r".*/ff/proj_out/kernel$", P("model", None)),
    # time MLP
    (r".*/time_mlp/linear_1/kernel$", P(None, "model")),
    (r".*/time_mlp/linear_1/bias$", P("model")),
    (r".*/time_mlp/linear_2/kernel$", P("model", None)),
]


def param_pspec(path: str, shape, n_model: int) -> P:
    """PartitionSpec for one param path under the TP rules (replicated if
    no rule matches or the sharded dim is not divisible)."""
    if n_model > 1:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, path):
                ok = True
                for dim, axis in zip(shape, spec):
                    if axis == "model" and dim % n_model != 0:
                        ok = False
                if ok and len(spec) <= len(shape):
                    return spec
    return P()


def _flatten_paths(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten_paths(v, p)
        else:
            yield p, v


def make_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for the params under the TP rules."""
    n_model = mesh.shape.get("model", 1)

    def walk(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = walk(v, p)
            else:
                out[k] = NamedSharding(mesh, param_pspec(p, v.shape, n_model))
        return out

    return walk(params)


def batch_sharding(mesh: Mesh):
    """NamedSharding that splits the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def is_trivial(mesh: Mesh) -> bool:
    return mesh.devices.size == 1


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices of more than one JAX process."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch on the mesh, batch axis over 'data'.

    * Single-device mesh: plain placement (NamedSharding-committed arrays
      force a reshard round-trip per step on remote-attached devices —
      measured 4000x slower through the axon tunnel).
    * Multi-process mesh (multi-host DP, SURVEY §2.4): each process feeds
      its PER-PROCESS batch; the global array is assembled from the
      process-local shards without any cross-host copy
      (``jax.make_array_from_process_local_data``). The effective global
      batch is local_batch x process_count.
    * Single-process multi-device: device_put with the data sharding;
      falls back to replication when the batch does not divide the data
      axis (tiny debug batches) — correct, just not parallel.
    """
    if is_trivial(mesh):
        dev = mesh.devices.reshape(-1)[0]
        return {k: (None if v is None else jax.device_put(v, dev)) for k, v in batch.items()}
    n_data = mesh.shape.get("data", 1)
    if is_multiprocess(mesh):
        pcount = len({d.process_index for d in mesh.devices.flat})
        bs = batch_sharding(mesh)
        out = {}
        for k, v in batch.items():
            if v is None:
                out[k] = None
                continue
            assert (v.shape[0] * pcount) % n_data == 0, (
                f"per-process batch {v.shape[0]} x {pcount} processes must divide "
                f"the data axis ({n_data})"
            )
            out[k] = jax.make_array_from_process_local_data(bs, np.asarray(v))
        return out
    sizes = [v.shape[0] for v in batch.values() if v is not None]
    divisible = sizes and all(s % n_data == 0 for s in sizes)
    bs = batch_sharding(mesh) if divisible else replicated(mesh)
    out = {}
    for k, v in batch.items():
        out[k] = None if v is None else jax.device_put(v, bs)
    return out
