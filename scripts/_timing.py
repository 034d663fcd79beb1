"""Shared measurement primitive for the profiling scripts.

The tunnel-attached TPU returns from ``block_until_ready()`` before the
device finishes, so any honest timing must (a) queue several dispatches
back-to-back with VARIED device-resident inputs (identical (executable,
inputs) pairs appear to be deduped), and (b) force completion with ONE
data fetch at the end. Even then, per-dispatch host overhead is NOT
hidden at n<=30 — standalone timings of sub-20 ms graphs overstate them
2-3x; use prefix-graph differencing (scripts/profile_vocoder_stages.py)
for per-stage truth and treat these numbers as A/B-comparable, not
absolute (PERFORMANCE.md "Pitfalls").
"""

import time

import jax
import numpy as np


def timeit(fn, inputs, n):
    outs = [fn(x) for x in inputs[:2]]  # warm compile
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    res = [fn(inputs[i % len(inputs)]) for i in range(n)]
    leaf = jax.tree_util.tree_leaves(res[-1])[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    dt = (time.perf_counter() - t0) / n
    jax.block_until_ready(res)
    return dt


def timeit_dispatch(dispatch, fetch, n):
    """Dispatch/fetch-style variant (scripts/mfu.py, bench_decode_b8.py):
    queue n varied dispatches, force completion with one data fetch. The
    first n-loop is the warmup; only the second is timed.

    Inputs must be PREPARED (device-resident) before entry: anything like
    fold_in/asarray inside ``dispatch`` adds host->device dispatches to
    the timed loop and inflates per-step time ~2x through the tunnel.
    """
    outs = [dispatch(i) for i in range(n)]
    fetch(outs[-1])
    t0 = time.perf_counter()
    outs = [dispatch(n + i) for i in range(n)]
    fetch(outs[-1])
    return (time.perf_counter() - t0) / n


def cost_of(lowered_compiled):
    """(flops, bytes accessed) from XLA's cost analysis of a compiled fn."""
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
