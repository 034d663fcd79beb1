"""Tensor-parallel validation at FLAGSHIP scale (VERDICT r2 item 4).

Round 2 only exercised the 'model' mesh axis on a toy 16-feat config, so
a rename anywhere in the flagship param tree could silently rot the
``_TP_RULES`` regexes (parallel/mesh.py:41-62) into matching nothing —
everything would replicate and no test would fail. These tests pin:

1. every TP rule fires against the real ~18M-param tree (pattern-rot
   guard), with an exact count of sharded leaves,
2. a model=2 train step is numerically equivalent to model=1 at flagship
   dims on the 8-virtual-device CPU mesh (GSPMD psum correctness).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from matcha_tpu.models import MatchaTTS
from matcha_tpu.parallel.mesh import (
    _TP_RULES,
    make_mesh,
    make_param_shardings,
    param_pspec,
    replicated,
    shard_batch,
)


def _flat_paths(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flat_paths(v, p)
        else:
            yield p, v


def _flagship_init(model):
    x = jnp.zeros((1, 8), jnp.int32)
    xl = jnp.array([8])
    return model.init(
        {"params": jax.random.PRNGKey(0)}, x, xl, jax.random.PRNGKey(1),
        n_timesteps=1, y_max_length=8, method=MatchaTTS.synthesise)


@pytest.fixture(scope="module")
def flagship_params():
    """Flagship (LJSpeech-scale) params via the cheapest init path."""
    model = MatchaTTS()  # 18M defaults (configs/model/matcha.yaml scale)
    return model, _flagship_init(model)


def test_tp_rules_match_flagship_param_tree():
    """Pattern-rot guard: EVERY rule must match >=1 real param path, and
    the total sharded-leaf count is pinned so a silent partial rot (some
    rules firing, some not) also fails.

    Uses ``jax.eval_shape`` — the guard needs the flagship param TREE
    (paths + shapes), not values; tracing it costs seconds where a real
    18M init + compile cost ~2.5 min of the fast suite."""
    model = MatchaTTS()
    params = jax.eval_shape(lambda: _flagship_init(model))
    paths = dict(_flat_paths(params["params"]))
    n_total = sum(v.size for v in paths.values())

    per_rule = {pattern: 0 for pattern, _ in _TP_RULES}
    sharded = {}
    for p, v in paths.items():
        spec = param_pspec(p, v.shape, n_model=2)
        if any(ax == "model" for ax in spec):
            sharded[p] = v
        for pattern, _ in _TP_RULES:
            if re.match(pattern, p):
                per_rule[pattern] += 1

    dead = [pat for pat, n in per_rule.items() if n == 0]
    assert not dead, f"TP rules matching NO flagship param (pattern rot): {dead}"

    # encoder: 6 layers x (ffn conv_1 k+b, conv_2 k, qkv 3k+3b, o k) = 60
    enc = [p for p in sharded if "ffn_layers" in p or "attn_layers" in p]
    assert len(enc) == 60, sorted(enc)
    # decoder: 6 transformer blocks (2 down + 2 mid + 2 up) x
    # (qkv 3, out 1, ff act proj k+b + alpha + beta, proj_out 1) = 54
    dec = [p for p in sharded if "/attn1/" in p or "/ff/" in p]
    assert len(dec) == 54, sorted(dec)
    # time MLP: linear_1 k+b, linear_2 k
    tmlp = [p for p in sharded if "time_mlp" in p]
    assert len(tmlp) == 3, sorted(tmlp)
    assert len(sharded) == 117

    # the rules must cover the bulk of the wide projections: >=45% of all
    # parameter elements shard over 'model' at the flagship scale
    n_sharded = sum(v.size for v in sharded.values())
    assert n_sharded / n_total > 0.45, (n_sharded, n_total)

    # and make_param_shardings agrees: building the sharding tree for a
    # (4, 2) mesh yields exactly that many non-replicated leaves (the
    # slow model=2-vs-model=1 test below actually PLACES params on the
    # mesh and checks the math)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = make_param_shardings(params, mesh)
    n_nonrep = sum(
        1 for _, s in _flat_paths(shardings["params"])
        if any(ax is not None for ax in s.spec))
    assert n_nonrep == 117


@pytest.mark.slow
def test_tp_model2_matches_model1_at_flagship_dims(flagship_params):
    """One flagship train step: mesh (4 data x 2 model) and (8 data x 1)
    must produce the same loss/grad-norm (GSPMD inserts the psums; the
    math must not change)."""
    from matcha_tpu.training.trainer import TrainState, make_optimizer, make_train_step

    model, params = flagship_params
    B, T_x, T_y = 8, 12, 24
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.integers(1, 178, size=(B, T_x)).astype(np.int32),
        "x_lengths": np.full((B,), T_x, np.int32),
        "y": rng.normal(size=(B, T_y, 80)).astype(np.float32),
        "y_lengths": np.full((B,), T_y, np.int32),
        "spks": None,
    }
    tx = make_optimizer()
    # host copy: the train step donates its state, and device_put with an
    # identical sharding is a no-copy — donating the module-scoped fixture
    # arrays would delete them for the second run
    params_host = jax.device_get(params)

    def one_step(n_model):
        mesh = make_mesh(n_data=8 // n_model, n_model=n_model)
        p = jax.device_put(params_host, make_param_shardings(params, mesh))
        opt_state = jax.device_put(tx.init(params_host), replicated(mesh))
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=p, opt_state=opt_state)
        step_fn = make_train_step(model, tx)
        state, metrics = step_fn(state, shard_batch(batch, mesh), jax.random.PRNGKey(2))
        return state, {k: float(v) for k, v in metrics.items()}

    state1, m1 = one_step(1)
    flat1 = dict(_flat_paths(jax.device_get(state1.params)["params"]))
    # model=2 (4x2 mesh) and model=4 (2x4 mesh — VERDICT r4 item 8: the
    # mesh-generality claim needs a TP degree beyond 2) must both agree
    # with the pure-DP 8x1 run.
    for n_model in (2, 4):
        state_n, m_n = one_step(n_model)
        assert np.isfinite(m1["loss"]) and np.isfinite(m_n["loss"])
        np.testing.assert_allclose(m_n["loss"], m1["loss"], rtol=2e-5)
        for k in m1:
            np.testing.assert_allclose(m_n[k], m1[k], rtol=1e-3, err_msg=k)
        # updated params agree leaf-for-leaf (the psum placement is exact)
        flat_n = dict(_flat_paths(jax.device_get(state_n.params)["params"]))
        worst = max(np.max(np.abs(flat1[k] - flat_n[k])) for k in flat1)
        assert worst < 5e-5, f"model={n_model} diverges from model=1 by {worst}"
