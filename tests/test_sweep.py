"""Hyperparameter sweep: TPE sampler + override-syntax driver.

The reference wires an optuna TPE sweeper through Hydra multirun
(/root/reference/configs/hparams_search/mnist_optuna.yaml,
sampler=optuna.samplers.TPESampler); here the sampler is from scratch
(matcha_tpu/training/sweep.py) and these tests check it actually
optimizes — not just samples."""

import math
import random

from matcha_tpu.training.sweep import (TPESampler, parse_space, run_sweep,
                                       sample_param)


def test_parse_space_and_sample():
    rng = random.Random(0)
    s = parse_space("loguniform(1e-5, 1e-3)")
    assert s == {"kind": "loguniform", "lo": 1e-5, "hi": 1e-3}
    for _ in range(50):
        v = sample_param("loguniform(1e-5, 1e-3)", rng)
        assert 1e-5 <= v <= 1e-3
    # the reference's optuna configs use interval() for uniform ranges
    assert parse_space("interval(0.0001, 0.1)")["kind"] == "uniform"
    assert parse_space("choice(32, 64, 128)")["options"] == ["32", "64", "128"]
    assert parse_space([1, 2])["options"] == [1, 2]
    assert parse_space(7)["kind"] == "const"


def _optimize(sampler_like, spaces, objective, n_trials, seed):
    """Run a black-box loop; sampler_like=None means pure random."""
    rng = random.Random(seed)
    history = []
    for _ in range(n_trials):
        if sampler_like is None:
            params = {k: sample_param_raw(s, rng) for k, s in spaces.items()}
        else:
            params = sampler_like.suggest(spaces, history)
        history.append((params, objective(params)))
    return history


def sample_param_raw(space, rng):
    from matcha_tpu.training.sweep import _sample_space

    return _sample_space(space, rng)


def test_tpe_concentrates_on_continuous_optimum():
    """Quadratic bowl in log10(lr), minimum at 1e-4: after the startup
    phase TPE proposals must concentrate near the optimum — strictly
    tighter than its own random startup trials, and the final best must
    be much closer than the domain scale."""
    spaces = {"lr": parse_space("loguniform(1e-6, 1e-1)")}

    def objective(p):
        return (math.log10(p["lr"]) + 4.0) ** 2

    tpe = TPESampler(seed=7, n_startup=6)
    hist = _optimize(tpe, spaces, objective, n_trials=40, seed=7)
    startup_vals = [v for _, v in hist[:6]]
    tpe_vals = [v for _, v in hist[6:]]
    assert min(v for _, v in hist) < 0.25  # |log10(lr)+4| < 0.5 decades
    # proposals after startup beat the random startup on average
    assert (sum(tpe_vals) / len(tpe_vals)
            < 0.5 * sum(startup_vals) / len(startup_vals))


def test_tpe_beats_random_on_same_budget():
    spaces = {"x": parse_space("uniform(-10, 10)"),
              "y": parse_space("uniform(-10, 10)")}

    def objective(p):
        return (p["x"] - 3.0) ** 2 + (p["y"] + 2.0) ** 2

    best_tpe, best_rand = [], []
    for seed in range(5):
        h_tpe = _optimize(TPESampler(seed=seed, n_startup=8), spaces,
                          objective, n_trials=40, seed=seed)
        h_rnd = _optimize(None, spaces, objective, n_trials=40, seed=seed)
        best_tpe.append(min(v for _, v in h_tpe))
        best_rand.append(min(v for _, v in h_rnd))
    assert sum(best_tpe) < sum(best_rand)  # aggregate over 5 seeds


def test_tpe_categorical_prefers_good_option():
    spaces = {"act": parse_space("choice(relu, gelu, snake)")}

    def objective(p):
        return {"relu": 3.0, "gelu": 1.0, "snake": 2.0}[p["act"]]

    tpe = TPESampler(seed=3, n_startup=6)
    hist = _optimize(tpe, spaces, objective, n_trials=30, seed=3)
    post = [p["act"] for p, _ in hist[6:]]
    assert post.count("gelu") > len(post) // 2


def test_tpe_ignores_nan_trials():
    spaces = {"x": parse_space("uniform(0, 1)")}
    tpe = TPESampler(seed=0, n_startup=2)
    history = [({"x": 0.5}, float("nan"))] * 10 + [
        ({"x": 0.2}, 1.0), ({"x": 0.8}, 2.0), ({"x": 0.25}, 0.5)]
    out = tpe.suggest(spaces, history)
    assert 0.0 <= out["x"] <= 1.0


def test_run_sweep_with_injected_objective():
    """End-to-end through the config tree (hparams_search=matcha_optuna is
    kind: tpe): the injected objective sees each trial's composed config
    with the proposed lr applied, and the returned best tracks it."""
    seen = []

    def objective(cfg):
        lr = float(cfg["model"]["optimizer"]["lr"])
        seen.append(lr)
        return {"loss/val": (math.log10(lr) + 4.0) ** 2}

    best = run_sweep(
        ["hparams_search=matcha_optuna", "run_name=sweeptest",
         "hparams_search.sweeper.n_trials=12",
         "hparams_search.sweeper.n_startup_trials=4"],
        objective=objective)
    assert len(seen) == 12
    assert all(1e-5 <= lr <= 1e-3 for lr in seen)
    assert best["metric"] == min((math.log10(lr) + 4.0) ** 2 for lr in seen)
    assert best["params"] is not None and "model.optimizer.lr" in best["params"]
