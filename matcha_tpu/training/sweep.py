"""Hyperparameter sweeps (the reference's optuna-sweeper stub analog).

The reference ships an Optuna sweeper config
(configs/hparams_search/mnist_optuna.yaml) wired through Hydra multirun.
Optuna isn't a dependency here; this module provides grid/random sweeps
over the same override syntax, optimizing the metric named by
``optimized_metric``:

    python -m matcha_tpu.training.sweep hparams_search=optuna_stub \\
        experiment=ljspeech trainer.max_steps=200
"""

import math
import random
import re
import sys
from typing import Any, Dict, List

from matcha_tpu.utils.config import compose
from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)

_DIST_RE = re.compile(r"(loguniform|uniform|choice)\((.*)\)")


def sample_param(spec: Any, rng: random.Random) -> Any:
    """Sample one value from a distribution spec string.

    Supported: ``loguniform(lo, hi)``, ``uniform(lo, hi)``,
    ``choice(a, b, c)``, or a plain list (grid handled by caller).
    """
    if isinstance(spec, list):
        return rng.choice(spec)
    m = _DIST_RE.fullmatch(str(spec).strip())
    if not m:
        return spec
    kind, argstr = m.groups()
    args = [a.strip() for a in argstr.split(",")]
    if kind == "loguniform":
        lo, hi = float(args[0]), float(args[1])
        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    if kind == "uniform":
        return rng.uniform(float(args[0]), float(args[1]))
    return rng.choice(args)


def run_sweep(base_overrides: List[str]) -> Dict[str, Any]:
    cfg = compose("train", overrides=base_overrides)
    sweeper = cfg.get("hparams_search", {}).get("sweeper", {})
    metric_name = cfg.get("hparams_search", {}).get("optimized_metric", "loss/val")
    params: Dict[str, Any] = dict(sweeper.get("params", {}))
    n_trials = int(sweeper.get("n_trials", 5))
    rng = random.Random(int(cfg.get("seed", 1234)))

    from matcha_tpu.train import train

    best = {"metric": float("inf"), "overrides": None}
    for trial in range(n_trials):
        trial_overrides = list(base_overrides)
        for key, spec in params.items():
            trial_overrides.append(f"{key}={sample_param(spec, rng)}")
        trial_overrides.append(f"run_name={cfg.get('run_name', 'sweep')}_t{trial}")
        trial_cfg = compose("train", overrides=trial_overrides)
        log.info(f"[sweep] trial {trial}: {trial_overrides[-len(params)-1:]}")
        metric_dict, _ = train(trial_cfg)
        value = float(metric_dict.get(metric_name, float("nan")))
        log.info(f"[sweep] trial {trial}: {metric_name}={value}")
        if value == value and value < best["metric"]:
            best = {"metric": value, "overrides": trial_overrides}
    log.info(f"[sweep] best {metric_name}={best['metric']}: {best['overrides']}")
    return best


def main(argv=None) -> None:
    import logging

    logging.basicConfig(level=logging.INFO)
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(o.startswith("hparams_search=") for o in argv):
        argv.append("hparams_search=optuna_stub")
    run_sweep(argv)


if __name__ == "__main__":
    main()
