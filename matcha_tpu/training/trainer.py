"""Training harness: optax + mesh-sharded jit train step + orbax ckpts.

The TPU-native replacement for the reference's Lightning stack
(matcha/train.py + matcha/models/baselightningmodule.py):

* one jitted SPMD ``train_step`` over a (data, model) Mesh — batch sharded
  on ``data``; gradient all-reduce is inserted by GSPMD (the DDP analog);
* optax Adam(1e-4) + global-norm clipping 5.0
  (configs/model/optimizer/adam.yaml, trainer/default.yaml);
* metric names match the reference's loggers exactly
  (``loss/train``, ``sub_loss/train_dur_loss``, ..., ``grad_norm/*`` —
  baselightningmodule.py:78-165,208) so dashboards transfer;
* orbax checkpoints with save_last / every_n_epochs / top-k semantics
  (configs/callbacks/model_checkpoint.yaml);
* rank-zero validation image logging (original / generated_enc /
  generated_dec / alignment — baselightningmodule.py:167-206);
* debug presets: fast_dev_run, overfit_batches, limit_*, detect_anomaly
  (jax_debug_nans), jax.profiler traces (configs/debug/*).

Mixed precision: params/optimizer state are f32; on TPU the matmuls/convs
run with bf16 inputs through the MXU by XLA's default f32 precision
policy — the TPU-idiomatic replacement for the reference's fp16-mixed +
loss scaling (SURVEY.md §2.3).
"""

import functools
import itertools
import os
import sys
import time
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from matcha_tpu.models.matcha import MatchaTTS
from matcha_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_param_shardings,
    replicated,
    shard_batch,
)
from matcha_tpu.utils.checkpoints import save_native_checkpoint
from matcha_tpu.utils.pylogger import get_pylogger

log = get_pylogger(__name__)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_schedule(lr: float, scheduler: Optional[dict] = None):
    """LR schedule from a config dict (the reference's lr_scheduler slot).

    None -> constant; {"name": "exponential", "gamma": g, "interval_steps": n}
    multiplies lr by g every n steps; {"name": "cosine", "decay_steps": n}.
    """
    if not scheduler:
        return lr
    name = scheduler.get("name", "exponential")
    if name == "exponential":
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=int(scheduler.get("interval_steps", 1000)),
            decay_rate=float(scheduler.get("gamma", 0.999)),
        )
    if name == "cosine":
        return optax.cosine_decay_schedule(
            init_value=lr, decay_steps=int(scheduler.get("decay_steps", 100_000))
        )
    raise ValueError(f"Unknown scheduler {name!r}")


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    gradient_clip_val: float = 5.0,
    scheduler: Optional[dict] = None,
):
    """Adam + global-norm clip (reference training protocol)."""
    schedule = make_schedule(lr, scheduler)
    chain = []
    if gradient_clip_val:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))
    if weight_decay:
        chain.append(optax.adamw(schedule, weight_decay=weight_decay))
    else:
        chain.append(optax.adam(schedule))
    return optax.chain(*chain)


def _cast_floats(tree, dtype):
    """Cast float leaves of a pytree to dtype (ints/None untouched)."""
    return jax.tree.map(
        lambda a: a.astype(dtype) if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )


def make_train_step(model: MatchaTTS, tx, out_size: Optional[int] = None,
                    precision: str = "f32"):
    """Build the jitted SPMD training step.

    ``precision="bf16-mixed"`` is the TPU-idiomatic analog of the
    reference's ``precision: 16-mixed`` (configs/trainer/default.yaml):
    master params + Adam moments + gradients stay f32; the forward/backward
    compute runs on bf16 copies of params and float batch inputs. bf16
    needs no loss scaling (same exponent range as f32)."""
    bf16 = precision in ("bf16", "bf16-mixed", "16-mixed")

    def loss_fn(params, batch, key, dropout_key):
        if bf16:
            params = _cast_floats(params, jnp.bfloat16)
            batch = {k: (_cast_floats(v, jnp.bfloat16) if k == "y" else v)
                     for k, v in batch.items()}
        dur, prior, diff, _ = model.apply(
            params,
            batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
            key, batch.get("spks"), out_size,
            durations=batch.get("durations"),
            rngs={"dropout": dropout_key},
            method=MatchaTTS.losses,
        )
        dur, prior, diff = (jnp.asarray(v, jnp.float32) for v in (dur, prior, diff))
        total = dur + prior + diff
        metrics = {"dur_loss": dur, "prior_loss": prior, "diff_loss": diff, "loss": total}
        return total, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray], base_key):
        key = jax.random.fold_in(base_key, state.step)
        k_loss, k_drop = jax.random.split(key)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, k_loss, k_drop
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step


def make_eval_step(model: MatchaTTS, out_size: Optional[int] = None):
    @jax.jit
    def eval_step(params, batch, key):
        dur, prior, diff, _ = model.apply(
            params,
            batch["x"], batch["x_lengths"], batch["y"], batch["y_lengths"],
            key, batch.get("spks"), out_size,
            durations=batch.get("durations"),
            method=MatchaTTS.losses,
        )
        return {"dur_loss": dur, "prior_loss": prior, "diff_loss": diff,
                "loss": dur + prior + diff}

    return eval_step


class MetricLogger:
    """Metric backends selected like the reference's configs/logger group
    (8 backends, /root/reference/configs/logger/*.yaml): tensorboard and
    CSV natively, plus wandb / mlflow / neptune / comet / aim adapters
    that activate when the client library is installed and degrade to a
    warning when it is not. No-op off process 0."""

    def __init__(self, logdir: Optional[str], csv_path: Optional[str] = None,
                 backends: Optional[Dict[str, dict]] = None):
        self.writer = None
        self._csv = None
        self._csv_fields = None
        self._external: list = []  # (name, log_scalars_fn, close_fn)
        if jax.process_index() != 0:
            return
        if logdir:
            try:
                from tensorboardX import SummaryWriter

                os.makedirs(logdir, exist_ok=True)
                self.writer = SummaryWriter(logdir)
            except ImportError:  # pragma: no cover
                log.warning("tensorboardX not available; metrics not persisted")
        if csv_path:
            os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
            self._csv_path = csv_path
            self._csv = open(csv_path, "a", encoding="utf-8", buffering=1)
        for name, cfg in (backends or {}).items():
            try:
                self._external.append(self._make_backend(name, dict(cfg or {})))
            except ImportError:
                log.warning(f"logger backend {name!r} requested but its client "
                            f"library is not installed; skipping")
            except Exception as e:  # pragma: no cover - backend-side failures
                log.warning(f"logger backend {name!r} failed to initialize: {e}")

    @staticmethod
    def _make_backend(name: str, cfg: dict):
        """Build one external backend -> (name, log_fn(metrics, step), close_fn).

        Mirrors the reference's config-selected Lightning loggers
        (configs/logger/{wandb,mlflow,neptune,comet,aim}.yaml)."""
        if name == "wandb":
            import wandb

            run = wandb.init(project=cfg.get("project", "matcha-tpu"),
                             name=cfg.get("name"), group=cfg.get("group") or None,
                             tags=cfg.get("tags") or None, reinit=True)
            return (name, lambda m, s: run.log(m, step=s), run.finish)
        if name == "mlflow":
            import mlflow

            if cfg.get("tracking_uri"):
                mlflow.set_tracking_uri(cfg["tracking_uri"])
            mlflow.start_run(run_name=cfg.get("run_name"))
            return (name,
                    lambda m, s: mlflow.log_metrics({k.replace("/", "_"): v for k, v in m.items()}, step=s),
                    mlflow.end_run)
        if name == "neptune":
            import neptune

            run = neptune.init_run(project=cfg.get("project"))
            return (name,
                    lambda m, s: [run[k].append(v, step=s) for k, v in m.items()],
                    run.stop)
        if name == "comet":
            import comet_ml

            exp = comet_ml.Experiment(project_name=cfg.get("project_name", "matcha-tpu"))
            return (name, lambda m, s: exp.log_metrics(m, step=s), exp.end)
        if name == "aim":
            import aim

            run = aim.Run(experiment=cfg.get("experiment", "matcha-tpu"))
            return (name,
                    lambda m, s: [run.track(v, name=k, step=s) for k, v in m.items()],
                    lambda: run.close())
        raise ImportError(f"unknown logger backend {name!r}")

    def scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self.writer:
            for k, v in metrics.items():
                self.writer.add_scalar(k, float(v), step)
        for _, log_fn, _ in self._external:
            log_fn({k: float(v) for k, v in metrics.items()}, step)
        if self._csv:
            new_fields = [k for k in sorted(metrics) if self._csv_fields is None or k not in self._csv_fields]
            if self._csv_fields is None:
                self._csv_fields = ["step"] + new_fields
                self._csv.write(",".join(self._csv_fields) + "\n")
            elif new_fields:
                # Key set grew (e.g. first validation pass adds val metrics):
                # rewrite the file with the widened header so the new columns
                # are not silently dropped.
                self._csv_fields += new_fields
                self._csv.flush()
                with open(self._csv_path, encoding="utf-8") as f:
                    lines = f.read().splitlines()
                body = lines[1:] if lines else []
                pad = "," * len(new_fields)
                self._csv.close()
                self._csv = open(self._csv_path, "w", encoding="utf-8", buffering=1)
                self._csv.write(",".join(self._csv_fields) + "\n")
                for line in body:
                    self._csv.write(line + pad + "\n")
            row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
            self._csv.write(",".join(str(row.get(f, "")) for f in self._csv_fields) + "\n")

    def image(self, tag: str, img: np.ndarray, step: int) -> None:
        if self.writer:
            self.writer.add_image(tag, img, step, dataformats="HWC")

    def hparams(self, hparams: dict) -> None:
        if self.writer:
            self.writer.add_text("hparams", "```\n" + "\n".join(f"{k}: {v}" for k, v in hparams.items()) + "\n```", 0)

    def close(self) -> None:
        if self.writer:
            self.writer.close()
        if self._csv:
            self._csv.close()
        for name, _, close_fn in self._external:
            try:
                close_fn()
            except Exception:  # pragma: no cover
                log.warning(f"logger backend {name!r} failed to close")


def summarize_params(params, max_depth: int = 3) -> str:
    """Parameter-count table grouped by module path up to ``max_depth``
    (the RichModelSummary analog, reference configs/callbacks/model_summary.yaml)."""
    from collections.abc import Mapping

    counts: Dict[str, int] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            key = "/".join(path[:max_depth]) or "(root)"
            counts[key] = counts.get(key, 0) + int(np.prod(np.shape(node)))

    walk(params.get("params", params) if isinstance(params, Mapping) else params, ())
    width = max([len(k) for k in counts] + [6])
    lines = [f"{'module':<{width}}  params"]
    lines += [f"{k:<{width}}  {v:,}" for k, v in sorted(counts.items())]
    lines.append(f"{'TOTAL':<{width}}  {sum(counts.values()):,}")
    return "\n".join(lines)


def prefetch_iterator(iterator, depth: int = 2):
    """Background-thread prefetch: overlap host-side data prep (espeak,
    STFT/mel) with device compute — the analog of the reference's
    dataloader worker pool (num_workers, configs/data/ljspeech.yaml)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


class Trainer:
    """Epoch-driven training loop (the Lightning Trainer analog)."""

    def __init__(
        self,
        model: MatchaTTS,
        datamodule,
        out_size: Optional[int] = None,
        lr: float = 1e-4,
        weight_decay: float = 0.0,
        gradient_clip_val: float = 5.0,
        max_epochs: int = -1,
        max_steps: int = -1,
        check_val_every_n_epoch: int = 1,
        log_every_n_steps: int = 10,
        output_dir: str = "logs/train/runs/default",
        seed: int = 1234,
        n_model_axis: int = 1,
        fast_dev_run: bool = False,
        overfit_batches: int = 0,
        limit_train_batches: Optional[float] = None,
        limit_val_batches: Optional[float] = None,
        detect_anomaly: bool = False,
        profiler: Optional[str] = None,
        save_every_n_epochs: int = 100,
        save_top_k: int = 10,
        monitor: str = "epoch",
        monitor_mode: str = "max",
        enable_checkpointing: bool = True,
        save_last: bool = True,
        model_summary_depth: int = 0,
        enable_progress_bar: bool = False,
        precision: str = "f32",
        devices="all",
        log_validation_images: bool = True,
        hparams: Optional[dict] = None,
        scheduler: Optional[dict] = None,
        loggers: Optional[dict] = None,
    ):
        self.model = model
        self.dm = datamodule
        self.out_size = out_size
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.log_every_n_steps = log_every_n_steps
        self.output_dir = output_dir
        self.seed = seed
        self.fast_dev_run = fast_dev_run
        self.overfit_batches = overfit_batches
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.profiler = profiler
        self.save_every_n_epochs = save_every_n_epochs
        self.save_top_k = save_top_k
        # Top-k checkpoints keep the best `monitor` values (reference
        # configs/callbacks/model_checkpoint.yaml monitors `epoch` max —
        # i.e. most-recent-k; `loss/val` min keeps the best-validating k).
        self.monitor = monitor
        self.monitor_mode = monitor_mode
        # callbacks group analogs (configs/callbacks/): `callbacks=none`
        # disables checkpoint writing entirely, like training without a
        # ModelCheckpoint callback in the reference.
        self.enable_checkpointing = enable_checkpointing
        self.save_last = save_last
        self.model_summary_depth = model_summary_depth
        self.enable_progress_bar = enable_progress_bar
        self.log_validation_images = log_validation_images
        self.hparams = hparams or {}
        self._start_epoch = 0
        self._last_val: Dict[str, float] = {}
        self._last_val_epoch: int = -1  # epochs_done of the last validation

        if detect_anomaly:
            jax.config.update("jax_debug_nans", True)

        # Data axis must divide the global batch; idle the extra devices
        # for tiny debug batches rather than failing. Multi-host: each
        # process contributes batch_size items, so the data axis is a
        # per-process slice count x process_count (the DDP analog —
        # global batch grows with hosts, like the reference's Lightning DDP).
        import math as _math

        device_pool = jax.devices()
        if isinstance(devices, (list, tuple)):
            # trainer.devices=[0,2] (reference Lightning semantics): use
            # exactly those local device indices, not merely that many.
            device_pool = [jax.devices()[int(i)] for i in devices]
        elif devices not in (None, "all", "auto", -1):
            # trainer.devices=N: cap how many local devices the mesh uses.
            device_pool = device_pool[: max(1, min(len(device_pool), int(devices)))]
        n_dev = len(device_pool)
        pcount = jax.process_count()
        local_bs = int(getattr(datamodule, "batch_size", n_dev))
        n_local = max(1, _math.gcd((n_dev // n_model_axis) // pcount, local_bs))
        n_data = n_local * pcount
        self.mesh = make_mesh(n_data=n_data, n_model=n_model_axis,
                              devices=device_pool[: n_data * n_model_axis])
        self.tx = make_optimizer(lr, weight_decay, gradient_clip_val, scheduler)
        self.train_step = make_train_step(model, self.tx, out_size, precision=precision)
        self.eval_step = make_eval_step(model, out_size)
        loggers = loggers if loggers is not None else {"tensorboard": {}}
        tb_dir = os.path.join(output_dir, "tensorboard") if "tensorboard" in loggers else None
        csv_path = os.path.join(output_dir, "csv", "metrics.csv") if "csv" in loggers else None
        external = {k: v for k, v in loggers.items() if k not in ("tensorboard", "csv")}
        self.logger = MetricLogger(tb_dir, csv_path, backends=external)
        # Top-k retention ledger. Persisted to checkpoints/topk.json so
        # rotation SURVIVES trainer restarts (the Lightning analog keeps
        # ModelCheckpoint.best_k_models inside the ckpt): a fresh Trainer
        # resuming from `last` must keep pruning the worst of the
        # previously-saved checkpoints, not accumulate k new ones on top
        # (caught by scripts/soak_train.py's rotation invariant).
        self._ckpt_epochs: list = []
        self._ckpt_seq = 0
        self._load_topk_ledger()

    def _topk_ledger_path(self) -> str:
        return os.path.join(self.output_dir, "checkpoints", "topk.json")

    def _load_topk_ledger(self) -> None:
        import json

        try:
            with open(self._topk_ledger_path()) as f:
                entries = json.load(f)
        except (OSError, ValueError):
            return
        ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        for score, seq, name in entries:
            path = os.path.join(ckpt_dir, name)
            if os.path.isdir(path):  # tolerate externally-deleted ckpts
                self._ckpt_epochs.append((float(score), int(seq), path))
                self._ckpt_seq = max(self._ckpt_seq, int(seq) + 1)

    def _save_topk_ledger(self) -> None:
        import json

        if jax.process_index() != 0:
            return
        entries = [(s, q, os.path.basename(p)) for s, q, p in self._ckpt_epochs]
        tmp = self._topk_ledger_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, self._topk_ledger_path())

    # ------------------------------------------------------------------
    def init_state(self, sample_batch: dict, restore_from: Optional[str] = None) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        if restore_from:
            from matcha_tpu.utils.checkpoints import load_native_checkpoint, restore_opt_state

            params, _, step, extra = load_native_checkpoint(restore_from)
            template = self.tx.init(params)
            if extra and extra.get("opt_leaves") is not None:
                # Full-state resume: Adam moments + schedule position continue
                # exactly (the reference restores optimizer/scheduler state,
                # baselightningmodule.py:35-43).
                opt_state = restore_opt_state(extra["opt_leaves"], template)
            else:
                log.warning("Checkpoint has no optimizer state; re-initialising Adam moments")
                opt_state = template
            self._start_epoch = int(extra.get("epoch", 0)) if extra else 0
            state = TrainState(step=jnp.asarray(step, jnp.int32), params=params, opt_state=opt_state)
            log.info(
                f"Restored checkpoint at step {step} (epoch {self._start_epoch}) from {restore_from}"
            )
        else:
            params = self.model.init(
                {"params": key},
                jnp.asarray(sample_batch["x"]), jnp.asarray(sample_batch["x_lengths"]),
                jnp.asarray(sample_batch["y"]), jnp.asarray(sample_batch["y_lengths"]),
                jax.random.PRNGKey(0),
                jnp.asarray(sample_batch["spks"]) if sample_batch.get("spks") is not None else None,
            )
            opt_state = self.tx.init(params)
            state = TrainState(step=jnp.asarray(0, jnp.int32), params=params, opt_state=opt_state)

        from matcha_tpu.parallel.mesh import is_trivial

        if is_trivial(self.mesh):
            # Single device: plain placement. Committed NamedShardings make
            # remote-attached (tunnel) devices reshard the whole state per
            # step (measured: 17.9 s vs 4.2 ms per training step).
            dev = self.mesh.devices.reshape(-1)[0]
            return jax.device_put(state, dev)
        shardings = make_param_shardings(state.params, self.mesh)
        params = jax.device_put(state.params, shardings)
        opt_state = jax.device_put(state.opt_state, replicated(self.mesh))
        return TrainState(step=jax.device_put(state.step, replicated(self.mesh)),
                          params=params, opt_state=opt_state)

    # ------------------------------------------------------------------
    def fit(self, restore_from: Optional[str] = None) -> Dict[str, float]:
        self.dm.setup()
        # The init batch comes off the FIRST trained epoch's own iterator
        # and is chained back in below, so it is computed once (phonemize +
        # mel-extract per item), not once for init and again in the epoch.
        init_iter = iter(self.dm.train_batches(
            self._start_epoch, limit=self.limit_train_batches))
        first = next(init_iter)
        state = self.init_state(first, restore_from)
        n_params = sum(p.size for p in jax.tree.leaves(state.params))
        log.info(f"Model parameters: {n_params/1e6:.2f}M | mesh: {dict(self.mesh.shape)}")
        if self.model_summary_depth > 0:
            log.info("Model summary:\n" + summarize_params(state.params, self.model_summary_depth))
        self.logger.hparams({**self.hparams, "n_params": n_params})

        base_key = jax.random.PRNGKey(self.seed + 17)
        last_metrics: Dict[str, float] = {}
        epoch = self._start_epoch  # completed epochs restored from the checkpoint
        max_epochs = (
            epoch + 1 if self.fast_dev_run  # fdr: always one step, even resumed
            else (self.max_epochs if self.max_epochs > 0 else 10**9)
        )

        stop = False
        while epoch < max_epochs and not stop:
            t_epoch = time.time()
            if self.overfit_batches:
                batches = []
                for i, b in enumerate(self.dm.train_batches(0)):
                    if i >= self.overfit_batches:
                        break
                    batches.append(b)
                train_iter = iter(batches)
            elif epoch == self._start_epoch and init_iter is not None:
                train_iter = prefetch_iterator(
                    itertools.chain([first], init_iter))
                init_iter = first = None  # consumed; later epochs re-iterate
            else:
                train_iter = prefetch_iterator(
                    self.dm.train_batches(epoch, limit=self.limit_train_batches)
                )

            for i, batch in enumerate(train_iter):
                if self.profiler == "jax" and i == 1 and epoch == 0:
                    jax.profiler.start_trace(os.path.join(self.output_dir, "profile"))
                dev_batch = shard_batch(batch, self.mesh)
                state, metrics = self.train_step(state, dev_batch, base_key)
                step = int(state.step)
                if self.profiler == "jax" and i == 3 and epoch == 0:
                    jax.tree.map(lambda x: x.block_until_ready(), metrics)
                    jax.profiler.stop_trace()
                if step % self.log_every_n_steps == 0 or self.fast_dev_run:
                    host = {k: float(v) for k, v in metrics.items()}
                    last_metrics = host
                    self.logger.scalars(
                        {
                            "step": step,
                            "loss/train": host["loss"],
                            "sub_loss/train_dur_loss": host["dur_loss"],
                            "sub_loss/train_prior_loss": host["prior_loss"],
                            "sub_loss/train_diff_loss": host["diff_loss"],
                            "grad_norm/total": host["grad_norm"],
                        },
                        step,
                    )
                    log.info(
                        f"epoch {epoch} step {step}: loss={host['loss']:.4f} "
                        f"(dur {host['dur_loss']:.4f} prior {host['prior_loss']:.4f} "
                        f"diff {host['diff_loss']:.4f}) grad_norm={host['grad_norm']:.3f}"
                    )
                if (self.enable_progress_bar and jax.process_index() == 0
                        and sys.stdout.isatty()):
                    # in-place step ticker (RichProgressBar analog); metric
                    # values only at log steps — fetching them every step
                    # would force a device sync per step.
                    print(f"\repoch {epoch} | step {step}"
                          + (f" | loss {last_metrics.get('loss', float('nan')):.4f}"
                             if last_metrics else ""),
                          end="", flush=True)
                if self.fast_dev_run or (self.max_steps > 0 and step >= self.max_steps):
                    stop = True
                    break

            if (epoch + 1) % self.check_val_every_n_epoch == 0 or self.fast_dev_run:
                val = self.validate(state, epoch)
                self._last_val = val
                self._last_val_epoch = epoch + 1  # matches _maybe_checkpoint's epochs_done
                last_metrics.update({f"val_{k}": v for k, v in val.items()})

            self._maybe_checkpoint(state, epochs_done=epoch + 1)
            log.info(f"epoch {epoch} done in {time.time()-t_epoch:.1f}s")
            epoch += 1

        # 'last' is maintained by _maybe_checkpoint every epoch (when
        # save_last is on); a second identical save here would both ignore
        # save_last=False and re-pay a full device->host state transfer.
        self.logger.close()
        self._final_state = state  # inspectable after fit (tests, eval)
        return {"loss/train": last_metrics.get("loss", float("nan")),
                "loss/val": last_metrics.get("val_loss", float("nan"))}

    # ------------------------------------------------------------------
    def validate(self, state: TrainState, epoch: int) -> Dict[str, float]:
        sums: Dict[str, float] = {}
        count = 0
        key = jax.random.PRNGKey(0)
        first_batch = None
        for batch in self.dm.val_batches(limit=self.limit_val_batches):
            if first_batch is None:
                first_batch = batch
            dev_batch = shard_batch(batch, self.mesh)
            m = self.eval_step(state.params, dev_batch, key)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            if self.fast_dev_run:
                break
        if jax.process_count() > 1:
            # sync_dist analog (reference baselightningmodule.py:127-165):
            # sum the per-process loss sums + counts across hosts so every
            # process logs the same global validation means.
            from jax.experimental import multihost_utils

            keys = sorted(sums)
            local = np.asarray([sums[k] for k in keys] + [float(count)], np.float32)
            total = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
            sums = {k: float(total[i]) for i, k in enumerate(keys)}
            count = int(total[-1])
        if count == 0:
            return {}
        means = {k: v / count for k, v in sums.items()}
        self.logger.scalars(
            {
                "loss/val": means["loss"],
                "sub_loss/val_dur_loss": means["dur_loss"],
                "sub_loss/val_prior_loss": means["prior_loss"],
                "sub_loss/val_diff_loss": means["diff_loss"],
            },
            int(state.step),
        )
        log.info(f"epoch {epoch} validation: loss={means['loss']:.4f}")
        if self.log_validation_images and first_batch is not None and not self.fast_dev_run:
            self._log_images(state, first_batch, epoch)
        return means

    def _log_images(self, state: TrainState, batch: dict, epoch: int) -> None:
        """Rank-zero synthesis of 2 samples -> tensorboard images
        (reference on_validation_end, baselightningmodule.py:167-206)."""
        if jax.process_index() != 0 or self.logger.writer is None:
            return
        from matcha_tpu.utils.utils import plot_tensor

        n = min(2, batch["x"].shape[0])
        if epoch == 0:
            for i in range(n):
                self.logger.image(f"original/{i}", plot_tensor(batch["y"][i].T), epoch)
        y_max_length = batch["y"].shape[1]
        out = self.model.apply(
            state.params,
            jnp.asarray(batch["x"][:n]), jnp.asarray(batch["x_lengths"][:n]),
            jax.random.PRNGKey(42),
            n_timesteps=10,
            spks=jnp.asarray(batch["spks"][:n]) if batch.get("spks") is not None else None,
            y_max_length=y_max_length,
            method=MatchaTTS.synthesise,
        )
        for i in range(n):
            self.logger.image(f"generated_enc/{i}", plot_tensor(np.asarray(out["encoder_outputs"][i])), epoch)
            self.logger.image(f"generated_dec/{i}", plot_tensor(np.asarray(out["decoder_outputs"][i])), epoch)
            self.logger.image(f"alignment/{i}", plot_tensor(np.asarray(out["attn"][i])), epoch)

    # ------------------------------------------------------------------
    def _monitor_score(self, epoch: int) -> float:
        """Score used for top-k retention (larger = better).

        A val metric only ranks a checkpoint when it is FRESH (computed
        this epoch): with check_val_every_n_epoch > save_every_n_epochs,
        scoring off-epoch checkpoints with a stale value would key two
        different states on one measurement (and -inf before the first
        validation would evict pre-val checkpoints regardless of quality).
        Stale/missing metrics fall back to epoch recency."""
        if self.monitor == "epoch":
            val = float(epoch)
        else:
            key = self.monitor.replace("loss/val", "loss").replace("val_", "")
            val = self._last_val.get(key, float("nan"))
            if self._last_val_epoch != epoch or val != val:
                # stale or absent -> recency fallback (keep most recent k),
                # offset so any fresh metric outranks it in either mode
                return -1e30 + float(epoch)
        if self.monitor_mode == "min":
            val = -val
        return val if val == val else float("-inf")  # NaN -> never retained over real scores

    def _maybe_checkpoint(self, state: TrainState, epochs_done: int) -> None:
        if not self.enable_checkpointing:
            return
        if self.save_last:
            self._save(state, epochs_done, tag="last")
        if self.save_every_n_epochs and epochs_done % self.save_every_n_epochs == 0:
            path = self._save(state, epochs_done)
            # A re-run over the same output_dir (crash-restart without
            # resume) re-saves a step the loaded ledger already lists:
            # replace that entry instead of duplicating it, else rotation
            # later rmtree's a path a live entry still claims as retained.
            self._ckpt_epochs = [e for e in self._ckpt_epochs if e[2] != path]
            self._ckpt_epochs.append((self._monitor_score(epochs_done), self._ckpt_seq, path))
            self._ckpt_seq += 1
            if len(self._ckpt_epochs) > self.save_top_k:
                self._ckpt_epochs.sort()
                _, _, old = self._ckpt_epochs.pop(0)  # drop the worst-scoring
                if jax.process_index() == 0:
                    import shutil

                    shutil.rmtree(old, ignore_errors=True)
                    try:
                        os.remove(old + ".hparams.json")
                    except OSError:
                        pass
            self._save_topk_ledger()

    def _save(self, state: TrainState, epochs_done: int, tag: Optional[str] = None) -> str:
        """Checkpoint the FULL training state (params + optimizer moments +
        step + completed-epoch count) so resume continues bit-identically.

        ALL processes must enter (orbax save is a global sync point); only
        the primary actually writes host-side metadata."""
        ckpt_dir = os.path.join(self.output_dir, "checkpoints")
        params = jax.device_get(state.params)
        opt_state = jax.device_get(state.opt_state)
        step = int(state.step)
        return save_native_checkpoint(
            ckpt_dir, params, {**self.hparams, "epoch": epochs_done},
            step=step, opt_state=opt_state, epoch=epochs_done,
            name="last" if tag == "last" else None,
        )
