"""Deep-CV training engine (optax): the TPU-native replacement for the
reference's PyTorch-Lightning Trainer stack (cf. deep_cartograph/modules/
cv_learning/cv_calculator.py:1417-1553 and modules/ml/ml.py).

Capabilities kept 1:1:
  - seeded train/valid random split, shuffling, batch-size clamping
  - EarlyStopping(valid_loss, patience, min_delta)
  - best/last model selection (+ post-annealing best for VAE)
  - KL annealing schedules (linear / sigmoid / cyclical)
  - OneCycleLR and ReduceLROnPlateau (delayed stepping) schedulers
  - per-epoch metrics (train/valid loss, lr, model-specific auxes)

TPU-first design: one jitted epoch program — the minibatch loop is a
lax.scan over a (n_batches, batch_size) permutation array with weight masks
for the ragged tail, so every epoch is a single device dispatch.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Optimizers and schedules
# ---------------------------------------------------------------------------

def make_optimizer(
    name: str,
    kwargs: Dict,
    lr_schedule: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """torch.optim-style optimizer names -> optax chains.

    weight_decay follows torch's L2-in-gradient convention (decay added to
    the gradient before the adaptive update).
    """
    kwargs = dict(kwargs or {})
    lr = kwargs.pop("lr", 1e-3)
    weight_decay = kwargs.pop("weight_decay", 0.0)
    learning_rate = lr_schedule if lr_schedule is not None else lr

    name_l = name.lower()
    if name_l == "adam":
        core = optax.scale_by_adam(
            b1=kwargs.get("betas", (0.9, 0.999))[0],
            b2=kwargs.get("betas", (0.9, 0.999))[1],
            eps=kwargs.get("eps", 1e-8),
        )
    elif name_l == "adamw":
        # torch AdamW: decoupled weight decay
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
    elif name_l == "sgd":
        momentum = kwargs.get("momentum", 0.0)
        core = (
            optax.trace(decay=momentum, nesterov=kwargs.get("nesterov", False))
            if momentum
            else optax.identity()
        )
    elif name_l == "rmsprop":
        core = optax.scale_by_rms(
            decay=kwargs.get("alpha", 0.99), eps=kwargs.get("eps", 1e-8)
        )
    else:
        raise ValueError(f"Optimizer {name} not recognized.")

    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(core)

    def scaled(learning_rate):
        return optax.chain(*chain, optax.scale_by_learning_rate(learning_rate))

    return optax.inject_hyperparams(scaled)(learning_rate=learning_rate)


def one_cycle_schedule(
    max_lr: float, total_steps: int, **kwargs
) -> Callable[[int], float]:
    """torch OneCycleLR (cos strategy) equivalent."""
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=max_lr,
        pct_start=kwargs.get("pct_start", 0.3),
        div_factor=kwargs.get("div_factor", 25.0),
        final_div_factor=kwargs.get("final_div_factor", 1e4),
    )


class ReduceLROnPlateau:
    """Host-side ReduceLROnPlateau with delayed start (the reference combines
    torch's scheduler with an LROnPlateauManager callback, ml.py:243-273)."""

    def __init__(
        self,
        factor: float = 0.1,
        patience: int = 10,
        cooldown: int = 0,
        min_lr: float = 0.0,
        threshold: float = 1e-4,
        start_epoch: int = 0,
    ):
        self.factor = factor
        self.patience = patience
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.threshold = threshold
        self.start_epoch = start_epoch
        self.best = math.inf
        self.num_bad = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def step(self, epoch: int, valid_loss: float) -> float:
        if epoch < self.start_epoch:
            return self.scale
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if valid_loss < self.best * (1 - self.threshold):
            self.best = valid_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.scale


# ---------------------------------------------------------------------------
# KL annealing (cf. reference modules/ml/ml.py:51-241)
# ---------------------------------------------------------------------------

@dataclass
class KLAnnealing:
    type: str = "linear"
    start_beta: float = 0.0
    max_beta: float = 0.01
    start_epoch: int = 1000
    n_cycles: int = 4
    n_epochs_anneal: int = 1000

    def beta(self, current_epoch: int) -> float:
        if current_epoch <= self.start_epoch:
            return self.start_beta
        epoch = current_epoch - self.start_epoch
        if self.type == "linear":
            return self._linear(epoch, self.n_epochs_anneal)
        if self.type == "sigmoid":
            return self._sigmoid(epoch, self.n_epochs_anneal)
        if self.type == "cyclical":
            return self._cyclical(epoch, self.n_epochs_anneal)
        raise ValueError(f"Invalid KL annealing type {self.type}")

    def _linear(self, epoch: int, n_epochs: int) -> float:
        if epoch >= n_epochs:
            return self.max_beta
        return self.start_beta + (self.max_beta - self.start_beta) * (
            epoch / n_epochs
        )

    def _cyclical(self, epoch: int, n_epochs: int) -> float:
        if epoch >= n_epochs:
            return self.max_beta
        cycle_length = max(n_epochs // self.n_cycles, 1)
        return self._linear(epoch % cycle_length, max(cycle_length // 2, 1))

    def _sigmoid(self, epoch: int, n_epochs: int) -> float:
        eps = 1e-3
        midpoint = self.start_epoch + n_epochs // 2
        denom = self.start_epoch - midpoint
        steepness = np.log(eps / (1 - eps)) / denom if denom != 0 else 1.0
        e = epoch + self.start_epoch
        return self.start_beta + (self.max_beta - self.start_beta) / (
            1 + np.exp(-steepness * (e - midpoint))
        )

    @property
    def end_epoch(self) -> int:
        return self.start_epoch + self.n_epochs_anneal


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

@dataclass
class TrainerConfig:
    batch_size: int = 32
    max_epochs: int = 1000
    shuffle: bool = True
    check_val_every_n_epoch: int = 1
    # Checkpoint cadence (Lightning ModelCheckpoint every_n_epochs,
    # cf. reference cv_calculator.py:1451 / train_colvars.py:60-61):
    # the best-model snapshot is only eligible on these epochs.
    save_check_every_n_epoch: int = 1
    # 'auto': small workloads run on the host CPU (maybe_cpu);
    # 'default': always the default backend; 'cpu': always host CPU.
    device: str = "auto"
    early_stop_patience: int = 20
    early_stop_min_delta: float = 1e-5
    optimizer_name: str = "Adam"
    optimizer_kwargs: Dict = field(default_factory=dict)
    lr_scheduler: Optional[Dict] = None       # {'name': ..., 'kwargs': {...}}
    kl_annealing: Optional[KLAnnealing] = None
    model_to_save: str = "best"               # 'best' | 'last'
    # VAE: only checkpoint 'best' after KL annealing completes
    post_annealing_checkpoint: bool = False
    # fit_ensemble: epochs executed per device dispatch. Amortizes the
    # per-epoch host round trip (dominant at reference-default epoch counts
    # through a remote tunnel). 1 = dispatch per epoch. Forced to 1 when a
    # ReduceLROnPlateau scheduler is configured (its LR updates are
    # host-side, per validation check).
    ensemble_epoch_chunk: int = 8


@dataclass
class TrainResult:
    params: Any
    score: float
    metrics: Dict[str, List]
    best_epoch: int
    description: str


def _make_batches(
    n: int, batch_size: int, shuffle: bool, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """(n_batches, batch_size) index array + weight mask (ragged tail padded
    with repeated index 0 at weight 0 — keeps shapes static for scan)."""
    order = rng.permutation(n) if shuffle else np.arange(n)
    n_batches = int(np.ceil(n / batch_size))
    padded = np.zeros(n_batches * batch_size, dtype=np.int32)
    weights = np.zeros(n_batches * batch_size, dtype=np.float32)
    padded[:n] = order
    weights[:n] = 1.0
    return (
        padded.reshape(n_batches, batch_size),
        weights.reshape(n_batches, batch_size),
    )


class Trainer:
    """Generic seeded trainer over (data dict of arrays, loss function).

    loss_fn(params, batch: dict, rng, beta) -> (loss, aux: dict of scalars).
    The batch dict carries a 'weight' mask for padded samples; losses must
    use it.
    """

    def __init__(
        self,
        loss_fn: Callable,
        config: TrainerConfig,
    ):
        self.loss_fn = loss_fn
        # Validation must run in EVAL mode (dropout off) — the reference's
        # Lightning validation does (model.eval()). Losses that expose a
        # `train` kwarg get it pinned False for every validation check;
        # legacy losses without it are called unchanged.
        import inspect
        from functools import partial as _partial

        try:
            accepts_train = (
                "train" in inspect.signature(loss_fn).parameters
            )
        except (TypeError, ValueError):
            accepts_train = False
        self._eval_loss_fn = (
            _partial(loss_fn, train=False) if accepts_train else loss_fn
        )
        self.config = config
        # Compilation cache: the optimizer and the jitted epoch/eval programs
        # are keyed by (steps_per_epoch, n_valid) so repeated fit() calls on
        # same-shaped data (the seeded retry loop; benchmark warm runs) reuse
        # the XLA executables instead of re-tracing per call.
        self._optimizer_cache: Dict = {}
        self._compiled_cache: Dict = {}

    def fit(
        self,
        params,
        train_data: Dict[str, np.ndarray],
        valid_data: Dict[str, np.ndarray],
        seed: int,
    ) -> TrainResult:
        """Small trainings route to the host CPU: below ~2e9 element-epochs
        the whole run finishes on host before a remote accelerator finishes
        compiling the epoch program (same policy as geom.engine device=auto).
        config.device overrides: 'default' pins the default backend,
        'cpu' pins the host CPU."""
        import contextlib

        from deep_cartograph_tpu.utils.device import host_cpu_device, maybe_cpu

        if self.config.device == "default":
            ctx = contextlib.nullcontext()
        elif self.config.device == "cpu":
            cpu = host_cpu_device()
            ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
        else:
            work = float(
                sum(np.asarray(v).size for v in train_data.values())
            ) * max(self.config.max_epochs, 1)
            ctx = maybe_cpu(work, threshold=2e9)
        with ctx:
            return self._fit(params, train_data, valid_data, seed)

    def _get_optimizer(self, steps_per_epoch: int):
        """Optax transform for this config, cached by steps_per_epoch (the
        only data-dependent input, via OneCycleLR's total step count)."""
        if steps_per_epoch in self._optimizer_cache:
            return self._optimizer_cache[steps_per_epoch]
        cfg = self.config
        lr_schedule = None
        if cfg.lr_scheduler:
            name = cfg.lr_scheduler.get("name", "")
            kwargs = dict(cfg.lr_scheduler.get("kwargs", {}))
            if name == "OneCycleLR":
                max_lr = kwargs.pop("max_lr", 1e-3)
                total = kwargs.pop("epochs", cfg.max_epochs) * kwargs.pop(
                    "steps_per_epoch", steps_per_epoch
                )
                lr_schedule = one_cycle_schedule(max_lr, total, **kwargs)
            elif name == "ReduceLROnPlateau":
                pass  # host-side stateful scheduler, built per fit
            else:
                raise ValueError(f"Learning rate scheduler {name} not recognized.")
        optimizer = make_optimizer(
            cfg.optimizer_name, cfg.optimizer_kwargs, lr_schedule
        )
        self._optimizer_cache[steps_per_epoch] = optimizer
        return optimizer

    def _get_compiled(self, optimizer, steps_per_epoch: int, n_valid: int):
        """Jitted (epoch_step, eval_step), cached so repeated fits on
        same-shaped data (retry loop) reuse the XLA executables.

        Data is passed as a jit ARGUMENT, not closed over: a closed-over
        device array would be embedded in the program as an HLO constant
        (hundreds of MB at production feature-matrix sizes, catastrophic
        through a remote-compile service)."""
        key = (steps_per_epoch, n_valid)
        if key in self._compiled_cache:
            return self._compiled_cache[key]
        loss_fn = self.loss_fn

        @jax.jit
        def epoch_step(params, opt_state, data, batches, weights, rng, beta):
            def body(carry, scan_in):
                params, opt_state, rng = carry
                idx, w = scan_in
                rng, sub = jax.random.split(rng)
                batch = {k: v[idx] for k, v in data.items()}
                batch["weight"] = w

                def wrapped(p):
                    return loss_fn(p, batch, sub, beta)

                (loss, aux), grads = jax.value_and_grad(wrapped, has_aux=True)(
                    params
                )
                updates, opt_state2 = optimizer.update(grads, opt_state, params)
                params2 = optax.apply_updates(params, updates)
                return (params2, opt_state2, rng), (loss, aux)

            (params, opt_state, rng), (losses, auxes) = jax.lax.scan(
                body, (params, opt_state, rng), (batches, weights)
            )
            return params, opt_state, jnp.mean(losses), jax.tree.map(
                jnp.mean, auxes
            )

        eval_loss_fn = self._eval_loss_fn

        @jax.jit
        def eval_step(params, data, rng, beta):
            batch = dict(data)
            batch["weight"] = jnp.ones(n_valid, jnp.float32)
            loss, aux = eval_loss_fn(params, batch, rng, beta)
            return loss, aux

        self._compiled_cache[key] = (epoch_step, eval_step)
        return epoch_step, eval_step

    def _fit(
        self,
        params,
        train_data: Dict[str, np.ndarray],
        valid_data: Dict[str, np.ndarray],
        seed: int,
    ) -> TrainResult:
        cfg = self.config
        n_train = len(next(iter(train_data.values())))
        n_valid = len(next(iter(valid_data.values())))
        steps_per_epoch = int(np.ceil(n_train / cfg.batch_size))

        # Plateau scheduling is stateful host-side logic: fresh per fit.
        plateau: Optional[ReduceLROnPlateau] = None
        if cfg.lr_scheduler and cfg.lr_scheduler.get("name", "") == "ReduceLROnPlateau":
            kwargs = dict(cfg.lr_scheduler.get("kwargs", {}))
            plateau = ReduceLROnPlateau(
                factor=kwargs.get("factor", 0.1),
                patience=kwargs.get("patience", cfg.early_stop_patience // 4),
                cooldown=kwargs.get("cooldown", cfg.early_stop_patience // 8),
                min_lr=kwargs.get("min_lr", 0.0),
                start_epoch=kwargs.get("start_epoch", 0),
            )

        optimizer = self._get_optimizer(steps_per_epoch)
        base_lr = cfg.optimizer_kwargs.get("lr", 1e-3)
        opt_state = optimizer.init(params)

        train_dev = {k: jnp.asarray(v) for k, v in train_data.items()}
        valid_dev = {k: jnp.asarray(v) for k, v in valid_data.items()}

        epoch_step, eval_step = self._get_compiled(
            optimizer, steps_per_epoch, n_valid
        )

        np_rng = np.random.default_rng(seed)
        jax_rng = jax.random.PRNGKey(seed)

        metrics: Dict[str, List] = {
            "epoch": [],
            "train_loss": [],
            "valid_loss": [],
            "lr": [],
        }
        if cfg.kl_annealing is not None:
            metrics["beta"] = []

        best_score = math.inf
        es_best = math.inf
        best_params = params
        best_epoch = -1
        misaligned_warned = False
        post_best_score = math.inf
        post_best_params = None
        post_best_epoch = -1
        bad_checks = 0
        last_valid = math.inf
        anneal_end = (
            cfg.kl_annealing.end_epoch if cfg.kl_annealing is not None else 0
        )

        for epoch in range(cfg.max_epochs):
            beta = (
                cfg.kl_annealing.beta(epoch)
                if cfg.kl_annealing is not None
                else 0.0
            )
            batches, weights = _make_batches(
                n_train, cfg.batch_size, cfg.shuffle, np_rng
            )
            jax_rng, sub = jax.random.split(jax_rng)
            params, opt_state, train_loss, _ = epoch_step(
                params,
                opt_state,
                train_dev,
                jnp.asarray(batches),
                jnp.asarray(weights),
                sub,
                jnp.float32(beta),
            )

            if (epoch + 1) % cfg.check_val_every_n_epoch == 0:
                jax_rng, sub = jax.random.split(jax_rng)
                valid_loss, valid_aux = eval_step(
                    params, valid_dev, sub, jnp.float32(beta)
                )
                valid_loss = float(valid_loss)
                last_valid = valid_loss

                metrics["epoch"].append(epoch)
                metrics["train_loss"].append(float(train_loss))
                metrics["valid_loss"].append(valid_loss)
                try:
                    lr_now = float(opt_state.hyperparams["learning_rate"])
                except Exception:
                    lr_now = base_lr
                metrics["lr"].append(lr_now)
                if cfg.kl_annealing is not None:
                    metrics["beta"].append(beta)
                for k, v in valid_aux.items():
                    metrics.setdefault(f"valid_{k}", []).append(float(v))

                # Early stopping tracks every validation (Lightning
                # EarlyStopping); checkpoint capture is additionally gated
                # on the save cadence (ModelCheckpoint every_n_epochs).
                if valid_loss < es_best - cfg.early_stop_min_delta:
                    es_best = valid_loss
                    bad_checks = 0
                else:
                    bad_checks += 1
                save_every = max(cfg.save_check_every_n_epoch, 1)
                save_eligible = (epoch + 1) % save_every == 0
                if (
                    math.lcm(save_every, max(cfg.check_val_every_n_epoch, 1))
                    > cfg.max_epochs
                ):
                    # Validation epochs never (within max_epochs) land on
                    # the save grid — no checkpoint would ever be captured
                    # and 'best' would silently degrade to last-epoch
                    # params. Fall back to every validation, with a warning.
                    if not misaligned_warned:
                        logger.warning(
                            "save_check_every_n_epoch=%d never aligns with "
                            "check_val_every_n_epoch=%d within %d epochs; "
                            "checkpointing at every validation instead.",
                            cfg.save_check_every_n_epoch,
                            cfg.check_val_every_n_epoch,
                            cfg.max_epochs,
                        )
                        misaligned_warned = True
                    save_eligible = True
                if save_eligible and valid_loss < best_score:
                    best_score = valid_loss
                    best_params = jax.tree.map(lambda a: a, params)
                    best_epoch = epoch
                if (
                    cfg.post_annealing_checkpoint
                    and save_eligible
                    and epoch >= anneal_end
                    and valid_loss < post_best_score
                ):
                    post_best_score = valid_loss
                    post_best_params = jax.tree.map(lambda a: a, params)
                    post_best_epoch = epoch

                # ReduceLROnPlateau (delayed start handled inside)
                if plateau is not None:
                    scale = plateau.step(epoch, valid_loss)
                    try:
                        opt_state.hyperparams["learning_rate"] = (
                            jnp.asarray(base_lr * scale, jnp.float32)
                        )
                    except Exception:
                        pass

                # Early stopping
                if bad_checks >= cfg.early_stop_patience:
                    logger.debug("Early stopping at epoch %d", epoch)
                    break

        # Model selection (cf. reference _finalize_training,
        # cv_calculator.py:1555-1642)
        if cfg.post_annealing_checkpoint and post_best_params is not None:
            return TrainResult(
                post_best_params,
                post_best_score,
                metrics,
                post_best_epoch,
                "best post-annealing",
            )
        if cfg.model_to_save == "best" and best_epoch >= 0:
            return TrainResult(
                best_params, best_score, metrics, best_epoch, "best overall"
            )
        return TrainResult(
            params, last_valid, metrics, cfg.max_epochs - 1, "last"
        )

    # ------------------------------------------------------------------
    # Ensemble training: all seeded tries as ONE vmapped device program
    # ------------------------------------------------------------------
    def _get_compiled_ensemble(self, optimizer, steps_per_epoch: int,
                               n_valid: int, chunk: int,
                               index_offsets: Optional[Dict[str, int]] = None,
                               valid_index_offsets: Optional[
                                   Dict[str, int]] = None):
        """Jitted vmapped chunk program over a leading tries axis.

        The reference (and our serial path) trains num_tries seeds one after
        another (cv_calculator.py:1456-1553); on TPU the tiny per-CV MLPs
        leave the MXU idle, so the T tries run as one batched program:
        params/opt_state/rngs/batch-indices carry a leading T axis, the
        dataset is passed ONCE (in_axes=None) and gathered per try with
        GLOBAL indices (no T data copies in HBM).

        One dispatch executes `chunk` epochs (outer lax.scan) with an
        evaluation after each — per-epoch train/valid losses, aux metrics,
        and a params SNAPSHOT per epoch come back stacked, so the host can
        replay its early-stopping / checkpoint-selection bookkeeping
        epoch-by-epoch with unchanged semantics while paying 1/chunk of the
        dispatch round trips. The RNG stream matches the serial path
        exactly: one split per epoch for training batches, one extra split
        consumed only on validation-check epochs (eval_mask).

        `index_offsets` maps data keys to a constant row offset added to
        every gather index for that key — zero-copy time-lagged batching:
        pass the SAME (N, D) buffer as both "data" and "data_lag" with
        {"data_lag": lag} and indices in [0, N - lag), and the lagged pair
        (x_t, x_{t+lag}) is gathered from ONE buffer in HBM instead of two
        materialized copies. At config-5 scale (100k x 25k filtered
        features, 10 GB fp32) this halves the resident footprint and is
        what makes full-filtered-width deep-TICA fit on a single v5e.
        `valid_index_offsets` is the same mapping for the VALIDATION
        gather — the caller passes the training offsets only when the
        validation source IS full_data (random-split case); an explicit
        valid_data dict has its own layout and gets no offsets."""
        off = dict(index_offsets or {})
        voff = dict(valid_index_offsets or {})
        key = ("ens", steps_per_epoch, n_valid, chunk,
               tuple(sorted(off.items())), tuple(sorted(voff.items())))
        if key in self._compiled_cache:
            return self._compiled_cache[key]
        loss_fn = self.loss_fn
        eval_loss_fn = self._eval_loss_fn

        def one_chunk(params, opt_state, data, vdata, gbatches, weights, rng,
                      vidx, betas, eval_mask):
            # gbatches/weights: (chunk, steps, B); betas/eval_mask: (chunk,)
            def epoch_body(carry, xs):
                params, opt_state, rng = carry
                gb, w, beta, do_eval = xs
                # Per-epoch split of the master key feeding the minibatch
                # stream — the same key topology as fit()'s host-side split.
                rng, epoch_sub = jax.random.split(rng)

                def mb_body(c2, scan_in):
                    params, opt_state, mrng = c2
                    idx, wt = scan_in  # (B,) GLOBAL indices into data
                    mrng, sub = jax.random.split(mrng)
                    batch = {
                        k: v[idx + off[k]] if off.get(k) else v[idx]
                        for k, v in data.items()
                    }
                    batch["weight"] = wt

                    def wrapped(p):
                        return loss_fn(p, batch, sub, beta)

                    (loss, aux), grads = jax.value_and_grad(
                        wrapped, has_aux=True
                    )(params)
                    updates, opt_state2 = optimizer.update(
                        grads, opt_state, params
                    )
                    params2 = optax.apply_updates(params, updates)
                    return (params2, opt_state2, mrng), loss

                (params, opt_state, _), losses = jax.lax.scan(
                    mb_body, (params, opt_state, epoch_sub), (gb, w)
                )
                train_loss = jnp.mean(losses)

                # Evaluate every epoch (outputs for non-check epochs are
                # discarded host-side) but only CONSUME an rng split on
                # check epochs — keeps the key stream identical to fit().
                rng2, sub = jax.random.split(rng)
                rng = jnp.where(do_eval, rng2, rng)
                # vidx indexes the VALIDATION source: full_data in the
                # random-split case, the provided validation dict otherwise
                # (cv/deep.py builds valid_idx = arange(n_valid) then).
                batch = {
                    k: v[vidx + voff[k]] if voff.get(k) else v[vidx]
                    for k, v in vdata.items()
                }
                batch["weight"] = jnp.ones(n_valid, jnp.float32)
                valid_loss, valid_aux = eval_loss_fn(params, batch, sub, beta)
                return (params, opt_state, rng), (
                    train_loss, valid_loss, valid_aux, params
                )

            (params, opt_state, rng), (tl, vl, aux, snaps) = jax.lax.scan(
                epoch_body, (params, opt_state, rng),
                (gbatches, weights, betas, eval_mask),
            )
            return params, opt_state, rng, tl, vl, aux, snaps

        chunk_step = jax.jit(
            jax.vmap(
                one_chunk, in_axes=(0, 0, None, None, 0, 0, 0, 0, None, None)
            )
        )
        self._compiled_cache[key] = chunk_step
        return chunk_step

    def fit_ensemble(
        self,
        params_stack,
        full_data: Dict[str, np.ndarray],
        train_idx: np.ndarray,  # (T, n_train) global indices
        valid_idx: np.ndarray,  # (T, n_valid) global indices into valid_source
        seeds: List[int],
        valid_data: Optional[Dict[str, np.ndarray]] = None,
        index_offsets: Optional[Dict[str, int]] = None,
    ) -> List[TrainResult]:
        """Train all T seeded tries simultaneously (one vmapped program).

        Per-try semantics match fit() exactly: identical per-seed batch
        permutation streams (np RNG), identical per-seed jax RNG streams,
        identical early-stopping / checkpoint-selection / plateau-LR
        bookkeeping — just tracked per try. valid_data defaults to
        full_data (random-split case); pass the explicit validation dict
        for the provided-validation case. `index_offsets` enables
        zero-copy time-lagged batching (see _get_compiled_ensemble): the
        caller may pass the same buffer for "data" and "data_lag" with
        {"data_lag": lag} and indices restricted to [0, N - lag).
        """
        import contextlib

        from deep_cartograph_tpu.utils.device import host_cpu_device, maybe_cpu

        cfg = self.config
        T, n_train = train_idx.shape
        n_valid = valid_idx.shape[1]
        if cfg.device == "default":
            ctx = contextlib.nullcontext()
        elif cfg.device == "cpu":
            cpu = host_cpu_device()
            ctx = (
                jax.default_device(cpu)
                if cpu is not None
                else contextlib.nullcontext()
            )
        else:
            work = (
                float(sum(np.asarray(v).size for v in full_data.values()))
                * max(cfg.max_epochs, 1)
                * T
            )
            ctx = maybe_cpu(work, threshold=2e9)
        routed_cpu = not isinstance(ctx, contextlib.nullcontext)
        with ctx:
            return self._fit_ensemble(
                params_stack, full_data, train_idx, valid_idx, seeds,
                valid_data, routed_cpu=routed_cpu,
                index_offsets=index_offsets,
            )

    def _fit_ensemble(
        self,
        params_stack,
        full_data,
        train_idx,
        valid_idx,
        seeds,
        valid_data=None,
        routed_cpu: bool = False,
        index_offsets: Optional[Dict[str, int]] = None,
    ) -> List[TrainResult]:
        cfg = self.config
        T, n_train = train_idx.shape
        n_valid = valid_idx.shape[1]
        steps_per_epoch = int(np.ceil(n_train / cfg.batch_size))

        plateaus: Optional[List[ReduceLROnPlateau]] = None
        if cfg.lr_scheduler and cfg.lr_scheduler.get("name", "") == "ReduceLROnPlateau":
            kwargs = dict(cfg.lr_scheduler.get("kwargs", {}))
            plateaus = [
                ReduceLROnPlateau(
                    factor=kwargs.get("factor", 0.1),
                    patience=kwargs.get("patience", cfg.early_stop_patience // 4),
                    cooldown=kwargs.get("cooldown", cfg.early_stop_patience // 8),
                    min_lr=kwargs.get("min_lr", 0.0),
                    start_epoch=kwargs.get("start_epoch", 0),
                )
                for _ in range(T)
            ]

        optimizer = self._get_optimizer(steps_per_epoch)
        base_lr = cfg.optimizer_kwargs.get("lr", 1e-3)
        opt_state = jax.vmap(optimizer.init)(params_stack)
        params = params_stack

        # Multi-device backends with T divisible by the device count: shard
        # the TRIES axis over the mesh — each device trains its slice of the
        # seeded restarts with ZERO collectives (the dataset is replicated;
        # per-try math is independent). The pod-scale shape of the
        # reference's num_tries loop.
        try_sharding = None
        repl_sharding = None
        try:
            n_dev = len(jax.devices())
        except RuntimeError:
            n_dev = 1
        # routed_cpu: the auto-router decided host CPU wins (small work on a
        # remote backend) — an explicit device_put would override it.
        if n_dev > 1 and T % n_dev == 0 and not routed_cpu:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            from deep_cartograph_tpu.parallel.mesh import get_mesh

            mesh = get_mesh()
            try_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
            repl_sharding = NamedSharding(mesh, P())
            params = jax.device_put(params, try_sharding)
            opt_state = jax.device_put(opt_state, try_sharding)
            logger.info(
                "Sharding %d training tries over %d devices.", T, n_dev
            )

        def _place(arr):
            """Replicate across the mesh in the try-sharded regime."""
            a = jnp.asarray(arr)
            return (
                jax.device_put(a, repl_sharding)
                if repl_sharding is not None
                else a
            )

        def _place_tries(arr):
            """Shard axis 0 (tries) when the try-sharded regime is active."""
            a = jnp.asarray(arr)
            return (
                jax.device_put(a, try_sharding)
                if try_sharding is not None
                else a
            )

        data_dev = {k: _place(v) for k, v in full_data.items()}
        valid_dev = (
            {k: _place(v) for k, v in valid_data.items()}
            if valid_data is not None
            else data_dev
        )
        train_idx = np.asarray(train_idx, np.int32)
        valid_idx_dev = _place_tries(np.asarray(valid_idx, np.int32))

        np_rngs = [np.random.default_rng(s) for s in seeds]
        keys = _place_tries(
            jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        )

        def select_tree(mask_host, new, old):
            mask = jnp.asarray(mask_host)
            return jax.tree.map(
                lambda n, o: jnp.where(
                    mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o
                ),
                new,
                old,
            )

        metrics: List[Dict[str, List]] = [
            {"epoch": [], "train_loss": [], "valid_loss": [], "lr": []}
            for _ in range(T)
        ]
        if cfg.kl_annealing is not None:
            for m in metrics:
                m["beta"] = []

        best_score = np.full(T, np.inf)
        es_best = np.full(T, np.inf)
        best_params = params
        best_epoch = np.full(T, -1, np.int64)
        post_best_score = np.full(T, np.inf)
        post_best_params = params
        post_has_best = np.zeros(T, bool)
        post_best_epoch = np.full(T, -1, np.int64)
        bad_checks = np.zeros(T, np.int64)
        stopped = np.zeros(T, bool)
        last_valid = np.full(T, np.inf)
        misaligned_warned = False
        anneal_end = (
            cfg.kl_annealing.end_epoch if cfg.kl_annealing is not None else 0
        )
        last_epoch = np.full(T, cfg.max_epochs - 1, np.int64)
        last_params = params

        # ReduceLROnPlateau adjusts the LR host-side after every validation
        # check — chunking multiple epochs past a check would apply the old
        # LR; force one epoch per dispatch in that case.
        chunk_cfg = 1 if plateaus is not None else max(
            1, int(cfg.ensemble_epoch_chunk)
        )
        # Each chunked dispatch returns a params snapshot per epoch
        # ((chunk, T, params) in HBM); cap that buffer at ~512 MB so huge
        # encoders degrade to smaller chunks instead of OOM.
        param_bytes = sum(
            np.prod(np.asarray(a.shape)) * 4
            for a in jax.tree.leaves(params)
        )
        if param_bytes > 0:
            chunk_cfg = int(
                max(1, min(chunk_cfg, (512 * 2**20) // max(param_bytes, 1)))
            )
        save_every = max(cfg.save_check_every_n_epoch, 1)
        check_every = max(cfg.check_val_every_n_epoch, 1)
        save_misaligned = math.lcm(save_every, check_every) > cfg.max_epochs

        epoch0 = 0
        while epoch0 < cfg.max_epochs and not stopped.all():
            C = min(chunk_cfg, cfg.max_epochs - epoch0)
            chunk_step = self._get_compiled_ensemble(
                optimizer, steps_per_epoch, n_valid, C, index_offsets,
                # Offsets describe full_data's layout; they apply to the
                # validation gather only when validation sources from
                # full_data (random split). An explicit valid_data dict
                # has its own row layout and must not inherit them.
                valid_index_offsets=(
                    index_offsets if valid_data is None else None
                ),
            )
            betas = np.array(
                [
                    cfg.kl_annealing.beta(epoch0 + c)
                    if cfg.kl_annealing is not None
                    else 0.0
                    for c in range(C)
                ],
                np.float32,
            )
            eval_mask = np.array(
                [(epoch0 + c + 1) % check_every == 0 for c in range(C)]
            )
            gbatches = np.empty(
                (T, C, steps_per_epoch, cfg.batch_size), np.int32
            )
            wstack = np.empty(
                (T, C, steps_per_epoch, cfg.batch_size), np.float32
            )
            for t in range(T):
                for c in range(C):
                    batches, weights = _make_batches(
                        n_train, cfg.batch_size, cfg.shuffle, np_rngs[t]
                    )
                    gbatches[t, c] = train_idx[t][batches]
                    wstack[t, c] = weights

            params, opt_state, keys, tl, vl, aux, snaps = chunk_step(
                params,
                opt_state,
                data_dev,
                valid_dev,
                _place_tries(gbatches),
                _place_tries(wstack),
                keys,
                valid_idx_dev,
                _place(betas),
                _place(eval_mask),
            )
            tl_host = np.asarray(tl, np.float64)  # (T, C)
            vl_host = np.asarray(vl, np.float64)  # (T, C)
            aux_host = {k: np.asarray(v) for k, v in aux.items()}  # (T, C)

            # Replay the per-epoch bookkeeping over the chunk — identical
            # logic and outcomes to the one-epoch-per-dispatch loop.
            for c in range(C):
                epoch = epoch0 + c
                if not eval_mask[c] or stopped.all():
                    continue
                valid_loss = vl_host[:, c]
                beta = float(betas[c])
                if cfg.lr_scheduler and cfg.lr_scheduler.get("name") == "OneCycleLR":
                    # metric-only: the schedule value at the LAST optimizer
                    # update of this epoch — the count inject_hyperparams
                    # evaluated, i.e. exactly what fit() reads back from
                    # opt_state.hyperparams after the epoch.
                    lr_arr = np.full(
                        T,
                        float(
                            self._optimizer_cache_lr(
                                steps_per_epoch,
                                (epoch + 1) * steps_per_epoch - 1,
                            )
                        ),
                    )
                elif plateaus is not None:
                    lr_arr = np.array(
                        [base_lr * plateaus[t].scale for t in range(T)]
                    )
                else:
                    lr_arr = np.full(T, base_lr)

                active = ~stopped
                for t in range(T):
                    if stopped[t]:
                        continue
                    last_valid[t] = float(valid_loss[t])
                    metrics[t]["epoch"].append(epoch)
                    metrics[t]["train_loss"].append(float(tl_host[t, c]))
                    metrics[t]["valid_loss"].append(float(valid_loss[t]))
                    metrics[t]["lr"].append(float(lr_arr[t]))
                    if cfg.kl_annealing is not None:
                        metrics[t]["beta"].append(beta)
                    for k, v in aux_host.items():
                        metrics[t].setdefault(f"valid_{k}", []).append(
                            float(v[t, c])
                        )

                improved = valid_loss < es_best - cfg.early_stop_min_delta
                es_best = np.where(active & improved, valid_loss, es_best)
                bad_checks = np.where(
                    active, np.where(improved, 0, bad_checks + 1), bad_checks
                )

                save_eligible = (epoch + 1) % save_every == 0
                if save_misaligned:
                    if not misaligned_warned:
                        logger.warning(
                            "save_check_every_n_epoch=%d never aligns with "
                            "check_val_every_n_epoch=%d within %d epochs; "
                            "checkpointing at every validation instead.",
                            cfg.save_check_every_n_epoch,
                            cfg.check_val_every_n_epoch,
                            cfg.max_epochs,
                        )
                        misaligned_warned = True
                    save_eligible = True
                snap_c = jax.tree.map(lambda a: a[:, c], snaps)
                if save_eligible:
                    cap = active & (valid_loss < best_score)
                    if cap.any():
                        best_params = select_tree(cap, snap_c, best_params)
                        best_score = np.where(cap, valid_loss, best_score)
                        best_epoch = np.where(cap, epoch, best_epoch)
                    if cfg.post_annealing_checkpoint and epoch >= anneal_end:
                        pcap = active & (valid_loss < post_best_score)
                        if pcap.any():
                            post_best_params = select_tree(
                                pcap, snap_c, post_best_params
                            )
                            post_best_score = np.where(
                                pcap, valid_loss, post_best_score
                            )
                            post_best_epoch = np.where(
                                pcap, epoch, post_best_epoch
                            )
                            post_has_best |= pcap

                if plateaus is not None:
                    scales = np.array(
                        [
                            plateaus[t].step(epoch, float(valid_loss[t]))
                            if active[t]
                            else plateaus[t].scale
                            for t in range(T)
                        ],
                        np.float32,
                    )
                    try:
                        opt_state.hyperparams["learning_rate"] = jnp.asarray(
                            base_lr * scales, jnp.float32
                        )
                    except Exception:
                        pass

                newly_stopped = (
                    ~stopped & (bad_checks >= cfg.early_stop_patience)
                )
                if newly_stopped.any():
                    # Freeze each stopping try's "last" params at ITS stop
                    # epoch (serial fit() returns params as of the break).
                    last_params = select_tree(
                        newly_stopped, snap_c, last_params
                    )
                    last_epoch = np.where(newly_stopped, epoch, last_epoch)
                    stopped |= newly_stopped
                    if stopped.all():
                        logger.debug(
                            "All %d tries early-stopped at epoch %d", T, epoch
                        )
            epoch0 += C

        # Tries that ran to max_epochs keep their final params as "last".
        if (~stopped).any():
            last_params = select_tree(~stopped, params, last_params)

        # Per-try model selection (same rules as _fit)
        results: List[TrainResult] = []
        for t in range(T):
            take = lambda tree: jax.tree.map(lambda a: a[t], tree)  # noqa: E731
            if cfg.post_annealing_checkpoint and post_has_best[t]:
                results.append(
                    TrainResult(
                        take(post_best_params),
                        float(post_best_score[t]),
                        metrics[t],
                        int(post_best_epoch[t]),
                        "best post-annealing",
                    )
                )
            elif cfg.model_to_save == "best" and best_epoch[t] >= 0:
                results.append(
                    TrainResult(
                        take(best_params),
                        float(best_score[t]),
                        metrics[t],
                        int(best_epoch[t]),
                        "best overall",
                    )
                )
            else:
                results.append(
                    TrainResult(
                        take(last_params),
                        float(last_valid[t]),
                        metrics[t],
                        int(last_epoch[t]),
                        "last",
                    )
                )
        return results

    def _optimizer_cache_lr(self, steps_per_epoch: int, step_count: int):
        """OneCycle LR value at a given update index (metrics-only
        reconstruction; no clamp — optax's schedule handles counts past
        total the same way the in-optimizer evaluation does)."""
        cfg = self.config
        kwargs = dict(cfg.lr_scheduler.get("kwargs", {}))
        max_lr = kwargs.pop("max_lr", 1e-3)
        total = kwargs.pop("epochs", cfg.max_epochs) * kwargs.pop(
            "steps_per_epoch", steps_per_epoch
        )
        return one_cycle_schedule(max_lr, total, **kwargs)(step_count)
