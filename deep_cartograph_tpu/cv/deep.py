"""Deep (non-linear) CV calculators: Autoencoder, VAE, DeepTICA.

JAX/optax re-implementation of the reference's mlcolvar/Lightning stack
(deep_cartograph/modules/cv_learning/cv_calculator.py:1049-1921, 2386-2949)
with identical semantics: seeded retry loop keeping the best validation
score, early stopping, best/last/post-annealing model selection, KL
annealing, batch-size clamping to a power of two, decoder-activation
coupling to the normalization mode, latent min-max postprocessing to [-1,1],
DeepTICA -sum(eigenvalues) loss with the -dim sanity bound, and TorchScript
export for PLUMED deployment.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.cv.base import CVCalculator, cv_names_map
from deep_cartograph_tpu.cv.tica_math import (
    create_timelagged_dataset_multi,
    generalized_eigh,
)
from deep_cartograph_tpu.models.networks import AutoEncoderCV, DeepTICANet, VAECV
from deep_cartograph_tpu.models.training import (
    KLAnnealing,
    Trainer,
    TrainerConfig,
    TrainResult,
)
from deep_cartograph_tpu.utils.common import closest_power_of_two, zip_files

logger = logging.getLogger(__name__)


def _wmean(values: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(values * weights) / jnp.maximum(jnp.sum(weights), 1e-12)


def validation_never_improved(valid_losses) -> bool:
    """True when no later validation loss beat the first one. (The
    reference's condition `min(loss) > loss[0]`, cv_calculator.py:1644-1656,
    is vacuously false — min(loss) <= loss[0] always — so its warning can
    never fire.)"""
    vl = list(valid_losses)
    return len(vl) > 1 and min(vl[1:]) >= vl[0]


class NonLinear(CVCalculator):
    """Base class for flax-based CV calculators."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)

        self.training_config: Dict = self.configuration.get("training", {})
        self.general_config: Dict = self.training_config.get("general", {})
        self.early_stopping_config: Dict = self.training_config.get(
            "early_stopping", {}
        )
        self.optimizer_config: Dict = self.training_config.get("optimizer", {})
        self.lr_scheduler: Optional[Dict] = self.training_config.get("lr_scheduler")
        self.model_to_save: str = self.training_config.get("model_to_save", "best")

        self.num_tries: int = self.general_config.get("num_tries", 10)
        self.seed: int = self.general_config.get("seed", 42)
        self.training_validation_lengths: List = self.general_config.get(
            "lengths", [0.8, 0.2]
        )
        self.batch_size: int = self.general_config.get("batch_size", 32)
        self.shuffle: bool = self.general_config.get("shuffle", True)
        self.random_split: bool = self.general_config.get("random_split", True)
        self.max_epochs: int = self.general_config.get("max_epochs", 100)
        self.check_val_every_n_epoch: int = self.general_config.get(
            "check_val_every_n_epoch", 1
        )
        self.save_check_every_n_epoch: int = self.general_config.get(
            "save_check_every_n_epoch", 1
        )
        self.early_stop_patience: int = self.early_stopping_config.get("patience", 20)
        self.early_stop_delta: float = self.early_stopping_config.get(
            "min_delta", 1e-5
        )

        # Per-layer network options (mlcolvar-style last-layer handling,
        # cf. reference cv_calculator.py:1155-1219)
        self.encoder_config: Dict = dict(self.architecture_config.get("encoder") or {})
        decoder_cfg = self.architecture_config.get("decoder")
        self.decoder_config: Optional[Dict] = (
            dict(decoder_cfg) if decoder_cfg is not None else None
        )
        self.encoder_hidden_layers: List[int] = list(
            self.encoder_config.get("layers", [])
        )
        self.decoder_hidden_layers: List[int] = list(
            (self.decoder_config or {}).get("layers", [])
        )

        self.cv_score: Optional[float] = None
        self.metrics: Optional[Dict] = None
        self.training_metrics_paths: List[str] = []
        # Deployed-CV state
        self.architecture: Optional[Dict] = None
        self.params = None
        self.module = None
        self.post_mean: Optional[np.ndarray] = None
        self.post_range: Optional[np.ndarray] = None
        self._torch_projector = None

    # ------------------------------------------------------------------
    # Option plumbing
    # ------------------------------------------------------------------
    def _layer_options(self, config: Dict, n_hidden: int, is_decoder: bool) -> Dict:
        """Per-transition option lists with the last layer appended
        (cf. set_up_encoder_last_layer / set_up_decoder_last_layer,
        cv_calculator.py:1155-1219)."""
        activation = list(config.get("activation") or [])
        dropout = list(config.get("dropout") or [])
        batchnorm = list(config.get("batchnorm") or [])
        last_act = config.get("last_layer_activation")
        if is_decoder:
            # Couple the final decoder activation to the feature normalization
            if self.feats_norm_mode == "min_max_range1":
                if last_act != "custom_sigmoid":
                    logger.warning(
                        "Decoder last activation changed to 'custom_sigmoid' "
                        "to match min_max_range1 normalization."
                    )
                last_act = "custom_sigmoid"
            elif self.feats_norm_mode == "min_max_range2":
                if last_act != "tanh":
                    logger.warning(
                        "Decoder last activation changed to 'tanh' to match "
                        "min_max_range2 normalization."
                    )
                last_act = "tanh"
        activation.append(last_act)
        dropout.append(config.get("last_layer_dropout"))
        batchnorm.append(config.get("last_layer_batchnorm", False))
        return {
            "activation": activation,
            "dropout": dropout,
            "batchnorm": batchnorm,
        }

    def _norm_arrays(self):
        """norm_in arrays baked into the model (cf. cv_calculator.py:1366-1374)."""
        if self.feats_norm_mode is None:
            return None, None
        return (
            jnp.asarray(self.features_norm_mean, jnp.float32),
            jnp.asarray(self.features_norm_range, jnp.float32),
        )

    # Subclass surface --------------------------------------------------
    def build_module(self):
        raise NotImplementedError

    def build_architecture_dict(self) -> Dict:
        raise NotImplementedError

    def loss_fn(self, params, batch, rng, beta):
        raise NotImplementedError

    def train_datasets(self):
        """Return the dict-of-arrays dataset used for training."""
        return {"data": self.training_data}

    def valid_datasets(self):
        if self.validation_data is None:
            return None
        return {"data": self.validation_data}

    def uses_post_annealing(self) -> bool:
        return False

    def kl_annealing_schedule(self) -> Optional[KLAnnealing]:
        return None

    # ------------------------------------------------------------------
    # Training driver (cf. reference NonLinear.train, cv_calculator.py:1456-1553)
    # ------------------------------------------------------------------
    def _split(self, dataset: Dict[str, np.ndarray], seed: int):
        n = len(next(iter(dataset.values())))
        n_train = int(n * self.training_validation_lengths[0])
        if self.random_split:
            order = np.random.default_rng(seed).permutation(n)
        else:
            order = np.arange(n)
        train_idx, valid_idx = order[:n_train], order[n_train:]
        train = {k: v[train_idx] for k, v in dataset.items()}
        valid = {k: v[valid_idx] for k, v in dataset.items()}
        return train, valid

    def _trainer_config(self, steps_per_epoch: int) -> TrainerConfig:
        lr_scheduler = None
        if self.lr_scheduler:
            name = self.lr_scheduler.get("name", "")
            kwargs = dict(self.lr_scheduler.get("kwargs", {}))
            if name == "OneCycleLR":
                kwargs.setdefault("max_lr", 1e-3)
                kwargs.setdefault("epochs", self.max_epochs)
                kwargs.setdefault("steps_per_epoch", steps_per_epoch)
            elif name == "ReduceLROnPlateau":
                kwargs.setdefault("patience", self.early_stop_patience // 4)
                kwargs.setdefault("cooldown", self.early_stop_patience // 8)
                kl = self.kl_annealing_schedule()
                if kl is not None:
                    # Start plateau monitoring after annealing + 1/4 of the
                    # remaining epochs (cf. cv_calculator.py:2794-2801)
                    kwargs.setdefault(
                        "start_epoch",
                        kl.end_epoch + (self.max_epochs - kl.end_epoch) // 4,
                    )
            lr_scheduler = {"name": name, "kwargs": kwargs}
        return TrainerConfig(
            batch_size=self.batch_size,
            max_epochs=self.max_epochs,
            shuffle=self.shuffle,
            check_val_every_n_epoch=self.check_val_every_n_epoch,
            save_check_every_n_epoch=self.save_check_every_n_epoch,
            early_stop_patience=self.early_stop_patience,
            early_stop_min_delta=self.early_stop_delta,
            optimizer_name=self.optimizer_config.get("name", "Adam"),
            optimizer_kwargs=self.optimizer_config.get("kwargs", {}),
            lr_scheduler=lr_scheduler,
            kl_annealing=self.kl_annealing_schedule(),
            model_to_save=self.model_to_save,
            post_annealing_checkpoint=self.uses_post_annealing(),
        )

    def train(self) -> bool:
        logger.info("Training %s ...", cv_names_map[self.cv_name])
        dataset = self.train_datasets()
        provided_valid = self.valid_datasets()

        n_total = len(next(iter(dataset.values())))
        n_train = (
            n_total
            if provided_valid is not None
            else int(n_total * self.training_validation_lengths[0])
        )
        logger.info("Number of training samples: %d", n_train)
        if self.batch_size >= n_train:
            self.batch_size = closest_power_of_two(n_train)
            logger.warning(
                "Batch size larger than the training set; clamped to the "
                "closest power of two: %d",
                self.batch_size,
            )
        steps_per_epoch = int(np.ceil(n_train / self.batch_size))
        config = self._trainer_config(steps_per_epoch)

        # One Trainer for all tries: its compilation cache makes retries
        # reuse the jitted epoch program instead of recompiling per seed.
        trainer = Trainer(self.loss_fn, config)

        # All tries train simultaneously as one vmapped device program (the
        # reference runs its num_tries Lightning fits serially,
        # cv_calculator.py:1456-1553 — a tiny per-CV MLP cannot feed the MXU
        # alone, so batching the tries is ~T x faster wall-clock). Falls back
        # to the serial per-seed loop on any failure.
        try_results: List[Tuple[int, Optional[TrainResult]]] = []
        try:
            # num_tries == 1 also goes through this path: the chunked
            # dispatch (several epochs per device call) still applies.
            try_results = self._run_tries_ensemble(
                trainer, dataset, provided_valid, n_total, n_train
            )
        except Exception as exc:
            logger.warning(
                "Batched multi-try training failed (%s); falling back "
                "to serial tries.",
                exc,
            )
            try_results = []
        if not try_results:
            try_results = self._run_tries_serial(
                trainer, dataset, provided_valid
            )

        best_global = float("inf")
        best: Optional[TrainResult] = None
        for try_num, result in try_results:
            if result is None:
                continue
            self._save_try_checkpoint(result, try_num)
            # Soft convergence check (see validation_never_improved)
            vl = (result.metrics or {}).get("valid_loss") or []
            if validation_never_improved(vl):
                logger.warning(
                    "Try %d: validation loss did not decrease during training.",
                    try_num,
                )
            if not self._validate_result(result):
                continue
            score = float(result.score)
            logger.info(
                "Try %d/%d: score = %.5f", try_num, self.num_tries, score
            )
            if score < best_global:
                best_global = score
                best = result
                logger.info("  -> New best model (try %d).", try_num)

        if best is None:
            logger.error(
                "%s did not produce a valid model after %d tries.",
                cv_names_map[self.cv_name],
                self.num_tries,
            )
            return False

        self.params = best.params
        self.cv_score = best.score
        self.metrics = best.metrics
        self.finalize_model()
        self.cv = self  # marker: CV is ready (self carries the deployed model)
        logger.info(
            "Best model score across %d tries: %.5f", self.num_tries, best_global
        )
        return True

    def _run_tries_serial(
        self, trainer: Trainer, dataset, provided_valid
    ) -> List[Tuple[int, Optional[TrainResult]]]:
        """One fit per seed, in sequence (the reference's loop; kept as the
        fallback path and for num_tries == 1)."""
        out: List[Tuple[int, Optional[TrainResult]]] = []
        for try_num in range(1, self.num_tries + 1):
            seed = self.seed + try_num
            try:
                if provided_valid is not None:
                    train_data, valid_data = dataset, provided_valid
                else:
                    train_data, valid_data = self._split(dataset, seed)
                rng = jax.random.PRNGKey(seed)
                params = self.init_params(rng, train_data)
                out.append(
                    (try_num, trainer.fit(params, train_data, valid_data, seed))
                )
            except Exception as exc:
                logger.error(
                    "Training try %d failed with an exception: %s", try_num, exc
                )
                out.append((try_num, None))
        return out

    def _init_params_stack(self, rngs):
        """Per-try parameters initialized under vmap (one module, T seeds)."""
        self.module = self.build_module()
        sample = jnp.zeros((2, self.num_features), jnp.float32)
        return jax.vmap(
            lambda r: self._init_variables(r, sample)["params"]
        )(rngs)

    def _run_tries_ensemble(
        self, trainer: Trainer, dataset, provided_valid, n_total, n_train
    ) -> List[Tuple[int, Optional[TrainResult]]]:
        """All seeded tries as ONE vmapped program (Trainer.fit_ensemble),
        with per-try splits/RNG streams identical to the serial path."""
        T = self.num_tries
        seeds = [self.seed + t for t in range(1, T + 1)]
        if provided_valid is not None:
            n_valid = len(next(iter(provided_valid.values())))
            train_idx = np.tile(np.arange(n_total, dtype=np.int32), (T, 1))
            valid_idx = np.tile(np.arange(n_valid, dtype=np.int32), (T, 1))
            valid_data = provided_valid
        else:
            train_rows, valid_rows = [], []
            for s in seeds:
                order = (
                    np.random.default_rng(s).permutation(n_total)
                    if self.random_split
                    else np.arange(n_total)
                )
                train_rows.append(order[:n_train])
                valid_rows.append(order[n_train:])
            train_idx = np.asarray(train_rows, np.int32)
            valid_idx = np.asarray(valid_rows, np.int32)
            valid_data = None
        rngs = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        params_stack = self._init_params_stack(rngs)
        logger.info(
            "Training %d seeded tries as one batched device program.", T
        )
        results = trainer.fit_ensemble(
            params_stack, dataset, train_idx, valid_idx, seeds, valid_data
        )
        return list(zip(range(1, T + 1), results))

    def _save_try_checkpoint(self, result: TrainResult, try_num: int) -> None:
        """Persist the selected model of each try under
        training/checkpoints/try_N/ (layout parity with the reference's
        per-try ModelCheckpoint dirs, cv_calculator.py:1441-1452)."""
        import flax.serialization

        try:
            folder = os.path.join(
                str(self.training_output_folder), "checkpoints", f"try_{try_num}"
            )
            os.makedirs(folder, exist_ok=True)
            with open(os.path.join(folder, "model.msgpack"), "wb") as fh:
                fh.write(flax.serialization.to_bytes(result.params))
            with open(os.path.join(folder, "score.txt"), "w") as fh:
                fh.write(f"{result.score:.7g} ({result.description}, "
                         f"epoch {result.best_epoch})\n")
            # Orbax mirror (sharding-aware; the restore format for pod runs)
            try:
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as ckpt:
                    ckpt.save(
                        os.path.abspath(os.path.join(folder, "orbax")),
                        jax.tree.map(np.asarray, result.params),
                    )
            except Exception as exc:
                logger.debug("Orbax checkpoint skipped: %s", exc)
        except Exception as exc:  # checkpointing must never kill training
            logger.warning("Could not save try checkpoint: %s", exc)

    def _validate_result(self, result: TrainResult) -> bool:
        """Subclass hook for sanity bounds (DeepTICA loss >= -dim)."""
        return True

    def finalize_model(self) -> None:
        """Post-training hook (DeepTICA fits its output TICA layer here)."""
        self.architecture = self.build_architecture_dict()
        self._fold_batchnorm_for_eval()

    def _normalized_training_inputs(self) -> np.ndarray:
        """Training inputs as the network core sees them (after norm_in)."""
        x = np.asarray(self.training_data, np.float32)
        if self.feats_norm_mode is not None:
            x = (
                x - np.asarray(self.features_norm_mean, np.float32)
            ) / np.asarray(self.features_norm_range, np.float32)
        return x

    def _fold_batchnorm_for_eval(self) -> None:
        """Fold batchnorm into the dense weights for the deployed model.

        Training uses batch statistics (standard BN training behavior);
        the deployed/eval model freezes FULL-training-set statistics and
        folds them into the preceding Dense — deterministic projections
        (independent of inference batch composition), meaningful
        sensitivity Jacobians, and an exactly-exportable plain MLP. The
        saved architecture drops the batchnorm flags accordingly.
        """
        from deep_cartograph_tpu.models.networks import (
            fold_feedforward_batchnorm,
        )

        arch = self.architecture

        def bn_on(opts) -> bool:
            return any(bool(b) for b in (opts or {}).get("batchnorm", []))

        kind = arch.get("kind")
        eo = arch.get("encoder_options") or {}
        do = arch.get("decoder_options") or {}
        if not (bn_on(eo) or bn_on(do)):
            return
        xn = jnp.asarray(self._normalized_training_inputs())
        params = dict(self.params)
        if kind == "deep_tica":
            params["nn"], _ = fold_feedforward_batchnorm(
                params["nn"], arch["layers"], eo.get("activation", []),
                eo.get("batchnorm", []), xn,
            )
        elif kind == "ae":
            params["encoder"], z = fold_feedforward_batchnorm(
                params["encoder"], arch["encoder_layers"],
                eo.get("activation", []), eo.get("batchnorm", []), xn,
            )
            params["decoder"], _ = fold_feedforward_batchnorm(
                params["decoder"], arch["decoder_layers"],
                do.get("activation", []), do.get("batchnorm", []), z,
            )
        elif kind == "vae":
            params["encoder"], h = fold_feedforward_batchnorm(
                params["encoder"], arch["encoder_layers"],
                eo.get("activation", []), eo.get("batchnorm", []), xn,
            )
            # Decoder statistics over the deterministic latent (the mean
            # head) — the CV path the deployed model evaluates.
            mh = params["mean_nn"]
            z = h @ jnp.asarray(mh["kernel"]) + jnp.asarray(mh["bias"])
            params["decoder"], _ = fold_feedforward_batchnorm(
                params["decoder"],
                [arch["n_cvs"]] + list(arch["decoder_layers"]),
                do.get("activation", []), do.get("batchnorm", []), z,
            )
        else:
            return
        if eo:
            eo["batchnorm"] = [False] * len(eo.get("batchnorm", []))
        if do:
            do["batchnorm"] = [False] * len(do.get("batchnorm", []))
        self.params = params
        self.module = self.build_module_from_architecture()
        logger.info(
            "Folded batchnorm (training-set statistics) into dense weights "
            "for the deployed model."
        )

    def init_params(self, rng, train_data):
        self.module = self.build_module()
        sample = jnp.zeros((2, self.num_features), jnp.float32)
        variables = self._init_variables(rng, sample)
        return variables["params"]

    def _init_variables(self, rng, sample):
        """Initialize tracing a method that touches every submodule."""
        return self.module.init({"params": rng, "dropout": rng}, sample, train=False)

    def compute_cv(self) -> None:
        if self.train():
            self.plot_training_metrics()
        else:
            self.cv = None

    # ------------------------------------------------------------------
    # Projection + postprocessing (latent min-max to [-1, 1];
    # cf. reference normalize_cv, cv_calculator.py:1735-1754)
    # ------------------------------------------------------------------
    def latent(self, data: np.ndarray) -> np.ndarray:
        if self._torch_projector is not None:
            # TorchScript fallback already includes postprocessing
            raise RuntimeError("latent() unavailable for TorchScript-only models")
        out = self.module.apply(
            {"params": self.params}, jnp.asarray(data, jnp.float32), train=False
        )
        return np.asarray(out)

    def normalize_cv(self) -> None:
        latent = self.latent(self.training_data)
        lmin, lmax = latent.min(axis=0), latent.max(axis=0)
        self.post_mean = ((lmax + lmin) / 2).astype(np.float64)
        self.post_range = ((lmax - lmin) / 2).astype(np.float64)
        self.post_range = np.where(
            np.abs(self.post_range) < 1e-12, 1.0, self.post_range
        )
        self.architecture["post_mean"] = self.post_mean.tolist()
        self.architecture["post_range"] = self.post_range.tolist()

    def project_data(
        self, data: np.ndarray, normalize_data: bool = True
    ) -> np.ndarray:
        if self._torch_projector is not None:
            return self._torch_projector(np.asarray(data, np.float32))
        out = self.latent(np.asarray(data, np.float32))
        if self.post_mean is not None:
            out = (out - self.post_mean) / self.post_range
        return out.astype(np.float32)

    # ------------------------------------------------------------------
    # Persistence
    # ------------------------------------------------------------------
    def save_weights(self, weights_path: str) -> None:
        """TorchScript export for PLUMED deployment."""
        from deep_cartograph_tpu.models.torch_export import save_torchscript

        save_torchscript(self.architecture, jax.tree.map(np.asarray, self.params), weights_path)

    def save_model(self) -> None:
        super().save_model()
        import flax.serialization

        m = str(self.model_output_folder)
        # Native flax weights + architecture (primary format)
        with open(os.path.join(m, "flax_params.msgpack"), "wb") as fh:
            fh.write(flax.serialization.to_bytes(self.params))
        with open(os.path.join(m, "architecture.json"), "w") as fh:
            json.dump(self.architecture, fh)
        # TorchScript weights (PLUMED / reference compatibility)
        try:
            self.save_weights(os.path.join(m, "cv_weights.pt"))
        except Exception as exc:
            logger.error("TorchScript export failed: %s", exc)
        self._zip_and_clean_model()

    def _load_from_folder(self, folder_path: str) -> None:
        super()._load_from_folder(folder_path)
        import flax.serialization

        m = str(self.model_output_folder)
        arch_path = os.path.join(m, "architecture.json")
        flax_path = os.path.join(m, "flax_params.msgpack")
        ts_path = os.path.join(m, "cv_weights.pt")
        if os.path.exists(arch_path) and os.path.exists(flax_path):
            with open(arch_path) as fh:
                self.architecture = json.load(fh)
            self._restore_from_architecture()
            self.module = self.build_module_from_architecture()
            sample = jnp.zeros((2, self.num_features), jnp.float32)
            template = self.module.init(
                {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
                sample,
                train=False,
            )["params"]
            with open(flax_path, "rb") as fh:
                self.params = flax.serialization.from_bytes(template, fh.read())
            self.cv = self
        elif os.path.exists(ts_path):
            # Reference-produced zip: only TorchScript weights available
            from deep_cartograph_tpu.models.torch_export import TorchScriptProjector

            logger.info(
                "No flax weights in model; loading TorchScript weights "
                "(reference-compatible path)."
            )
            self._torch_projector = TorchScriptProjector(ts_path)
            self.cv = self
        else:
            raise FileNotFoundError(f"CV model weights not found in {m}")

    def _restore_from_architecture(self) -> None:
        arch = self.architecture
        self.post_mean = (
            np.asarray(arch["post_mean"]) if arch.get("post_mean") is not None else None
        )
        self.post_range = (
            np.asarray(arch["post_range"])
            if arch.get("post_range") is not None
            else None
        )
        if arch.get("norm_mean") is not None:
            self.features_norm_mean = np.asarray(arch["norm_mean"])
            self.features_norm_range = np.asarray(arch["norm_range"])

    def build_module_from_architecture(self):
        raise NotImplementedError

    def get_cv_parameters(self) -> Dict:
        return {
            "cv_name": self.cv_name,
            "cv_dimension": self.cv_dimension,
            "weights_path": getattr(self, "weights_path", None),
        }

    def get_cv_type(self) -> str:
        return "non-linear"

    # ------------------------------------------------------------------
    def sensitivity_analysis(self) -> None:
        """Mean |d cv_k / d x_j| over the training set, averaged over CV
        components (mlcolvar sensitivity_analysis 'mean_abs_val' parity;
        cf. reference cv_calculator.py:1893-1921)."""
        data = jnp.asarray(self.training_data, jnp.float32)

        def forward(x):
            out = self.module.apply({"params": self.params}, x[None, :], train=False)
            return out[0]

        jac = jax.vmap(jax.jacobian(forward))(data)  # (n, n_cvs, n_features)
        sens = np.asarray(jnp.mean(jnp.abs(jac), axis=(0, 1)))
        self._save_sensitivity(
            self.features_ref_labels, sens, str(self.sensitivity_output_folder)
        )

    def plot_training_metrics(self) -> None:
        """Save/plot the loss curves and model score
        (cf. reference plot_training_metrics, cv_calculator.py:1658-1733)."""
        from deep_cartograph_tpu.figures.plots import plot_metrics
        from deep_cartograph_tpu.utils.common import remove_files

        if self.metrics is None:
            return
        folder = str(self.training_output_folder)
        if self.training_config.get("save_loss", True):
            for key in ("train_loss", "valid_loss", "epoch"):
                if key in self.metrics:
                    path = os.path.join(folder, f"{key}.npy")
                    np.save(path, np.asarray(self.metrics[key]))
                    self.training_metrics_paths.append(path)
            np.savetxt(
                os.path.join(folder, "model_score.txt"),
                np.asarray([self.cv_score]),
                fmt="%.7g",
            )
        if self.training_config.get("plot_loss", True):
            yscale = "linear" if self.cv_name == "deep_tica" else "log"
            plot_metrics(
                self.metrics,
                keys=["train_loss", "valid_loss"],
                labels=["Training", "Validation"],
                yscale=yscale,
                path=os.path.join(folder, "loss.png"),
            )
            if "lr" in self.metrics:
                plot_metrics(
                    self.metrics,
                    keys=["lr"],
                    labels=["Learning Rate"],
                    yscale="log",
                    path=os.path.join(folder, "learning_rate.png"),
                )
        zip_path = os.path.join(folder, "training_metrics.zip")
        if self.training_metrics_paths:
            zip_files(zip_path, *self.training_metrics_paths)
            remove_files(*self.training_metrics_paths)


class AECalculator(NonLinear):
    """Autoencoder CV (cf. reference cv_calculator.py:2386-2505)."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "ae"
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def _encoder_layers(self) -> List[int]:
        return [self.num_features] + self.encoder_hidden_layers + [self.cv_dimension]

    def _decoder_layers(self) -> List[int]:
        hidden = (
            self.decoder_hidden_layers
            if self.decoder_config is not None
            else self.encoder_hidden_layers[::-1]
        )
        return [self.cv_dimension] + hidden + [self.num_features]

    def build_module(self):
        mean, rng = self._norm_arrays()
        dec_cfg = self.decoder_config if self.decoder_config is not None else dict(
            self.encoder_config
        )
        return AutoEncoderCV(
            encoder_layers=tuple(self._encoder_layers()),
            decoder_layers=tuple(self._decoder_layers()),
            encoder_options=self._layer_options(
                self.encoder_config, len(self.encoder_hidden_layers), False
            ),
            decoder_options=self._layer_options(
                dec_cfg, len(self.decoder_hidden_layers), True
            ),
            norm_mean=mean,
            norm_range=rng,
        )

    def build_module_from_architecture(self):
        arch = self.architecture
        mean = (
            jnp.asarray(arch["norm_mean"], jnp.float32)
            if arch.get("norm_mean") is not None
            else None
        )
        rng = (
            jnp.asarray(arch["norm_range"], jnp.float32)
            if arch.get("norm_range") is not None
            else None
        )
        return AutoEncoderCV(
            encoder_layers=tuple(arch["encoder_layers"]),
            decoder_layers=tuple(arch["decoder_layers"]),
            encoder_options=arch["encoder_options"],
            decoder_options=arch["decoder_options"],
            norm_mean=mean,
            norm_range=rng,
        )

    def build_architecture_dict(self) -> Dict:
        mean, rng = self._norm_arrays()
        dec_cfg = self.decoder_config if self.decoder_config is not None else dict(
            self.encoder_config
        )
        return {
            "kind": "ae",
            "encoder_layers": self._encoder_layers(),
            "decoder_layers": self._decoder_layers(),
            "encoder_options": self._layer_options(
                self.encoder_config, len(self.encoder_hidden_layers), False
            ),
            "decoder_options": self._layer_options(
                dec_cfg, len(self.decoder_hidden_layers), True
            ),
            "norm_mean": None if mean is None else np.asarray(mean).tolist(),
            "norm_range": None if rng is None else np.asarray(rng).tolist(),
            "post_mean": None,
            "post_range": None,
        }

    def _init_variables(self, rng, sample):
        return self.module.init(
            {"params": rng, "dropout": rng},
            sample,
            train=False,
            method=AutoEncoderCV.reconstruct,
        )

    def loss_fn(self, params, batch, rng, beta, train=True):
        # train=False (validation checks) disables dropout — Lightning's
        # model.eval() semantics.
        x_hat, xn = self.module.apply(
            {"params": params},
            batch["data"],
            train=train,
            method=AutoEncoderCV.reconstruct,
            rngs={"dropout": rng},
        )
        mse = jnp.mean((x_hat - xn) ** 2, axis=-1)
        return _wmean(mse, batch["weight"]), {}


class VAECalculator(NonLinear):
    """Variational autoencoder CV (cf. reference cv_calculator.py:2629-2949)."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "vae"
        kl_cfg = self.training_config.get("kl_annealing")
        if kl_cfg is not None:
            self._kl = KLAnnealing(
                type=kl_cfg.get("type", "linear"),
                start_beta=kl_cfg.get("start_beta", 1e-6),
                max_beta=kl_cfg.get("max_beta", 0.01),
                start_epoch=kl_cfg.get("start_epoch", self.max_epochs // 2),
                n_cycles=kl_cfg.get("n_cycles", 4),
                n_epochs_anneal=kl_cfg.get("n_epochs_anneal", self.max_epochs // 4),
            )
        else:
            # Reasonable defaults (cf. reference cv_calculator.py:2654-2661)
            self._kl = KLAnnealing(
                type="sigmoid",
                start_beta=1e-6,
                max_beta=0.01,
                start_epoch=self.max_epochs // 2,
                n_cycles=1,
                n_epochs_anneal=self.max_epochs // 4,
            )
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def kl_annealing_schedule(self) -> KLAnnealing:
        return self._kl

    def uses_post_annealing(self) -> bool:
        return self._kl.n_epochs_anneal > 0

    def _encoder_layers(self) -> List[int]:
        return [self.num_features] + self.encoder_hidden_layers

    def _decoder_layers(self) -> List[int]:
        hidden = (
            self.decoder_hidden_layers
            if self.decoder_config is not None
            else self.encoder_hidden_layers[::-1]
        )
        return hidden + [self.num_features]

    def build_module(self):
        mean, rng = self._norm_arrays()
        dec_cfg = self.decoder_config if self.decoder_config is not None else dict(
            self.encoder_config
        )
        # VAE keeps user per-layer options as-is for the hidden stack
        # (cf. reference set_up_encoder_last_layer special-casing VAE)
        enc_opts = {
            "activation": list(self.encoder_config.get("activation") or []),
            "dropout": list(self.encoder_config.get("dropout") or []),
            "batchnorm": list(self.encoder_config.get("batchnorm") or []),
        }
        return VAECV(
            n_cvs=self.cv_dimension,
            encoder_layers=tuple(self._encoder_layers()),
            decoder_layers=tuple(self._decoder_layers()),
            encoder_options=enc_opts,
            decoder_options=self._layer_options(
                dec_cfg, len(self.decoder_hidden_layers), True
            ),
            norm_mean=mean,
            norm_range=rng,
        )

    def build_module_from_architecture(self):
        arch = self.architecture
        mean = (
            jnp.asarray(arch["norm_mean"], jnp.float32)
            if arch.get("norm_mean") is not None
            else None
        )
        rng = (
            jnp.asarray(arch["norm_range"], jnp.float32)
            if arch.get("norm_range") is not None
            else None
        )
        return VAECV(
            n_cvs=arch["n_cvs"],
            encoder_layers=tuple(arch["encoder_layers"]),
            decoder_layers=tuple(arch["decoder_layers"]),
            encoder_options=arch["encoder_options"],
            decoder_options=arch["decoder_options"],
            norm_mean=mean,
            norm_range=rng,
        )

    def build_architecture_dict(self) -> Dict:
        mean, rng = self._norm_arrays()
        dec_cfg = self.decoder_config if self.decoder_config is not None else dict(
            self.encoder_config
        )
        return {
            "kind": "vae",
            "n_cvs": self.cv_dimension,
            "encoder_layers": self._encoder_layers(),
            "decoder_layers": self._decoder_layers(),
            "encoder_options": {
                "activation": list(self.encoder_config.get("activation") or []),
                "dropout": list(self.encoder_config.get("dropout") or []),
                "batchnorm": list(self.encoder_config.get("batchnorm") or []),
            },
            "decoder_options": self._layer_options(
                dec_cfg, len(self.decoder_hidden_layers), True
            ),
            "norm_mean": None if mean is None else np.asarray(mean).tolist(),
            "norm_range": None if rng is None else np.asarray(rng).tolist(),
            "post_mean": None,
            "post_range": None,
        }

    def _init_variables(self, rng, sample):
        import jax as _jax

        return self.module.init(
            {"params": rng, "dropout": rng},
            sample,
            _jax.random.PRNGKey(0),
            train=False,
            method=VAECV.elbo_parts,
        )

    def loss_fn(self, params, batch, rng, beta, train=True):
        # train=False (validation checks) disables dropout; the ELBO's
        # reparameterization sample stays stochastic, as in mlcolvar.
        rng_drop, rng_reparam = jax.random.split(rng)
        recon, kl = self.module.apply(
            {"params": params},
            batch["data"],
            rng_reparam,
            train=train,
            method=VAECV.elbo_parts,
            rngs={"dropout": rng_drop},
        )
        w = batch["weight"]
        recon_m = _wmean(recon, w)
        kl_m = _wmean(kl, w)
        return recon_m + beta * kl_m, {
            "reconstruction_loss": recon_m,
            "kl_loss": kl_m,
        }

    def plot_training_metrics(self) -> None:
        super().plot_training_metrics()
        from deep_cartograph_tpu.figures.plots import plot_metrics

        folder = str(self.training_output_folder)
        for keys, labels, path in (
            (
                ["valid_kl_loss"],
                ["Validation KL"],
                os.path.join(folder, "vae_kl_loss.png"),
            ),
            (
                ["valid_reconstruction_loss"],
                ["Validation Reconstruction"],
                os.path.join(folder, "vae_reconstruction_loss.png"),
            ),
            (["beta"], ["Beta"], os.path.join(folder, "vae_beta.png")),
        ):
            if all(k in self.metrics for k in keys):
                plot_metrics(
                    self.metrics,
                    keys=keys,
                    labels=labels,
                    yscale="log" if keys != ["beta"] else "linear",
                    path=path,
                )


def deep_tica_batch_eigvals(module, params, batch, rng, reg, train=True):
    """Weighted batch TICA eigenvalues of the network outputs — the DeepTICA
    training objective's core (cf. reference cv_calculator.py:2507-2627).
    Module-level so benchmarks and external callers drive the exact shipped
    loss math. train=False (validation checks) disables dropout."""
    q_t = module.apply(
        {"params": params}, batch["data"], train=train, rngs={"dropout": rng}
    )
    q_lag = module.apply(
        {"params": params}, batch["data_lag"], train=train,
        rngs={"dropout": rng},
    )
    w = batch["weight"][:, None]
    wsum = jnp.maximum(jnp.sum(batch["weight"]), 1e-12)
    # mlcolvar TICA estimator: mean and C0 from q_t only, Ctau symmetrized
    # (cf. cv/tica_math.timelagged_covariances).
    mu = jnp.sum(q_t * w, axis=0) / wsum
    a = (q_t - mu) * w
    b = (q_lag - mu) * w
    c0 = a.T @ (q_t - mu) / wsum
    ctau = 0.5 * (a.T @ (q_lag - mu) + b.T @ (q_t - mu)) / wsum
    evals, _ = generalized_eigh(ctau, c0, reg)
    return evals


def make_deep_tica_loss(module, reg: float, dim: int):
    """Trainer-compatible DeepTICA loss over `module` (−Σ eigenvalues)."""

    def loss_fn(params, batch, rng, beta, train=True):
        evals = deep_tica_batch_eigvals(
            module, params, batch, rng, reg, train=train
        )
        aux = {f"eigval_{i + 1}": evals[i] for i in range(dim)}
        return -jnp.sum(evals), aux

    return loss_fn


class DeepTICACalculator(NonLinear):
    """DeepTICA CV (cf. reference cv_calculator.py:2507-2627)."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "deep_tica"
        self.tica_reg = self.configuration.get("tica_regularization", 1e-6)
        self.x_t: Optional[np.ndarray] = None
        self.x_lag: Optional[np.ndarray] = None
        self.val_x_t: Optional[np.ndarray] = None
        self.val_x_lag: Optional[np.ndarray] = None
        self.tica_evecs: Optional[np.ndarray] = None
        self.eigenvalues_: Optional[np.ndarray] = None
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def load_training_data(self, *args, **kwargs) -> None:
        super().load_training_data(*args, **kwargs)
        lag = self.configuration.get("lag_time", 1)
        labels = self.training_data_labels
        blocks = (
            [self.training_data[labels == lab] for lab in np.unique(labels)]
            if labels is not None
            else [self.training_data]
        )
        self.x_t, self.x_lag = create_timelagged_dataset_multi(blocks, lag)

    def load_validation_data(self, *args, **kwargs) -> None:
        super().load_validation_data(*args, **kwargs)
        if self.validation_data is not None:
            lag = self.configuration.get("lag_time", 1)
            # Per-trajectory blocks, like the training path: pairing the
            # concatenation would create physically meaningless lag pairs
            # across file boundaries that skew the validation score.
            labels = getattr(self, "validation_data_labels", None)
            blocks = (
                [
                    self.validation_data[labels == lab]
                    for lab in np.unique(labels)
                ]
                if labels is not None
                else [self.validation_data]
            )
            self.val_x_t, self.val_x_lag = create_timelagged_dataset_multi(
                blocks, lag
            )

    def train_datasets(self):
        return {"data": self.x_t, "data_lag": self.x_lag}

    def valid_datasets(self):
        if self.val_x_t is None:
            return None
        return {"data": self.val_x_t, "data_lag": self.val_x_lag}

    def _layers(self) -> List[int]:
        return [self.num_features] + self.encoder_hidden_layers + [self.cv_dimension]

    def build_module(self):
        mean, rng = self._norm_arrays()
        return DeepTICANet(
            layers=tuple(self._layers()),
            options=self._layer_options(
                self.encoder_config, len(self.encoder_hidden_layers), False
            ),
            norm_mean=mean,
            norm_range=rng,
        )

    def build_module_from_architecture(self):
        arch = self.architecture
        mean = (
            jnp.asarray(arch["norm_mean"], jnp.float32)
            if arch.get("norm_mean") is not None
            else None
        )
        rng = (
            jnp.asarray(arch["norm_range"], jnp.float32)
            if arch.get("norm_range") is not None
            else None
        )
        return DeepTICANet(
            layers=tuple(arch["layers"]),
            options=arch["encoder_options"],
            norm_mean=mean,
            norm_range=rng,
        )

    def build_architecture_dict(self) -> Dict:
        mean, rng = self._norm_arrays()
        return {
            "kind": "deep_tica",
            "layers": self._layers(),
            "encoder_options": self._layer_options(
                self.encoder_config, len(self.encoder_hidden_layers), False
            ),
            "norm_mean": None if mean is None else np.asarray(mean).tolist(),
            "norm_range": None if rng is None else np.asarray(rng).tolist(),
            "tica_evecs": None,
            "post_mean": None,
            "post_range": None,
        }

    def _batch_eigvals(self, params, batch, rng):
        return deep_tica_batch_eigvals(
            self.module, params, batch, rng, self.tica_reg
        )

    def loss_fn(self, params, batch, rng, beta):
        evals = self._batch_eigvals(params, batch, rng)
        loss = -jnp.sum(evals)
        aux = {f"eigval_{i + 1}": evals[i] for i in range(self.cv_dimension)}
        return loss, aux

    def _validate_result(self, result: TrainResult) -> bool:
        """DeepTICA sanity bound: loss = -sum(eigvals) >= -dim
        (cf. reference cv_calculator.py:1624-1637)."""
        if result.score < -float(self.cv_dimension):
            logger.warning(
                "Deep TICA validation loss (%.5f) is below the theoretical "
                "minimum (%.5f). Sign of ill-conditioned training; try a "
                "lower learning rate or higher tica_regularization.",
                result.score,
                -float(self.cv_dimension),
            )
            return False
        return True

    def finalize_model(self) -> None:
        """Fit the output TICA layer on the full training pairs (the linear
        combination of the learned basis functions)."""
        super().finalize_model()
        q_t = np.asarray(
            self.module.apply(
                {"params": self.params}, jnp.asarray(self.x_t), train=False
            )
        )
        q_lag = np.asarray(
            self.module.apply(
                {"params": self.params}, jnp.asarray(self.x_lag), train=False
            )
        )
        from deep_cartograph_tpu.cv.tica_math import tica as tica_solve

        self.eigenvalues_, self.tica_evecs = tica_solve(
            q_t, q_lag, self.cv_dimension, reg=self.tica_reg
        )
        self.architecture["tica_evecs"] = np.asarray(self.tica_evecs).tolist()

    def _restore_from_architecture(self) -> None:
        super()._restore_from_architecture()
        if self.architecture.get("tica_evecs") is not None:
            self.tica_evecs = np.asarray(self.architecture["tica_evecs"])

    def latent(self, data: np.ndarray) -> np.ndarray:
        out = np.asarray(
            self.module.apply(
                {"params": self.params}, jnp.asarray(data, jnp.float32), train=False
            )
        )
        if self.tica_evecs is not None:
            out = out @ self.tica_evecs
        return out

    def sensitivity_analysis(self) -> None:
        data = jnp.asarray(self.training_data, jnp.float32)
        evecs = jnp.asarray(self.tica_evecs, jnp.float32)

        def forward(x):
            out = self.module.apply({"params": self.params}, x[None, :], train=False)
            return (out @ evecs)[0]

        jac = jax.vmap(jax.jacobian(forward))(data)
        sens = np.asarray(jnp.mean(jnp.abs(jac), axis=(0, 1)))
        self._save_sensitivity(
            self.features_ref_labels, sens, str(self.sensitivity_output_folder)
        )

    def plot_training_metrics(self) -> None:
        super().plot_training_metrics()
        from deep_cartograph_tpu.figures.plots import plot_metrics

        folder = str(self.training_output_folder)
        if self.eigenvalues_ is not None:
            np.savetxt(
                os.path.join(folder, "eigenvalues.txt"),
                np.asarray(self.eigenvalues_),
                fmt="%.7g",
            )
        eig_keys = [
            f"valid_eigval_{i + 1}" for i in range(self.cv_dimension)
        ]
        if all(k in self.metrics for k in eig_keys):
            plot_metrics(
                self.metrics,
                keys=eig_keys,
                labels=[f"Eigenvalue {i + 1}" for i in range(self.cv_dimension)],
                yscale="linear",
                path=os.path.join(folder, "eigenvalues.png"),
            )
