"""UMAP collective-variable calculator, implemented natively in JAX.

Replaces the reference's umap-learn dependency
(deep_cartograph/modules/cv_learning/cv_calculator.py:1923-2171) with an
on-device implementation: exact kNN via batched distance matmuls, the
standard fuzzy-simplicial-set construction (per-point rho/sigma by binary
search), PCA initialization, and SGD layout optimization with negative
sampling — all jit-compiled. transform() embeds new points by attracting
them to their training-set neighbors. Like the reference, UMAP has no PLUMED
export (not invertible/deployable).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.cv.base import CVCalculator, cv_names_map

logger = logging.getLogger(__name__)


def _knn(data: jnp.ndarray, queries: jnp.ndarray, k: int, exclude_self: bool):
    """Exact kNN by full distance computation (MXU matmul form)."""
    d2 = (
        jnp.sum(queries**2, 1)[:, None]
        - 2 * queries @ data.T
        + jnp.sum(data**2, 1)[None, :]
    )
    if exclude_self:
        n = d2.shape[0]
        d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)
    dists, idx = jax.lax.top_k(-d2, k)
    return jnp.sqrt(jnp.maximum(-dists, 0.0)), idx


def _smooth_knn(dists: jnp.ndarray, n_iter: int = 64) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point (rho, sigma): rho = nearest distance; sigma solves
    sum_j exp(-(d_ij - rho)/sigma) = log2(k)."""
    k = dists.shape[1]
    rho = dists[:, 0]
    target = jnp.log2(k)

    def cond_sum(sigma):
        return jnp.sum(
            jnp.exp(-jnp.maximum(dists - rho[:, None], 0.0) / sigma[:, None]), axis=1
        )

    lo = jnp.full(dists.shape[0], 1e-8)
    hi = jnp.full(dists.shape[0], 1e4)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        val = cond_sum(mid)
        too_big = val > target
        return jnp.where(too_big, lo, mid), jnp.where(too_big, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return rho, 0.5 * (lo + hi)


def _fuzzy_weights(dists, rho, sigma):
    return jnp.exp(-jnp.maximum(dists - rho[:, None], 0.0) / sigma[:, None])


def _fit_ab(min_dist: float, spread: float = 1.0) -> Tuple[float, float]:
    """Fit the (a, b) curve parameters to the min_dist/spread target, as
    umap-learn does (least squares on 1/(1+a x^{2b}))."""
    from scipy.optimize import curve_fit

    x = np.linspace(0, spread * 3, 300)
    y = np.where(
        x < min_dist, 1.0, np.exp(-(x - min_dist) / spread)
    )

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2 * b))

    (a, b), _ = curve_fit(curve, x, y, p0=(1.0, 1.0), maxfev=5000)
    return float(a), float(b)


class UMAPModel:
    """Fitted UMAP state: training data, embedding, graph parameters."""

    def __init__(
        self,
        n_components: int,
        n_neighbors: int = 15,
        min_dist: float = 0.1,
        n_epochs: int = 300,
        learning_rate: float = 1.0,
        negative_samples: int = 5,
        seed: int = 42,
    ):
        self.n_components = n_components
        self.n_neighbors = n_neighbors
        self.min_dist = min_dist
        self.n_epochs = n_epochs
        self.learning_rate = learning_rate
        self.negative_samples = negative_samples
        self.seed = seed
        self.a, self.b = _fit_ab(min_dist)
        self.training_data: Optional[np.ndarray] = None
        self.embedding_: Optional[np.ndarray] = None

    # -- graph -----------------------------------------------------------
    def _graph(self, data: jnp.ndarray):
        k = min(self.n_neighbors, data.shape[0] - 1)
        dists, idx = _knn(data, data, k, exclude_self=True)
        rho, sigma = _smooth_knn(dists)
        w = _fuzzy_weights(dists, rho, sigma)
        return idx, w

    def fit(self, data: np.ndarray) -> "UMAPModel":
        data = np.asarray(data, np.float32)
        self.training_data = data
        x = jnp.asarray(data)
        n = x.shape[0]
        idx, w = self._graph(x)

        # Symmetrize: W = W + W^T - W o W^T over the sparse kNN structure.
        # Build (edge list) on host once — sizes are n*k.
        rows = np.repeat(np.arange(n), idx.shape[1])
        cols = np.asarray(idx).reshape(-1)
        vals = np.asarray(w).reshape(-1)
        import scipy.sparse as sp

        W = sp.coo_matrix((vals, (rows, cols)), shape=(n, n))
        Wt = W.T
        sym = W + Wt - W.multiply(Wt)
        sym = sym.tocoo()
        heads = jnp.asarray(sym.row, jnp.int32)
        tails = jnp.asarray(sym.col, jnp.int32)
        weights = jnp.asarray(sym.data, jnp.float32)

        # PCA init (deterministic)
        xc = x - jnp.mean(x, axis=0)
        cov = xc.T @ xc / n
        _, evecs = jnp.linalg.eigh(cov)
        init = xc @ evecs[:, ::-1][:, : self.n_components]
        init = 10.0 * init / (jnp.std(init, axis=0) + 1e-8)
        embedding = init.astype(jnp.float32)

        a, b = self.a, self.b
        n_edges = heads.shape[0]
        neg = self.negative_samples
        lr0 = self.learning_rate
        n_epochs = self.n_epochs

        def epoch(carry, ep):
            emb, key = carry
            alpha = lr0 * (1.0 - ep / n_epochs)
            key, k1, k2 = jax.random.split(key, 3)
            # sample edges by weight (keeps per-epoch work O(n_edges))
            accept = jax.random.uniform(k1, (n_edges,)) < weights
            h = emb[heads]
            t = emb[tails]
            diff = h - t
            d2 = jnp.sum(diff * diff, axis=1)
            # attraction gradient of log(1/(1+a d^{2b})); coincident points
            # (duplicate frames are each other's nearest neighbors) have
            # zero gradient — umap-learn's `dist_squared > 0` guard, which
            # otherwise becomes 0**(b-1)=inf -> NaN across the embedding.
            safe_d2 = jnp.maximum(d2, 1e-12)
            grad_coef = (
                -2.0 * a * b * safe_d2 ** (b - 1.0)
            ) / (1.0 + a * safe_d2**b)
            grad_coef = jnp.where(d2 > 0.0, grad_coef, 0.0)
            grad = jnp.clip(grad_coef[:, None] * diff, -4.0, 4.0)
            grad = jnp.where(accept[:, None], grad, 0.0)
            emb = emb.at[heads].add(alpha * grad)
            emb = emb.at[tails].add(-alpha * grad)
            # repulsion: negative samples per edge head
            negs = jax.random.randint(k2, (n_edges, neg), 0, emb.shape[0])
            hrep = emb[heads][:, None, :]
            trep = emb[negs.reshape(-1)].reshape(n_edges, neg, -1)
            diffr = hrep - trep
            d2r = jnp.sum(diffr * diffr, axis=-1)
            rep_coef = (2.0 * b) / ((0.001 + d2r) * (1.0 + a * d2r**b))
            gradr = jnp.clip(rep_coef[..., None] * diffr, -4.0, 4.0)
            gradr = jnp.where(accept[:, None, None], gradr, 0.0)
            emb = emb.at[heads].add(alpha * jnp.sum(gradr, axis=1))
            return (emb, key), None

        key = jax.random.PRNGKey(self.seed)
        (embedding, _), _ = jax.lax.scan(
            epoch, (embedding, key), jnp.arange(n_epochs, dtype=jnp.float32)
        )
        self.embedding_ = np.asarray(embedding)
        return self

    def transform(self, new_data: np.ndarray, n_epochs: int = 50) -> np.ndarray:
        """Embed new points: init at the fuzzy-weighted mean of their
        training neighbors' embeddings, then locally optimize attraction."""
        x = jnp.asarray(np.asarray(new_data, np.float32))
        train = jnp.asarray(self.training_data)
        emb_train = jnp.asarray(self.embedding_)
        k = min(self.n_neighbors, train.shape[0])
        dists, idx = _knn(train, x, k, exclude_self=False)
        rho, sigma = _smooth_knn(dists)
        w = _fuzzy_weights(dists, rho, sigma)
        w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        emb = jnp.einsum("qk,qkd->qd", w, emb_train[idx])

        a, b = self.a, self.b

        def epoch(emb, ep):
            alpha = self.learning_rate * 0.3 * (1.0 - ep / n_epochs)
            h = emb[:, None, :]
            t = emb_train[idx]
            diff = h - t
            d2 = jnp.sum(diff * diff, axis=-1)
            safe_d2 = jnp.maximum(d2, 1e-12)  # same coincident-point guard
            grad_coef = (
                -2.0 * a * b * safe_d2 ** (b - 1.0)
            ) / (1.0 + a * safe_d2**b)
            grad_coef = jnp.where(d2 > 0.0, grad_coef, 0.0)
            grad = jnp.clip((w * grad_coef)[..., None] * diff, -4.0, 4.0)
            emb = emb + alpha * jnp.sum(grad, axis=1)
            return emb, None

        emb, _ = jax.lax.scan(epoch, emb, jnp.arange(n_epochs, dtype=jnp.float32))
        return np.asarray(emb)


class UMAP(CVCalculator):
    """UMAP CV calculator (cf. reference cv_calculator.py:1923-2171)."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "umap"
        self.n_neighbors = self.configuration.get("n_neighbors", 15)
        self.min_dist = self.configuration.get("min_dist", 0.1)
        self.metric = self.configuration.get("metric", "euclidean")
        self.seed: int = self.configuration.get("seed", 42)
        self.cv_stats: Dict = {}
        self.cv_norm_mean = None
        self.cv_norm_range = None
        if self.metric != "euclidean":
            logger.warning(
                "Only the euclidean metric is supported on device; got %s.",
                self.metric,
            )
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def compute_cv(self) -> None:
        if self.training_data is None:
            logger.error("No training data available to compute UMAP.")
            return
        model = UMAPModel(
            n_components=self.cv_dimension,
            n_neighbors=self.n_neighbors,
            min_dist=self.min_dist,
            seed=self.seed,
        )
        # Fit on normalized features so fit and transform see the same space
        # (fixes the raw-fit / normalized-transform inconsistency present in
        # the reference UMAP calculator, cv_calculator.py:1952-1970 vs
        # :2099-2160).
        data = self.training_data
        if self.features_norm_mean is not None:
            data = (data - self.features_norm_mean) / self.features_norm_range
        self.cv = model.fit(np.asarray(data, np.float32))

    def normalize_cv(self) -> None:
        emb = self.cv.embedding_
        self.cv_stats = {"min": emb.min(axis=0), "max": emb.max(axis=0)}
        self.cv_norm_mean = (self.cv_stats["max"] + self.cv_stats["min"]) / 2
        self.cv_norm_range = (self.cv_stats["max"] - self.cv_stats["min"]) / 2
        # degenerate-range clamp (same contract as the other calculators)
        self.cv_norm_range = np.where(
            np.abs(self.cv_norm_range) < 1e-12, 1.0, self.cv_norm_range
        )

    def project_data(self, data: np.ndarray, normalize_data: bool = True) -> np.ndarray:
        if self.cv is None:
            raise ValueError("No UMAP model to project data.")
        arr = np.asarray(data, np.float32)
        if normalize_data and self.features_norm_mean is not None:
            arr = (arr - self.features_norm_mean) / self.features_norm_range
        projected = self.cv.transform(arr)
        return (projected - self.cv_norm_mean) / self.cv_norm_range

    def run(self, cv_dimension=None):
        # UMAP embeds the training data directly; reuse embedding_ for the
        # projected training output instead of re-transforming.
        import pandas as pd

        if self.training_data is None:
            logger.error("Training data not loaded. Cannot compute CV.")
            return None
        self.create_output_folders()
        if cv_dimension:
            self.cv_dimension = cv_dimension
        # Same small-workload routing as base.run: the UMAP fit dispatches
        # many distinct XLA programs (kNN, sigma search, layout scan) whose
        # per-program remote compile latency dwarfs small-fit compute.
        from deep_cartograph_tpu.utils.device import maybe_cpu

        with maybe_cpu(float(np.asarray(self.training_data).size) * 100):
            self.compute_cv()
            self.set_labels()
            if self.cv is None:
                return None
            self.normalize_cv()
            projected = (
                self.cv.embedding_ - self.cv_norm_mean
            ) / self.cv_norm_range
            self.save_model()
            self.sensitivity_analysis()
        return pd.DataFrame(projected, columns=self.cv_labels)

    def save_weights(self, weights_path: str) -> None:
        np.savez_compressed(
            weights_path,
            training_data=self.cv.training_data,
            embedding=self.cv.embedding_,
            a=self.cv.a,
            b=self.cv.b,
        )

    def save_model(self) -> None:
        super().save_model()
        m = str(self.model_output_folder)
        if self.cv is None:
            raise ValueError("No UMAP model to save.")
        self.save_weights(os.path.join(m, "umap_model.npz"))
        with open(os.path.join(m, "umap_params.json"), "w") as fh:
            json.dump(
                {
                    "n_neighbors": self.n_neighbors,
                    "min_dist": self.min_dist,
                    "n_components": self.cv_dimension,
                    "seed": self.seed,
                },
                fh,
            )
        np.save(os.path.join(m, "cv_norm_mean.npy"), self.cv_norm_mean)
        np.save(os.path.join(m, "cv_norm_range.npy"), self.cv_norm_range)
        if self.features_norm_mean is not None:
            np.save(os.path.join(m, "features_norm_mean.npy"), self.features_norm_mean)
            np.save(
                os.path.join(m, "features_norm_range.npy"), self.features_norm_range
            )
        self._zip_and_clean_model()

    def _load_from_folder(self, folder_path: str) -> None:
        super()._load_from_folder(folder_path)
        m = str(self.model_output_folder)
        with open(os.path.join(m, "umap_params.json")) as fh:
            params = json.load(fh)
        data = np.load(os.path.join(m, "umap_model.npz"))
        model = UMAPModel(
            n_components=params["n_components"],
            n_neighbors=params["n_neighbors"],
            min_dist=params["min_dist"],
            seed=params["seed"],
        )
        model.training_data = data["training_data"]
        model.embedding_ = data["embedding"]
        model.a, model.b = float(data["a"]), float(data["b"])
        self.cv = model
        self.cv_norm_mean = np.load(os.path.join(m, "cv_norm_mean.npy"))
        self.cv_norm_range = np.load(os.path.join(m, "cv_norm_range.npy"))
        fm = os.path.join(m, "features_norm_mean.npy")
        if os.path.exists(fm):
            self.features_norm_mean = np.load(fm)
            self.features_norm_range = np.load(
                os.path.join(m, "features_norm_range.npy")
            )

    def get_cv_parameters(self) -> Dict:
        return {
            "cv_name": self.cv_name,
            "cv_dimension": self.cv_dimension,
            "n_neighbors": self.n_neighbors,
            "min_dist": self.min_dist,
            "metric": self.metric,
        }

    def get_cv_type(self) -> str:
        return "umap"

    def normalize_data(self, data, mean, rng):
        return (data - mean) / rng

    def sensitivity_analysis(self) -> None:
        logger.warning("Sensitivity analysis is not implemented for UMAP models.")

    def write_plumed_files(self, topology, output_folder, waypoint_structures=None):
        logger.warning(
            "PLUMED input files are not generated for UMAP as it is not "
            "supported in PLUMED."
        )
