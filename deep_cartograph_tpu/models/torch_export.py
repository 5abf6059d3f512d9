"""TorchScript export shim for trained deep CVs.

Deployment targets PLUMED's PYTORCH_MODEL action running inside CPU/GPU MD
engines (cf. reference cv_calculator.py:1773-1795 and
modules/plumed/command.py:1149-1178), so the export contract must stay
TorchScript even though training is pure JAX. This module rebuilds an
equivalent torch module from the flax parameters and traces it. torch (CPU)
is only imported here, at export/import time — never on the TPU compute path.
"""

from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _torch_activation(name: Optional[str]):
    import torch.nn as tnn

    class ShiftedSoftplus(tnn.Module):
        def forward(self, x):
            import torch

            return tnn.functional.softplus(x) - math.log(2.0)

    mapping = {
        None: tnn.Identity(),
        "linear": tnn.Identity(),
        "relu": tnn.ReLU(),
        "elu": tnn.ELU(),
        "tanh": tnn.Tanh(),
        "softplus": tnn.Softplus(),
        "shifted_softplus": ShiftedSoftplus(),
        "custom_sigmoid": tnn.Sigmoid(),
        "leaky_relu": tnn.LeakyReLU(negative_slope=0.01),
    }
    return mapping[name]


def _build_mlp(
    layers: Sequence[int],
    activations: Sequence[Optional[str]],
    dense_params: List[Dict[str, np.ndarray]],
):
    """Torch Sequential from flax Dense params (kernel (in,out) -> weight.T)."""
    import torch
    import torch.nn as tnn

    modules: List = []
    for i in range(len(layers) - 1):
        linear = tnn.Linear(layers[i], layers[i + 1])
        with torch.no_grad():
            linear.weight.copy_(
                torch.from_numpy(np.asarray(dense_params[i]["kernel"]).T.copy())
            )
            linear.bias.copy_(
                torch.from_numpy(np.asarray(dense_params[i]["bias"]).copy())
            )
        modules.append(linear)
        act = activations[i] if i < len(activations) else None
        modules.append(_torch_activation(act))
    return tnn.Sequential(*modules)


def _collect_dense(params_tree: Dict, n_layers: int) -> List[Dict[str, np.ndarray]]:
    return [params_tree[f"dense_{i}"] for i in range(n_layers)]


def build_torch_cv(architecture: Dict, params: Dict):
    """Torch module computing the deployed CV forward pass:
    norm_in -> network -> (tica combination) -> min-max postprocessing."""
    import torch
    import torch.nn as tnn

    kind = architecture["kind"]
    # Models trained here fold batchnorm into the dense weights before
    # export (cv/deep.py _fold_batchnorm_for_eval); an architecture still
    # carrying active batchnorm flags (e.g. a legacy zip) cannot be
    # exported as Linear+activation — fail loudly rather than deploy a
    # silently different CV.
    for opts_key in ("encoder_options", "decoder_options"):
        opts = architecture.get(opts_key) or {}
        if any(bool(b) for b in opts.get("batchnorm", [])):
            raise ValueError(
                "TorchScript export of un-folded batchnorm layers is not "
                f"supported ({opts_key} has active batchnorm). Re-finalize "
                "the model with this version (the trainer folds batchnorm "
                "into the dense weights) before exporting."
            )

    class DeployedCV(tnn.Module):
        def __init__(self):
            super().__init__()
            norm_mean = architecture.get("norm_mean")
            norm_range = architecture.get("norm_range")
            self.has_norm = norm_mean is not None
            if self.has_norm:
                self.register_buffer(
                    "norm_mean", torch.tensor(np.asarray(norm_mean), dtype=torch.float32)
                )
                self.register_buffer(
                    "norm_range",
                    torch.tensor(np.asarray(norm_range), dtype=torch.float32),
                )
            post_mean = architecture.get("post_mean")
            post_range = architecture.get("post_range")
            self.has_post = post_mean is not None
            if self.has_post:
                self.register_buffer(
                    "post_mean", torch.tensor(np.asarray(post_mean), dtype=torch.float32)
                )
                self.register_buffer(
                    "post_range",
                    torch.tensor(np.asarray(post_range), dtype=torch.float32),
                )
            enc_acts = architecture["encoder_options"].get("activation", [])
            if kind == "ae":
                layers = architecture["encoder_layers"]
                self.net = _build_mlp(
                    layers, enc_acts, _collect_dense(params["encoder"], len(layers) - 1)
                )
                self.mean_head = None
            elif kind == "vae":
                layers = architecture["encoder_layers"]
                self.net = _build_mlp(
                    layers, enc_acts, _collect_dense(params["encoder"], len(layers) - 1)
                )
                head = tnn.Linear(layers[-1], architecture["n_cvs"])
                with torch.no_grad():
                    head.weight.copy_(
                        torch.from_numpy(
                            np.asarray(params["mean_nn"]["kernel"]).T.copy()
                        )
                    )
                    head.bias.copy_(
                        torch.from_numpy(np.asarray(params["mean_nn"]["bias"]).copy())
                    )
                self.mean_head = head
            elif kind == "deep_tica":
                layers = architecture["layers"]
                self.net = _build_mlp(
                    layers, enc_acts, _collect_dense(params["nn"], len(layers) - 1)
                )
                self.mean_head = None
            else:
                raise ValueError(f"Unknown deep CV kind: {kind}")

            tica_evecs = architecture.get("tica_evecs")
            self.has_tica = tica_evecs is not None
            if self.has_tica:
                self.register_buffer(
                    "tica_evecs",
                    torch.tensor(np.asarray(tica_evecs), dtype=torch.float32),
                )

        def forward(self, x):
            if self.has_norm:
                x = (x - self.norm_mean) / self.norm_range
            y = self.net(x)
            if self.mean_head is not None:
                y = self.mean_head(y)
            if self.has_tica:
                y = y @ self.tica_evecs
            if self.has_post:
                y = (y - self.post_mean) / self.post_range
            return y

    module = DeployedCV()
    module.eval()
    return module


def save_torchscript(architecture: Dict, params: Dict, path: str) -> None:
    """Trace the deployed CV and write TorchScript weights (cf. reference
    cv_calculator.py:1773-1795: trace first, fall back to script)."""
    import torch

    module = build_torch_cv(architecture, params)
    n_in = (
        architecture.get("encoder_layers") or architecture.get("layers")
    )[0]
    example = torch.zeros(1, n_in, dtype=torch.float32)
    try:
        traced = torch.jit.trace(module, example)
        traced.save(path)
    except Exception as exc:  # pragma: no cover - fallback path
        logger.error("TorchScript trace failed (%s); trying script mode.", exc)
        scripted = torch.jit.script(module)
        scripted.save(path)


class TorchScriptProjector:
    """Projection fallback for model zips that only contain TorchScript
    weights (e.g. produced by the reference toolkit)."""

    def __init__(self, weights_path: str):
        import torch

        self._torch = torch
        self.module = torch.jit.load(weights_path)
        self.module.eval()

    def __call__(self, data: np.ndarray) -> np.ndarray:
        with self._torch.no_grad():
            out = self.module(
                self._torch.from_numpy(np.asarray(data, np.float32))
            )
        return out.numpy()
