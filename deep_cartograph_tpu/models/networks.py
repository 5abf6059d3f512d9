"""Flax network building blocks for deep collective variables.

TPU-native re-implementation of the model zoo the reference gets from
mlcolvar (AutoEncoderCV / VariationalAutoEncoderCV / DeepTICA; cf.
deep_cartograph/modules/cv_learning/cv_calculator.py:1061-1076). The
mlcolvar feed-forward options (per-layer activation / dropout / batchnorm,
input normalization "norm_in", output min-max postprocessing) are preserved
so configs translate 1:1.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

ACTIVATIONS: dict = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": nn.relu,
    "elu": nn.elu,
    "tanh": jnp.tanh,
    "softplus": nn.softplus,
    "shifted_softplus": lambda x: nn.softplus(x) - jnp.log(2.0),
    "custom_sigmoid": nn.sigmoid,
    "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
}


class Normalization(nn.Module):
    """Fixed affine input normalization: (x - mean) / range.

    Equivalent to mlcolvar's norm_in transform; parameters are constants
    baked at construction (not trained)."""

    mean: jnp.ndarray
    range_: jnp.ndarray

    @nn.compact
    def __call__(self, x):
        return (x - self.mean) / self.range_


class FeedForward(nn.Module):
    """MLP with per-layer activation / dropout / batchnorm lists.

    layers: full layer widths INCLUDING input and output dims,
    e.g. [in, h1, h2, out]. activation/dropout/batchnorm lists apply to each
    transition (len == len(layers) - 1); None entries are identity.
    """

    layers: Sequence[int]
    activation: Sequence[Optional[str]]
    dropout: Sequence[Optional[float]]
    batchnorm: Sequence[bool]

    @nn.compact
    def __call__(self, x, train: bool = False):
        n_transitions = len(self.layers) - 1
        for i in range(n_transitions):
            x = nn.Dense(self.layers[i + 1], name=f"dense_{i}")(x)
            if i < len(self.batchnorm) and self.batchnorm[i]:
                # Stateless batch normalization (batch statistics at both
                # train and eval; no running averages — documented deviation
                # from torch BatchNorm eval semantics).
                mu = jnp.mean(x, axis=0, keepdims=True)
                var = jnp.var(x, axis=0, keepdims=True)
                x = (x - mu) / jnp.sqrt(var + 1e-5)
                scale = self.param(
                    f"bn_scale_{i}", nn.initializers.ones, (x.shape[-1],)
                )
                bias = self.param(
                    f"bn_bias_{i}", nn.initializers.zeros, (x.shape[-1],)
                )
                x = x * scale + bias
            act = self.activation[i] if i < len(self.activation) else None
            x = ACTIVATIONS[act](x)
            drop = self.dropout[i] if i < len(self.dropout) else None
            if drop:
                x = nn.Dropout(rate=drop, deterministic=not train)(x)
        return x


def fold_feedforward_batchnorm(
    params: dict,
    layers: Sequence[int],
    activation: Sequence[Optional[str]],
    batchnorm: Sequence[bool],
    x: jnp.ndarray,
):
    """Fold batchnorm layers into the preceding Dense using DATASET
    statistics computed over `x` (the layer inputs the deployed model will
    see), returning (plain dense-only params, outputs of the folded net).

    BN at eval is the affine y' = (y - mu)/sqrt(var+eps)*scale + bias,
    which composes with the preceding Dense into W' = W*g, b' = (b-mu)*g +
    bias with g = scale/sqrt(var+eps). The folded net is deterministic,
    batch-size independent, differentiable for sensitivity analysis, and
    exactly exportable to TorchScript — the standard inference-time BN
    treatment. Statistics are full-training-set (one pass), the dataset
    analogue of torch's running averages.
    """
    import numpy as np

    new = {}
    x = jnp.asarray(x, jnp.float32)
    n_transitions = len(layers) - 1
    for i in range(n_transitions):
        d = params[f"dense_{i}"]
        kernel = jnp.asarray(d["kernel"])
        bias = jnp.asarray(d["bias"])
        y = x @ kernel + bias
        if i < len(batchnorm) and batchnorm[i]:
            mu = jnp.mean(y, axis=0)
            var = jnp.var(y, axis=0)
            g = jnp.asarray(params[f"bn_scale_{i}"]) / jnp.sqrt(var + 1e-5)
            kernel = kernel * g[None, :]
            bias = (bias - mu) * g + jnp.asarray(params[f"bn_bias_{i}"])
            y = x @ kernel + bias
        new[f"dense_{i}"] = {
            "kernel": np.asarray(kernel),
            "bias": np.asarray(bias),
        }
        act = activation[i] if i < len(activation) else None
        x = ACTIVATIONS[act](y)
    return new, x


def _pad_options(options: dict, n_transitions: int) -> dict:
    """Extend per-layer option lists to the number of transitions."""
    out = {}
    for key, default in (("activation", None), ("dropout", None), ("batchnorm", False)):
        vals = list(options.get(key) or [])
        while len(vals) < n_transitions:
            vals.append(default)
        out[key] = vals[:n_transitions]
    return out


class AutoEncoderCV(nn.Module):
    """Autoencoder CV: norm_in -> encoder -> latent; decoder for training.

    Mirrors mlcolvar AutoEncoderCV: the forward CV value is the encoder
    output (optionally post-normalized); training minimizes MSE between the
    decoder output and the normalized input.
    """

    encoder_layers: Sequence[int]
    decoder_layers: Sequence[int]
    encoder_options: dict
    decoder_options: dict
    norm_mean: Optional[jnp.ndarray] = None
    norm_range: Optional[jnp.ndarray] = None

    def setup(self):
        eo = _pad_options(self.encoder_options, len(self.encoder_layers) - 1)
        do = _pad_options(self.decoder_options, len(self.decoder_layers) - 1)
        self.encoder = FeedForward(self.encoder_layers, name="encoder", **eo)
        self.decoder = FeedForward(self.decoder_layers, name="decoder", **do)

    def normalize_in(self, x):
        if self.norm_mean is not None:
            return (x - self.norm_mean) / self.norm_range
        return x

    def encode(self, x, train: bool = False):
        return self.encoder(self.normalize_in(x), train=train)

    def __call__(self, x, train: bool = False):
        return self.encode(x, train=train)

    def reconstruct(self, x, train: bool = False):
        xn = self.normalize_in(x)
        z = self.encoder(xn, train=train)
        return self.decoder(z, train=train), xn


class VAECV(nn.Module):
    """Variational autoencoder CV (mlcolvar VariationalAutoEncoderCV parity).

    encoder_layers: [in, h...] (hidden only; mean/logvar heads are separate
    Dense layers of width n_cvs). decoder_layers: [h..., out] (the latent
    input layer is implicit). The CV value is the latent mean.
    """

    n_cvs: int
    encoder_layers: Sequence[int]
    decoder_layers: Sequence[int]
    encoder_options: dict
    decoder_options: dict
    norm_mean: Optional[jnp.ndarray] = None
    norm_range: Optional[jnp.ndarray] = None

    def setup(self):
        eo = _pad_options(self.encoder_options, max(len(self.encoder_layers) - 1, 0))
        self.encoder = FeedForward(self.encoder_layers, name="encoder", **eo)
        self.mean_head = nn.Dense(self.n_cvs, name="mean_nn")
        self.logvar_head = nn.Dense(self.n_cvs, name="log_var_nn")
        dec_layers = [self.n_cvs] + list(self.decoder_layers)
        do = _pad_options(self.decoder_options, len(dec_layers) - 1)
        self.decoder = FeedForward(dec_layers, name="decoder", **do)

    def normalize_in(self, x):
        if self.norm_mean is not None:
            return (x - self.norm_mean) / self.norm_range
        return x

    def encode(self, x, train: bool = False):
        h = self.encoder(self.normalize_in(x), train=train)
        return self.mean_head(h), self.logvar_head(h)

    def __call__(self, x, train: bool = False):
        mean, _ = self.encode(x, train=train)
        return mean

    def elbo_parts(self, x, rng, train: bool = True):
        """Per-sample (reconstruction_mse, kl) vectors for the ELBO loss."""
        xn = self.normalize_in(x)
        h = self.encoder(xn, train=train)
        mean = self.mean_head(h)
        logvar = self.logvar_head(h)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        z = mean + jnp.exp(0.5 * logvar) * eps
        x_hat = self.decoder(z, train=train)
        recon = jnp.mean((x_hat - xn) ** 2, axis=-1)
        kl = -0.5 * jnp.sum(1 + logvar - mean**2 - jnp.exp(logvar), axis=-1)
        return recon, kl


class DeepTICANet(nn.Module):
    """DeepTICA network: norm_in -> MLP -> n_cvs nonlinear basis functions.

    The linear TICA combination on top of the basis functions (eigvecs of the
    batch/dataset TICA problem) is applied outside the module — see
    models/training.py and cv/deep.py.
    """

    layers: Sequence[int]
    options: dict
    norm_mean: Optional[jnp.ndarray] = None
    norm_range: Optional[jnp.ndarray] = None

    def setup(self):
        o = _pad_options(self.options, len(self.layers) - 1)
        self.nn = FeedForward(self.layers, name="nn", **o)

    def normalize_in(self, x):
        if self.norm_mean is not None:
            return (x - self.norm_mean) / self.norm_range
        return x

    def __call__(self, x, train: bool = False):
        return self.nn(self.normalize_in(x), train=train)
