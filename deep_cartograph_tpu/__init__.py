"""deep_cartograph_tpu: TPU-native framework for mapping MD trajectories onto
learned collective variables (featurize -> filter -> train CVs -> project ->
cluster -> FES -> PLUMED export), built on JAX/XLA/Pallas/pjit.

Re-designed TPU-first with the capabilities of NBDsoftware/deep_cartograph.
"""

__version__ = "0.1.0"

import jax as _jax

# XLA:TPU lowers f32 matmuls to bf16 MXU passes by default; the geometry and
# covariance paths (absolute coordinates through +/-1 selector contractions,
# TICA C0/Ctau) lose ~1e-3 to input rounding under that default, breaking the
# 1e-4 projection-parity contract. Force full f32 matmul accuracy everywhere;
# callers that can tolerate bf16 pass an explicit precision= at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")


def deep_cartograph(*args, **kwargs):
    """Main pipeline entry point (lazy import to keep `import
    deep_cartograph_tpu` light)."""
    from deep_cartograph_tpu.pipeline import deep_cartograph as _impl

    return _impl(*args, **kwargs)
