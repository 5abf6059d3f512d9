"""deep_cartograph_tpu: TPU-native framework for mapping MD trajectories onto
learned collective variables (featurize -> filter -> train CVs -> project ->
cluster -> FES -> PLUMED export), built on JAX/XLA/Pallas/pjit.

Re-designed TPU-first with the capabilities of NBDsoftware/deep_cartograph.
"""

__version__ = "0.1.0"


def deep_cartograph(*args, **kwargs):
    """Main pipeline entry point (lazy import to keep `import
    deep_cartograph_tpu` light)."""
    from deep_cartograph_tpu.pipeline import deep_cartograph as _impl

    return _impl(*args, **kwargs)
