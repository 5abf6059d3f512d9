"""deep_cartograph_tpu: TPU-native framework for mapping MD trajectories onto
learned collective variables (featurize -> filter -> train CVs -> project ->
cluster -> FES -> PLUMED export), built on JAX/XLA/Pallas/pjit.

Re-designed TPU-first with the capabilities of NBDsoftware/deep_cartograph.
"""

__version__ = "0.1.0"
