"""Drop-in compatibility package: the reference's `deep_cartograph` import
paths, served by the TPU-native implementations in `deep_cartograph_tpu`.

Scripts and notebooks written against NBDsoftware/deep_cartograph keep their
imports (`from deep_cartograph.deep_carto import deep_cartograph`,
`from deep_cartograph.tools import train_colvars`,
`from deep_cartograph.modules.plumed.colvars import read_colvars`, ...)
and run on the TPU-native engine unchanged.
"""

from deep_cartograph_tpu import deep_cartograph  # noqa: F401

__all__ = ["deep_cartograph"]
