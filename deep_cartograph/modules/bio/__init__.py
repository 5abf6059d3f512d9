from deep_cartograph_tpu.features.mapper import PDBTopologyMapper  # noqa: F401
