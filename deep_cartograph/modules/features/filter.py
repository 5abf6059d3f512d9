from deep_cartograph_tpu.features.filter import Filter  # noqa: F401
