from deep_cartograph_tpu.features.common import find_common_features  # noqa: F401
