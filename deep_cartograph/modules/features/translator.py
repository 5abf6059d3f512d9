from deep_cartograph_tpu.features.translator import Translator  # noqa: F401
