"""Reference entry-point module (deep_cartograph/deep_carto.py parity)."""

from deep_cartograph_tpu import deep_cartograph  # noqa: F401
from deep_cartograph_tpu.cli import main, set_logger  # noqa: F401

__all__ = ["deep_cartograph", "main", "set_logger"]
