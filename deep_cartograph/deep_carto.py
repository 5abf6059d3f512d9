"""Reference entry-point module (deep_cartograph/deep_carto.py parity)."""

from deep_cartograph_tpu import deep_cartograph  # noqa: F401
from deep_cartograph_tpu.cli import (  # noqa: F401
    main,
    parse_arguments,
    set_logger,
)

__all__ = ["deep_cartograph", "main", "parse_arguments", "set_logger"]
