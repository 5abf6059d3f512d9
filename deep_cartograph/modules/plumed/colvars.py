from deep_cartograph_tpu.io.colvars import *  # noqa: F401,F403
from deep_cartograph_tpu.io.colvars import (  # noqa: F401
    create_dataframe_from_files,
    read_colvars,
    read_column_names,
)
