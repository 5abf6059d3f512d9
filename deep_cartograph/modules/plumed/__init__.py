from .cli import *  # noqa: F401,F403
from .command import *  # noqa: F401,F403
from .colvars import *  # noqa: F401,F403
from .utils import *  # noqa: F401,F403
from .input import *  # noqa: F401,F403
