from . import autotune  # noqa: F401
from . import ops_pallas  # noqa: F401
