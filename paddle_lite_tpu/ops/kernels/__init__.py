from . import autotune  # noqa: F401
