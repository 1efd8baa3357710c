from . import fem1d, lkdv  # noqa: F401
