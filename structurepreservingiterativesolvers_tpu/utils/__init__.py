from . import checkpoint, native, profiling  # noqa: F401
