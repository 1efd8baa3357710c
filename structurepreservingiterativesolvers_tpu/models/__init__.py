from . import fem1d, fem2d, heat, lkdv, swe  # noqa: F401
