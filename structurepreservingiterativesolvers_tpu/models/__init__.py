from . import fem1d, fem2d, heat, lkdv, lkdvrk, swe, tableaux  # noqa: F401
