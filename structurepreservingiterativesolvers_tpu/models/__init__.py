from . import fem1d, fem2d, fixtures, heat, lkdv, lkdvrk, swe, tableaux  # noqa: F401
