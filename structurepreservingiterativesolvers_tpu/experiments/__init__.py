from . import report, wrappers  # noqa: F401
from .evolve import deviation_plotter, evolve  # noqa: F401
from .single_solve import single_solve  # noqa: F401
