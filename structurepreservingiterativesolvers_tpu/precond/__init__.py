from .base import IdentityPreconditioner, as_preconditioner  # noqa: F401
from .chebyshev import Chebyshev, Neumann, chebyshev, neumann  # noqa: F401
from .jacobi import BlockJacobi, Jacobi, block_jacobi, contiguous_blocks, diagonal, jacobi  # noqa: F401
from .amg import AMG, amg  # noqa: F401
