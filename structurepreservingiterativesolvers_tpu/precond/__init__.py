from .base import IdentityPreconditioner, as_preconditioner  # noqa: F401
from .chebyshev import (  # noqa: F401
    Chebyshev,
    Neumann,
    NeumannComposite,
    SkewNormalChebyshev,
    chebyshev,
    neumann,
    neumann_composite,
    skew_normal_chebyshev,
)
from .jacobi import BlockJacobi, Jacobi, block_jacobi, contiguous_blocks, diagonal, jacobi  # noqa: F401
from .amg import AMG, amg  # noqa: F401
from .ilu_oracle import DenseApply, direct_oracle, ilu_oracle  # noqa: F401
