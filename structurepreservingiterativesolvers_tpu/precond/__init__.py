from .base import IdentityPreconditioner, as_preconditioner  # noqa: F401
