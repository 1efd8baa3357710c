from .gmres import gmres  # noqa: F401
