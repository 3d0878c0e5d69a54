from . import view, regularize  # noqa: F401
