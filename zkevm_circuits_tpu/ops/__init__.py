from . import gf  # noqa: F401
