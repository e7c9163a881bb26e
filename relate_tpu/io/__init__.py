from . import haps, chunking  # noqa: F401
