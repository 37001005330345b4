from . import scalar, text, vectors  # noqa: F401
