from . import districts, images  # noqa: F401
