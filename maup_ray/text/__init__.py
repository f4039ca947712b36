from . import analysis, dedup  # noqa: F401
