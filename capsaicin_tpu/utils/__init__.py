from .logging import error, get_logger, info, warn  # noqa: F401
