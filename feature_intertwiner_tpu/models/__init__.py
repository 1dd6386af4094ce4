from .detector import InterNet  # noqa: F401
