from .registry import QuerySpec  # noqa: F401
