from . import derive, oracle

__all__ = ["derive", "oracle"]
