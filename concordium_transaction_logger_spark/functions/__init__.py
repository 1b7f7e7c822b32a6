from . import addresses

__all__ = ["addresses"]
