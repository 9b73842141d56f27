from . import explain

__all__ = ["explain"]
