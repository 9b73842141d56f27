from . import memory, runner, timing

__all__ = ["timing", "memory", "runner"]
