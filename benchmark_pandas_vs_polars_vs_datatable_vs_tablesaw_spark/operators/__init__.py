from . import core, dedup, joins, multimodal, similarity, text, timeseries

__all__ = ["core", "joins", "dedup", "similarity", "text", "timeseries", "multimodal"]
