from . import csv_io, generators, results_sink

__all__ = ["csv_io", "generators", "results_sink"]
