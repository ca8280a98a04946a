"""Utilities: observability, profiling, and validation helpers."""

from .stats import IndexStats, ScanStats
from .profiling import trace

__all__ = ["IndexStats", "ScanStats", "trace"]
