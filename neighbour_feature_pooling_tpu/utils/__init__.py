"""Shared utilities: profiling, summaries."""

from .profiling import Timer, benchmark_fn, trace  # noqa: F401
