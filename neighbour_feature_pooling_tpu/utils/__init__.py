"""Shared utilities: profiling, summaries."""

from .cache import enable_compilation_cache  # noqa: F401
from .profiling import Timer, benchmark_fn, trace  # noqa: F401
from .summary import count_parameters, summarize  # noqa: F401
