"""Pure-Python extraction core (no Spark imports).

Every function here is a deterministic function of its inputs only —
no wall clock, no randomness, no partition-dependent state — so the
Spark job that wraps them is retry-safe and produces identical output
at any parallelism.
"""

from .engine import extract_document, ExtractResult  # noqa: F401
