"""Execution plumbing: session factory, checkpoint state, lineage."""

from .session import get_spark  # noqa: F401
