"""Structured Streaming variant of the extraction stage."""

from .extract_stream import extraction_stream, run_stream_once  # noqa: F401
