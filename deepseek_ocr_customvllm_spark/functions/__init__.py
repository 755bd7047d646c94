"""Reusable column expressions shared by the operator modules."""

from .columns import dsum, dtrunc, norm_text

__all__ = ["dsum", "dtrunc", "norm_text"]
