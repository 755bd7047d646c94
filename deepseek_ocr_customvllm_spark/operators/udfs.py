"""Standalone scalar pandas UDFs over the extractor core (SURVEY §2.9).

The production pipeline runs everything fused inside one ``mapInPandas``
pass (``operators.extract``) — one Arrow round-trip per partition.  These
scalar ``pandas_udf`` wrappers expose the P1/P4 markdown cleaning and the
B1-B3 block parser as INDEPENDENT column transforms for ad-hoc use
(cleaning an existing tagged-text column, re-parsing blocks after a
markdown edit) and for testing each tier in isolation.  They call the
same pure functions the fused stage calls, so outputs are byte-identical
by construction — asserted by ``tests`` against the direct calls.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import BLOCK_STRUCT

_BLOCKS_TYPE = T.ArrayType(BLOCK_STRUCT)


@F.pandas_udf(T.StringType())
def resolve_tags_udf(text: pd.Series, doc_id: pd.Series) -> pd.Series:
    """P1 clean (``extract_content``): tagged model output -> clean text."""
    from ..extractor.tags import resolve_tags_document

    return pd.Series(
        [
            resolve_tags_document(t if t is not None else "", d)
            for t, d in zip(text, doc_id)
        ]
    )


@F.pandas_udf(T.StringType())
def clean_page_udf(text: pd.Series) -> pd.Series:
    """P4 per-page clean (``process_ocr_output`` loop body) at page index
    0; blank pages (SKIP_REPEAT) come back as NULL."""
    from ..extractor.markdown import clean_page

    return pd.Series([clean_page(t if t is not None else "", 0)[0] for t in text])


@F.pandas_udf(_BLOCKS_TYPE)
def parse_blocks_udf(cleaned: pd.Series) -> pd.Series:
    """B1-B3: P1-cleaned text -> typed block list (superset struct)."""
    from ..extractor.blocks import parse_blocks
    from .extract import _superset_block

    return pd.Series(
        [
            [_superset_block(b) for b in parse_blocks(t if t is not None else "")]
            for t in cleaned
        ]
    )


def clean_markdown(text: Column, doc_id: Column) -> Column:
    """Column-level P1 clean, composable in any select."""
    return resolve_tags_udf(text, doc_id)


def blocks_from_text(text: Column, doc_id: Column) -> Column:
    """Column-level tagged-text -> blocks (P1 then B1-B3)."""
    return parse_blocks_udf(resolve_tags_udf(text, doc_id))
