"""PySpark-native document-to-markdown extraction engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
OCR pipeline (``cuongnh-eov/Deepseek-ocr-customvLLM``): HTML boilerplate
stripping + deterministic PDF text-layer parsing over a Common-Crawl-style
``pages`` table, with the reference's markdown post-processing and block
state machine reproduced byte-for-byte, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis)
that a 100 TB corpus job needs.

Layout
------
- ``extractor/``  pure-Python semantic core (no Spark imports) — unit-testable,
  byte-identity locked by golden fixtures.
- ``operators/``  Spark DataFrame operators: the ``mapInPandas`` extraction
  stage, dedup family, similarity search, text statistics, resume anti-join.
- ``sources/``    deterministic synthetic ``pages`` generator + testdata readers.
- ``plans/``      SparkSession factory, lineage capture, checkpoint state store.
- ``streaming/``  Structured Streaming variant of the extraction stage.
"""

__version__ = "0.1.0"
