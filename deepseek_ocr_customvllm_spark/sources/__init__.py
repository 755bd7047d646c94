"""Sources: deterministic synthetic pages corpus + testdata readers."""

from .pagegen import synth_page, synth_pages_pdf, PAGES_SCHEMA  # noqa: F401
from .tables import load_table, register_views, TESTDATA_TABLES  # noqa: F401
