"""Sources and sinks (SURVEY.md §2.1).

The reference's only source is one inferred-schema CSV
(``/root/reference/amazon1.py:24-25``) and its only tabular sink is HTML
(``:36-39``). Here the canonical format is Parquet (testdata format, and
the only sane choice at 100 TB: columnar, splittable, predicate/column
pushdown); CSV stays supported as an *ingest* source with an explicit
schema — never ``inferSchema`` at scale, which triggers a full extra
pass over the data just to guess types the pipeline already knows.
"""

from .binaryfiles import as_blob_table, pack_to_parquet, read_binary_dir  # noqa: F401
from .csv import PRODUCTS_SCHEMA, clean_products, read_products_csv  # noqa: F401
from .html import to_html_table, write_html_report  # noqa: F401
from .json import read_jsonl, write_jsonl  # noqa: F401
from .orc import read_orc, write_orc  # noqa: F401
from .parquet import compact_parquet, read_parquet, write_parquet  # noqa: F401
from .pysource import register as register_python_datasources  # noqa: F401
from .text import read_text_corpus  # noqa: F401
