"""HTML report sink — the reference's only tabular output format.

The reference writes two kinds of HTML: a head-N table dump
(``/root/reference/amazon1.py:36-39``) and a templated recommendation
report over a ≤5-row result (``:218-266``, ``:282-330``). Both are
driver-side presentations of a BOUNDED result, so the engine-side
contract is: cap the rows explicitly, collect once, render locally.
Nothing here distributes — that's the point; an HTML file is not a
data sink, and an uncapped ``collect`` is the classic driver OOM.
"""

from __future__ import annotations

import html as _html

from pyspark.sql import DataFrame


def to_html_table(df: DataFrame, *, max_rows: int = 100) -> str:
    """Render at most ``max_rows`` rows as an escaped HTML table.

    ``limit`` runs distributed (Spark plans CollectLimit — executors
    stop after enough rows); only the capped result reaches the driver.
    """
    rows = df.limit(max_rows).collect()
    cols = df.columns
    head = "<tr>" + "".join(f"<th>{_html.escape(c)}</th>" for c in cols) + "</tr>"
    body = "".join(
        "<tr>"
        + "".join(
            f"<td>{_html.escape('' if r[c] is None else str(r[c]))}</td>" for c in cols
        )
        + "</tr>"
        for r in rows
    )
    return f"<table>\n<thead>{head}</thead>\n<tbody>{body}</tbody>\n</table>"


def write_html_report(
    df: DataFrame, path: str, *, title: str = "Report", max_rows: int = 100
) -> None:
    """Write a standalone HTML page for a bounded result (S5/S6)."""
    table = to_html_table(df, max_rows=max_rows)
    doc = (
        "<!DOCTYPE html>\n<html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title></head>\n"
        f"<body><h1>{_html.escape(title)}</h1>\n{table}\n</body></html>\n"
    )
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)
