"""Query-runner CLI: execute any registry query and print its result —
the interactive surface replacing the reference's serve loop
(``/root/reference/amazon1.py:191-210,332``: probe a query, print the
result table, wait for the next one), generalized to every registered
operator.

Usage::

    python -m bigdataamazon_spark <query_name> [sf_dir] [--limit N]
    python -m bigdataamazon_spark --list
    python -m bigdataamazon_spark <query_name> --explain   # plan census
    python -m bigdataamazon_spark --report out.html [sf_dir] [--open]

``--report`` writes the reference's full figure set (describe/top-N
tables, histogram, KDE, correlation heatmap, scatters, word cloud) as
one standalone SVG-in-HTML page (``report.py``); ``--open`` launches it
in the default browser (``amazon1.py:38-39,332``).

``--explain`` defers to the plan-audit CLI (python -m
bigdataamazon_spark.plans) so both surfaces stay consistent.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    from . import queries as registry

    names = sorted(registry.queries())
    if not argv or argv[0] in ("--help", "-h"):
        print(__doc__)
        return 0
    if argv[0] == "--list":
        print("\n".join(names))
        return 0
    if argv[0] == "--report":
        if len(argv) < 2 or argv[1].startswith("--"):
            print("usage: --report OUT.html [sf_dir] [--open]", file=sys.stderr)
            return 2
        out = argv[1]
        rest = argv[2:]
        open_browser = "--open" in rest
        rest = [a for a in rest if a != "--open"]
        sf_dir = rest[0] if rest else "/root/testdata/sf0.01"

        from .report import write_analytics_report
        from .session import get_spark

        path = write_analytics_report(
            get_spark("report"), sf_dir, out, open_browser=open_browser
        )
        print(f"wrote {path}")
        return 0
    name = argv[0]
    if name not in names:
        print(f"unknown query {name!r}; try --list", file=sys.stderr)
        return 2
    rest = argv[1:]
    if "--explain" in rest:
        from .plans.__main__ import main as plans_main

        return plans_main([name] + [a for a in rest if a != "--explain"])
    limit = 20
    if "--limit" in rest:
        i = rest.index("--limit")
        limit = int(rest[i + 1])
        rest = rest[:i] + rest[i + 2 :]
    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"

    from .session import get_spark

    spark = get_spark("query-run")
    df = registry.queries()[name](spark, sf_dir)
    n = df.count()
    df.show(limit, truncate=False)
    print(f"# {name} @ {sf_dir}: {n} rows ({min(n, limit)} shown)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
