"""CSV source: the reference's input contract, Spark-first (S2 + E1).

The reference reads one Kaggle CSV with inferred schema and then fixes
the types imperatively (``/root/reference/amazon1.py:24-59``). At scale
the schema is declared up front (no inference pass, no surprise type
drift between files) and the whole E1 cleaning stage compiles to one
narrow projection — no shuffle, fully codegen'd, evaluated in the same
stage as the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import cleaning

# The 9-column Kaggle "All Electronics" schema implied by column usage in
# the reference (SURVEY.md §1.2, FIXTURES.md §A). Everything arrives as a
# string — prices/ratings carry currency symbols and separators, so typed
# ingest would reject exactly the rows the cleaning stage exists for.
PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("main_category", T.StringType()),
        T.StructField("sub_category", T.StringType()),
        T.StructField("image", T.StringType()),
        T.StructField("link", T.StringType()),
        T.StructField("ratings", T.StringType()),
        T.StructField("no_of_ratings", T.StringType()),
        T.StructField("discount_price", T.StringType()),
        T.StructField("actual_price", T.StringType()),
    ]
)

_AMAZON_PREFIX = "https://www.amazon.in/"


def read_products_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference's product CSV (or a glob of them) with the
    explicit schema — header row honored, quotes/escapes RFC-ish,
    malformed rows kept as nulls (PERMISSIVE) so cleaning can decide."""
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .schema(PRODUCTS_SCHEMA)
        .csv(path)
    )


def clean_products(raw: DataFrame) -> DataFrame:
    """The reference's full E1+E2-prep cleaning stage as ONE projection.

    Reproduces, in order (``/root/reference/amazon1.py:51-59,87-89,
    119-124,128,163-176``):
    numeric cleaning of the 4 price/rating columns -> discount_diff /
    discount_pct (fill-then-clip, the reference's exact order) ->
    drop exact duplicates -> drop null names -> normalized search_terms
    -> image_id / link_id extraction.

    Everything except dropDuplicates is narrow (no shuffle); the dedup
    shuffles once on all 9 raw columns, same as ``drop_duplicates()``.
    """
    cleaned = raw.withColumns(
        {
            "ratings_cleaned": cleaning.clean_numeric("ratings"),
            "no_of_ratings_cleaned": cleaning.clean_numeric(
                "no_of_ratings", allow_decimal=False
            ),
            "discount_price_cleaned": cleaning.clean_numeric("discount_price"),
            "actual_price_cleaned": cleaning.clean_numeric("actual_price"),
        }
    )
    diff = F.col("actual_price_cleaned") - F.col("discount_price_cleaned")
    pct = diff / F.col("actual_price_cleaned") * F.lit(100.0)
    cleaned = cleaned.withColumns(
        {
            "discount_diff": diff,
            "discount_pct": cleaning.fill_then_clip(pct, 0.0, 0.0, 100.0),
        }
    )
    deduped = cleaned.dropDuplicates(PRODUCTS_SCHEMA.fieldNames()).na.drop(
        subset=["name"]
    )
    return deduped.withColumns(
        {
            "search_terms": F.regexp_replace(
                F.lower(F.col("name")), r"[^\w \t\n\r\f\x0B]+", " "
            ),
            "image_id": cleaning.extract_between(
                "image", r"images/", r"\._AC_UL320_\.jpg"
            ),
            "link_id": cleaning.strip_prefix("link", _AMAZON_PREFIX),
        }
    )
