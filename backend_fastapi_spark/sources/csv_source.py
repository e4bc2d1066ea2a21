"""CSV source with encoding fallback — SURVEY §2.1 S5.

The reference's fruit-price CSVs are cp949-or-utf8 with unnamed positional
columns (``src/modules/price_forecast/data_utils.py:11-18``,
``src/routers/price_forecast.py:21-27``). Spark reads with an explicit
encoding; the fallback probes utf-8 first and switches to cp949 when the
decode produced replacement characters (U+FFFD), mirroring the reference's
try/except ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENCODINGS = ("UTF-8", "cp949")


def read_csv_with_fallback(
    spark: SparkSession, path: str, encodings: tuple[str, ...] = ENCODINGS
) -> DataFrame:
    """Try each encoding; reject a parse whose string columns contain the
    Unicode replacement char (signature of a wrong decode)."""
    # Spark 4 restricts CSV charsets by default; legacy flag re-enables the
    # full Java charset set (cp949 included).
    spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    last = None
    for enc in encodings:
        df = (
            spark.read.option("header", "false")
            .option("encoding", enc)
            .csv(path)
        )
        last = df
        str_cols = [f.name for f in df.schema.fields]
        bad = df.filter(
            F.concat_ws("", *[F.coalesce(F.col(c), F.lit("")) for c in str_cols]).contains(
                "�"
            )
        ).limit(1)
        if not bad.take(1):
            return df
    return last


def parse_fruit_prices(df: DataFrame) -> DataFrame:
    """Positional columns (series, 'YYYY.MM.DD', '1,234') → typed rows:
    comma-strip numeric parse + dotted date parse (§2.8)."""
    c = df.columns
    return df.select(
        F.col(c[0]).alias("series_id"),
        F.to_date(F.col(c[1]), "yyyy.MM.dd").alias("date"),
        F.regexp_replace(F.col(c[2]), ",", "").cast("double").alias("price"),
    )
