"""Feed/HTTP-payload parsers — SURVEY §2.1 S7 (RSS) and S10 (chart API).

The reference fetches RSS per category (``news_service_rss.py:106-212``)
and the Yahoo chart API (``yahoo_finance_service.py:20-59``) over the
network. The network fetch stays outside the engine; what the engine owns
is the *parse*: raw XML/JSON payload columns → typed rows. Both parsers are
pure column expressions (xpath / from_json + arrays_zip), so a table of
fetched payloads fans out to parsed records with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_rss_items(feeds: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(feed_url, xml) → one row per <item>: title, link, description
    (HTML-stripped), pubDate. xpath extracts are JVM builtins.

    Items are exploded positionally (xpath returns aligned arrays per
    field — the same shape feedparser yields)."""
    titles = F.expr(f"xpath({xml_col}, '//item/title/text()')")
    links = F.expr(f"xpath({xml_col}, '//item/link/text()')")
    descs = F.expr(f"xpath({xml_col}, '//item/description/text()')")
    dates = F.expr(f"xpath({xml_col}, '//item/pubDate/text()')")
    zipped = F.arrays_zip(
        titles.alias("title"), links.alias("link"),
        descs.alias("description"), dates.alias("pub_date"),
    )
    return (
        feeds.select("feed_url", F.explode(zipped).alias("item"))
        .select(
            "feed_url",
            F.col("item.title").alias("title"),
            F.col("item.link").alias("link"),
            F.regexp_replace(F.col("item.description"), "<[^<]+?>", "").alias(
                "description"
            ),
            F.col("item.pub_date").alias("pub_date"),
        )
    )


CHART_SCHEMA = (
    "struct<chart: struct<result: array<struct<"
    "meta: struct<symbol: string>, "
    "timestamp: array<long>, "
    "indicators: struct<quote: array<struct<"
    "open: array<double>, high: array<double>, "
    "low: array<double>, close: array<double>>>>>>>>"
)


def parse_chart_payload(payloads: DataFrame, json_col: str = "payload") -> DataFrame:
    """(payload JSON string) → (symbol, ts, open, high, low, close) rows —
    the Yahoo-chart shape: parallel arrays zipped positionally."""
    parsed = F.from_json(F.col(json_col), CHART_SCHEMA)
    r0 = parsed.getField("chart").getField("result").getItem(0)
    q0 = r0.getField("indicators").getField("quote").getItem(0)
    zipped = F.arrays_zip(
        r0.getField("timestamp").alias("ts"),
        q0.getField("open").alias("open"),
        q0.getField("high").alias("high"),
        q0.getField("low").alias("low"),
        q0.getField("close").alias("close"),
    )
    return payloads.select(
        r0.getField("meta").getField("symbol").alias("symbol"),
        F.explode(zipped).alias("bar"),
    ).select(
        "symbol",
        F.timestamp_seconds(F.col("bar.ts")).alias("ts"),
        F.col("bar.open").alias("open"),
        F.col("bar.high").alias("high"),
        F.col("bar.low").alias("low"),
        F.col("bar.close").alias("close"),
    )
