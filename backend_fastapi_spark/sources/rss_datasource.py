"""Custom Python DataSource (Spark 4 API): RSS feed files as a table.

Spark 4's ``pyspark.sql.datasource`` lets a pure-Python connector plug
into the normal reader path — ``spark.read.format("rss").load(dir)`` —
with schema, partition planning, and Arrow-batched row delivery handled
by the engine. This is the idiomatic Spark-4 home for the reference's
feed ingestion (news_service_rss.py fetches per category then parses);
here each feed FILE is one input partition, so a directory of fetched
feeds parses in parallel across executors with no driver loop.

Two layers, deliberately separate:
- this DataSource turns files into (feed_url, xml) payload ROWS —
  I/O + partitioning only;
- the existing column-expression parser (`feeds.parse_rss_items`, JVM
  xpath builtins) turns payloads into items. The DataSource also
  exposes the pre-parsed per-item shape directly (option
  ``parse=items``) for one-step reads, using the same stdlib
  ElementTree semantics the parser golden-tests pin.

Scale posture: ``partitions()`` returns one partition per file — Spark
schedules them like any file source; a million-feed crawl fans out to
a million tasks batched by the scheduler. Payload bytes are read inside
``read()`` on the executor, never on the driver.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

def _items_mode(options) -> bool:
    """ONE normalization shared by schema() and read() — if the two
    methods interpreted the option independently, a typo'd value could
    get RAW rows emitted against the ITEM schema (Arrow failure at
    runtime). Unknown values are rejected outright."""
    v = options.get("parse", "raw").lower()
    if v not in ("raw", "items"):
        raise ValueError(f"rss datasource: parse must be raw|items, got {v!r}")
    return v == "items"


RAW_SCHEMA = "feed_url string, xml string"
ITEM_SCHEMA = (
    "feed_url string, title string, link string, "
    "description string, pub_date string"
)


class RssDataSource(DataSource):
    """``spark.read.format("rss").option("parse", "items").load(path)``.

    ``path`` is a file or directory (``*.xml``/``*.rss`` globbed).
    ``parse`` = "raw" (default: one row per feed file) | "items"
    (one row per <item>).
    """

    @classmethod
    def name(cls) -> str:
        return "rss"

    def schema(self) -> str:
        return ITEM_SCHEMA if _items_mode(self.options) else RAW_SCHEMA

    def reader(self, schema: StructType) -> "RssReader":
        return RssReader(self.options)


class _FeedFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RssReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rss datasource requires a path: .load(path)")
        self.items_mode = _items_mode(options)

    def partitions(self):
        if os.path.isfile(self.path):
            files = [self.path]
        else:
            files = sorted(
                f
                for pat in ("*.xml", "*.rss")
                for f in glob.glob(os.path.join(self.path, "**", pat),
                                   recursive=True)
            )
        # one partition per feed file: executor-side reads, file-grain
        # parallelism (the same granularity binaryFile gives)
        return [_FeedFile(f) for f in files]

    def read(self, partition: _FeedFile):
        # When partitions() found no files it returns [] and pyspark
        # substitutes a single None partition (verified in 4.1.2's
        # plan_data_source_read) — yield nothing: an empty directory is
        # an empty DataFrame, not an executor AttributeError.
        if partition is None:
            return
        from pathlib import Path

        with open(partition.path, encoding="utf-8") as f:
            xml = f.read()
        # well-formed file URI (file:///abs/path) even for relative
        # input paths — f"file://{path}" would make the first segment
        # of a relative path parse as the URI authority
        url = Path(partition.path).resolve().as_uri()
        if not self.items_mode:
            yield (url, xml)
            return
        # items mode: stdlib ElementTree, one row per <item> with
        # per-item None for missing fields. NOTE: on items with MISSING
        # fields this is deliberately MORE correct than
        # parse_rss_items, whose positional arrays_zip misaligns
        # across items when one item lacks a tag — the golden parity
        # test pins equivalence on well-formed feeds only.
        import re
        import xml.etree.ElementTree as ET

        root = ET.fromstring(xml)
        for item in root.iter("item"):
            def _text(tag):
                el = item.find(tag)
                return el.text if el is not None and el.text else None

            desc = _text("description")
            if desc is not None:
                desc = re.sub(r"<[^<]+?>", "", desc)
            yield (url, _text("title"), _text("link"), desc,
                   _text("pubDate"))


def register_rss_source(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("rss")`` resolves to RssDataSource."""
    spark.dataSource.register(RssDataSource)
