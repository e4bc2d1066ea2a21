"""Feed-parser tests (S7 RSS via xpath, S10 chart payload via from_json)."""

from __future__ import annotations

import json

from backend_fastapi_spark.sources.feeds import parse_chart_payload, parse_rss_items

RSS_XML = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>정치 뉴스</title>
  <item>
    <title>첫 번째 기사</title>
    <link>https://news.example/a1</link>
    <description>&lt;p&gt;본문 &lt;a href="x"&gt;요약&lt;/a&gt;입니다&lt;/p&gt;</description>
    <pubDate>Mon, 12 Aug 2024 09:00:00 +0900</pubDate>
  </item>
  <item>
    <title>Second article</title>
    <link>https://news.example/a2</link>
    <description>plain text body</description>
    <pubDate>Tue, 13 Aug 2024 10:30:00 +0900</pubDate>
  </item>
</channel></rss>"""


def test_parse_rss_items(spark):
    feeds = spark.createDataFrame([("https://news.example/rss", RSS_XML)],
                                  ["feed_url", "xml"])
    rows = parse_rss_items(feeds).collect()
    assert len(rows) == 2
    assert rows[0].title == "첫 번째 기사"
    assert rows[0].description == "본문 요약입니다"      # HTML stripped
    assert rows[1].link == "https://news.example/a2"
    assert "2024" in rows[1].pub_date


def test_parse_chart_payload(spark):
    payload = json.dumps(
        {
            "chart": {
                "result": [
                    {
                        "meta": {"symbol": "TEST"},
                        "timestamp": [1704067200, 1704070800],
                        "indicators": {
                            "quote": [
                                {
                                    "open": [10.0, 10.5],
                                    "high": [10.6, 10.9],
                                    "low": [9.9, 10.4],
                                    "close": [10.5, 10.8],
                                }
                            ]
                        },
                    }
                ]
            }
        }
    )
    df = spark.createDataFrame([(payload,)], ["payload"])
    rows = parse_chart_payload(df).collect()
    assert len(rows) == 2
    assert rows[0].symbol == "TEST"
    assert str(rows[0].ts) == "2024-01-01 00:00:00"
    assert rows[1].close == 10.8
    # change/pct-change chain (tool_executor.py:314-317) on parsed bars
    change = rows[1].close - rows[0].close
    assert abs(change - 0.3) < 1e-9


def test_rss_python_datasource(spark, tmp_path):
    """Spark-4 custom Python DataSource: a directory of feed files reads
    through spark.read.format('rss') — raw mode yields one payload row
    per file (one input partition each); items mode matches the
    column-expression parser (parse_rss_items) row for row."""
    from backend_fastapi_spark.sources.rss_datasource import (
        register_rss_source,
    )

    (tmp_path / "politics.xml").write_text(RSS_XML, encoding="utf-8")
    second = RSS_XML.replace("news.example", "other.example")
    (tmp_path / "economy.rss").write_text(second, encoding="utf-8")
    (tmp_path / "notafeed.txt").write_text("ignored", encoding="utf-8")

    register_rss_source(spark)

    raw = spark.read.format("rss").load(str(tmp_path))
    assert raw.count() == 2  # .txt not globbed
    assert raw.rdd.getNumPartitions() == 2  # one partition per feed file

    items = (
        spark.read.format("rss").option("parse", "items")
        .load(str(tmp_path))
        .collect()
    )
    assert len(items) == 4
    by_title = {r.title: r for r in items}
    assert by_title["첫 번째 기사"].description == "본문 요약입니다"
    assert by_title["Second article"].link == "https://news.example/a2"

    # items mode agrees with the JVM xpath parser on the same payloads
    parsed = parse_rss_items(raw).select(
        "title", "link", "description", "pub_date"
    ).collect()
    a = sorted((r.title, r.link, r.description) for r in parsed)
    b = sorted((r.title, r.link, r.description) for r in items)
    assert a == b


def test_rss_datasource_empty_dir_and_bad_option(spark, tmp_path):
    """No matching feed files -> empty DataFrame (pyspark substitutes a
    None partition for an empty partitions() list — must not crash);
    unknown parse value -> clear error, not schema/read divergence."""
    import pytest

    from backend_fastapi_spark.sources.rss_datasource import (
        register_rss_source,
    )

    register_rss_source(spark)
    empty = tmp_path / "nothing"
    empty.mkdir()
    assert spark.read.format("rss").load(str(empty)).count() == 0

    with pytest.raises(Exception, match="raw.?items|parse"):
        spark.read.format("rss").option("parse", "item").load(
            str(empty)
        ).count()
