"""Source-layer tests: cp949 CSV fallback (S5), nested JSON (S6),
vector-index sink/source roundtrip (S11-S13), in-memory bootstrap (S14),
catalog ops (S3/S4)."""

from __future__ import annotations

import csv
import shutil
import tempfile

from pyspark.sql import functions as F

from backend_fastapi_spark.core.catalog import Catalog
from backend_fastapi_spark.sources.csv_source import (
    parse_fruit_prices,
    read_csv_with_fallback,
)
from backend_fastapi_spark.sources.json_source import read_grocery_deals
from tests.conftest import SF_ORACLE

FRUIT_CSV = "/root/repo/data/fruit_prices.csv"


def test_encoding_fallback_decodes_cp949(spark):
    df = read_csv_with_fallback(spark, FRUIT_CSV)
    series = {r[0] for r in df.select("_c0").distinct().collect()}
    assert series == {"바나나", "사과", "포도"}  # mojibake-free decode


def test_fruit_price_parse_matches_python_golden(spark):
    # python-side golden: decode + parse the same file directly
    with open(FRUIT_CSV, encoding="cp949", newline="") as fh:
        rows = list(csv.reader(fh))
    golden = {}
    for s, d, p in rows:
        key = (s, d.replace(".", "-"))
        golden.setdefault(key, []).append(float(p.replace(",", "")))
    golden = {k: sum(v) / len(v) for k, v in golden.items()}

    parsed = parse_fruit_prices(read_csv_with_fallback(spark, FRUIT_CSV))
    daily = (
        parsed.groupBy("series_id", "date")
        .agg((F.sum("price") / F.count("price")).alias("price"))
        .collect()
    )
    assert len(daily) == len(golden)
    for r in daily:
        assert abs(golden[(r.series_id, str(r.date))] - r.price) < 1e-9


def test_grocery_json_explode(spark):
    flat = read_grocery_deals(spark)
    assert flat.columns == [
        "category", "product", "unit", "store", "price", "location", "discount",
    ]
    n_products = flat.select("product").distinct().count()
    assert n_products == 20
    per = flat.groupBy("product").count().agg(F.min("count"), F.max("count")).head()
    assert per[0] >= 4 and per[1] <= 6


def test_vector_index_sink_roundtrip(spark):
    """S11/S12/S13: write chunks partitioned by index_name, append an
    increment, read back partition-pruned."""
    tmp = tempfile.mkdtemp(prefix="vecidx_")
    try:
        emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        chunks = emb.withColumn(
            "index_name", F.when(F.col("vec_id") % 2 == 0, "even").otherwise("odd")
        )
        chunks.write.partitionBy("index_name").mode("overwrite").parquet(tmp)
        # S13 upsert: append a new partition increment
        more = emb.limit(5).withColumn("index_name", F.lit("delta"))
        more.write.partitionBy("index_name").mode("append").parquet(tmp)

        back = spark.read.parquet(tmp)
        assert back.count() == emb.count() + 5
        pruned = back.filter(F.col("index_name") == "delta")
        assert pruned.count() == 5
        # partition pruning visible in the plan
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "delta" in plan or pruned.rdd.getNumPartitions() <= 4
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_in_memory_bootstrap_and_catalog(spark):
    """S14 seed-row bootstrap + S3/S4 catalog ops."""
    seed = spark.createDataFrame(
        [(1, "어텐션 메커니즘", "active"), (2, "Transformer", "active")],
        ["id", "term", "status"],
    )
    seed.createOrReplaceTempView("knowledge_seed")
    got = spark.sql("SELECT term FROM knowledge_seed ORDER BY id").collect()
    assert [r.term for r in got] == ["어텐션 메커니즘", "Transformer"]

    cat = Catalog(spark, SF_ORACLE)
    tables = cat.list_tables()
    assert "lineitem" in tables and "embeddings" in tables
    cols = dict(cat.describe("orders"))
    assert cols["o_orderkey"] == "bigint"
    assert cols["o_orderdate"] in ("timestamp", "timestamp_ntz")


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """ORC write -> read preserves schema and every value (timestamps,
    arrays, strings) vs the parquet-sourced original."""
    from backend_fastapi_spark.sources.orc_source import read_orc, write_orc
    from backend_fastapi_spark.sources.parquet import read_table
    from tests.conftest import SF_SMOKE

    for t in ("orders", "embeddings", "documents"):
        src = read_table(spark, SF_SMOKE, t)
        write_orc(src, str(tmp_path / t))
        back = read_orc(spark, str(tmp_path / t))
        assert back.schema == src.schema
        a = sorted(map(repr, src.collect()))
        b = sorted(map(repr, back.collect()))
        assert a == b


def test_binary_file_source_to_multimodal_features(spark, tmp_path):
    """binaryFile directory -> MEDIA_SCHEMA -> feature extraction: kinds
    derive from extensions, payload bytes survive intact (checksum
    matches), ids are stable across re-reads, glob pruning works."""
    import hashlib

    from backend_fastapi_spark.operators.multimodal import extract_features
    from backend_fastapi_spark.sources.binary_files import read_binary_dir

    payloads = {
        "a.jpg": b"\xff\xd8fakejpeg",
        "b.wav": b"RIFFfakewav",
        "sub/c.mp4": b"\x00\x00fakempeg",
        "d.txt": b"not media",
    }
    for rel, data in payloads.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)

    df = read_binary_dir(spark, str(tmp_path))
    rows = {r.meta["path"].split("/")[-1]: r for r in df.collect()}
    assert rows["a.jpg"].kind == "image"
    assert rows["b.wav"].kind == "audio"
    assert rows["c.mp4"].kind == "video"
    assert rows["d.txt"].kind == "binary"
    assert bytes(rows["a.jpg"].payload) == b"\xff\xd8fakejpeg"
    assert all(r.media_id is not None and r.media_id >= 0
               for r in rows.values())

    # ids stable across re-reads (path-hash, not listing order)
    again = {r.meta["path"].split("/")[-1]: r.media_id
             for r in read_binary_dir(spark, str(tmp_path)).collect()}
    assert {k: v.media_id for k, v in rows.items()} == again

    # glob prunes before reading bytes
    only_jpg = read_binary_dir(spark, str(tmp_path), glob="*.jpg").collect()
    assert len(only_jpg) == 1 and only_jpg[0].kind == "image"

    # media rows flow straight into the multimodal extractor
    feats = {r.media_id: r for r in extract_features(
        df.filter(df.kind != "binary")).collect()}
    jpg = feats[rows["a.jpg"].media_id]
    assert jpg.n_bytes == len(b"\xff\xd8fakejpeg")
    assert jpg.checksum == hashlib.md5(b"\xff\xd8fakejpeg").hexdigest()


def test_write_orc_refuses_overlapping_overwrite(spark, tmp_path):
    import pytest

    from backend_fastapi_spark.sources.orc_source import read_orc, write_orc

    p = str(tmp_path / "t_orc")
    write_orc(spark.range(10), p)
    df = read_orc(spark, p)
    for dst in (p, f"{p}/inner", str(tmp_path)):
        with pytest.raises(ValueError, match="overlaps input"):
            write_orc(df, dst)
    # disjoint path still fine
    write_orc(df, str(tmp_path / "t_orc2"))


def test_footer_row_count_contract(spark, tmp_path):
    """footer_row_count: exact count for plain file/dir-of-parts layouts,
    and None — never 0 — for nested/hive layouts and missing paths (0
    would route a 100 TB table down a small-input fast path)."""
    from backend_fastapi_spark.sources.parquet import footer_row_count

    assert footer_row_count("/root/testdata/sf0.01", "embeddings") == 500
    # dir-of-parts
    df = spark.range(123)
    df.write.parquet(str(tmp_path / "flat.parquet"))
    assert footer_row_count(str(tmp_path), "flat") == 123
    # hive-partitioned: files live in subdirs -> unknown, not zero
    df.withColumn("p", F.col("id") % 2).write.partitionBy("p").parquet(
        str(tmp_path / "nested.parquet")
    )
    assert footer_row_count(str(tmp_path), "nested") is None
    assert footer_row_count(str(tmp_path), "missing") is None
    # MIXED layout (top-level parts AND partition subdirs): counting only
    # the top-level files would UNDERCOUNT — must be None, never a partial
    # count (ADVICE r09).
    df.write.parquet(str(tmp_path / "mixed.parquet"))
    df.withColumn("p", F.col("id") % 2).write.partitionBy("p").mode(
        "append"
    ).parquet(str(tmp_path / "mixed.parquet"))
    assert footer_row_count(str(tmp_path), "mixed") is None
