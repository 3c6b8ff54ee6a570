"""Round-trip tests for the CSV / JSONL / partitioned-parquet paths
(sources/formats.py): every hop must be lossless against the fixture
tables, including timestamps, NULLs, and quoted text.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs686_big_data_p1_spark.sources import formats
from cs686_big_data_p1_spark.tables import SCHEMAS, load_table
from tests.conftest import SF_SMALL


def _rowset(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("table", ["orders", "documents"])
def test_csv_roundtrip(spark, tmp_path, table):
    src = load_table(spark, SF_SMALL, table)
    path = str(tmp_path / f"{table}_csv")
    formats.write_csv(src, path, n_files=2)
    back = formats.read_csv(spark, path, SCHEMAS[table])
    assert back.schema == src.schema
    assert _rowset(back) == _rowset(src)


@pytest.mark.parametrize("table", ["orders", "documents"])
def test_jsonl_roundtrip(spark, tmp_path, table):
    src = load_table(spark, SF_SMALL, table)
    path = str(tmp_path / f"{table}_jsonl")
    formats.write_jsonl(src, path, n_files=2)
    back = formats.read_jsonl(spark, path, SCHEMAS[table])
    assert back.schema == src.schema
    assert _rowset(back) == _rowset(src)


def test_csv_null_vs_empty_string(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, 'say "hi", ok')], "id int, s string"
    )
    path = str(tmp_path / "nulls_csv")
    formats.write_csv(df, path, n_files=1)
    back = formats.read_csv(
        spark, path, df.schema
    )
    got = {r.id: r.s for r in back.collect()}
    assert got == {1: None, 2: "", 3: 'say "hi", ok'}


def test_jsonl_ingest_to_parquet(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "documents")
    jsonl = str(tmp_path / "drop_jsonl")
    pq = str(tmp_path / "typed_parquet")
    formats.write_jsonl(src, jsonl, n_files=2)
    typed = formats.jsonl_ingest_to_parquet(
        spark, jsonl, pq, SCHEMAS["documents"]
    )
    assert _rowset(typed) == _rowset(src)


def test_partitioned_parquet_prunes(spark, tmp_path):
    src = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_by_lang")
    formats.write_parquet_partitioned(src, path, ["lang"])
    back = spark.read.parquet(path)
    one = back.where(F.col("lang") == "en")
    # partition filter must reach the scan: PartitionFilters in the plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        one.explain(mode="formatted")
    text = buf.getvalue()
    assert "PartitionFilters" in text and "lang" in text
    want = src.where(F.col("lang") == "en")
    assert one.count() == want.count()


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC: lossless round-trip incl. timestamps/NULLs, and — unlike
    the text formats — predicate pushdown must reach the ORC scan."""
    import io
    from contextlib import redirect_stdout

    from cs686_big_data_p1_spark.sources.formats import read_orc, write_orc
    from cs686_big_data_p1_spark.tables import SCHEMAS, load_table

    src = load_table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)
    back = read_orc(spark, path, SCHEMAS["orders"])
    assert back.schema == src.schema
    a = {tuple(r) for r in src.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    filtered = back.where(F.col("o_orderkey") == 42).select("o_orderkey")
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain(mode="formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "o_orderkey" in plan


def test_upsert_parquet_partitioned(spark, tmp_path):
    """Upsert semantics on a plain parquet store: updated keys replace,
    new keys insert, untouched partitions keep their files (dynamic
    overwrite never rewrites them), and the op is idempotent."""
    import os

    from pyspark.sql import functions as F

    from cs686_big_data_p1_spark.sources.formats import (
        upsert_parquet_partitioned,
    )

    path = str(tmp_path / "store")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "id long, part string, v long"
    )
    upsert_parquet_partitioned(spark, path, base, ["id"], "part")

    def mtimes(part):
        d = os.path.join(path, f"part={part}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    b_before = mtimes("b")
    updates = spark.createDataFrame(
        [(2, "a", 99), (4, "a", 40)], "id long, part string, v long"
    )
    upsert_parquet_partitioned(spark, path, updates, ["id"], "part")
    got = {
        (r.id, r.part, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {(1, "a", 10), (2, "a", 99), (3, "b", 30), (4, "a", 40)}
    assert mtimes("b") == b_before, "untouched partition was rewritten"

    # idempotent: same updates again -> same contents
    upsert_parquet_partitioned(spark, path, updates, ["id"], "part")
    again = {
        (r.id, r.part, r.v)
        for r in spark.read.parquet(path).collect()
    }
    assert again == got


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """200 tiny part-files compact to the metadata-computed width with
    exact content parity; a generous target yields a single file."""
    import os

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 2000).withColumn("v", F.col("id") * 3)
    df.repartition(200).write.parquet(src)
    n_parts = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    assert n_parts == 200

    n_out = formats.compact_parquet(spark, src, out, target_bytes=1 << 40)
    assert n_out == 1
    produced = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(produced) == 1
    got = {(r.id, r.v) for r in spark.read.parquet(out).collect()}
    assert got == {(i, i * 3) for i in range(2000)}

    # small target: width = ceil(total/target), still content-exact
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    target = max(1, total // 7)
    out2 = str(tmp_path / "compacted7")
    n_out2 = formats.compact_parquet(spark, src, out2, target_bytes=target)
    assert n_out2 == -(-total // target)
    assert len(
        [f for f in os.listdir(out2) if f.endswith(".parquet")]
    ) == n_out2
    got2 = {(r.id, r.v) for r in spark.read.parquet(out2).collect()}
    assert got2 == {(i, i * 3) for i in range(2000)}
