"""Ingestion sniffing + structured-streaming surface."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from datamatcher_spark.sources.ingest import (
    detect_encoding,
    detect_separator,
    load_csv,
    load_file,
    load_pipe_noisy,
)
from datamatcher_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    run_to_table,
    windowed_counts,
)


def test_encoding_and_separator_sniffing(tmp_path):
    p1 = tmp_path / "semi.csv"
    p1.write_text("a;b;c\n1;2;3\n4;5;6\n", encoding="utf-8")
    assert detect_separator(p1) == ";"

    p2 = tmp_path / "cp1250.csv"
    p2.write_bytes("kolumna,wartość\nzażółć,gęślą\n".encode("cp1250"))
    enc = detect_encoding(p2)
    assert enc in ("cp1250", "cp1252", "latin1")  # utf-8 must be rejected
    assert enc != "utf-8"


def test_load_csv_sniffed(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("key|name\n1|alpha\n2|beta\n", encoding="utf-8")
    df = load_csv(spark, p)
    assert df.columns == ["key", "name"]
    assert df.count() == 2


def test_load_pipe_noisy_drops_malformed(spark, tmp_path):
    p = tmp_path / "noisy.txt"
    p.write_text('kod|sciezka\n1|a "quoted" path\n2|ok\n', encoding="utf-8")
    df = load_pipe_noisy(spark, p)
    assert df.count() == 2
    assert 'a "quoted" path' in {r.sciezka for r in df.collect()}


def test_load_file_dispatch(spark, tmp_path):
    # .xlsx, .xls and .xlsb all dispatch to stdlib codecs now (tests/
    # test_xlsx_conflicts.py, tests/test_round6.py) — every reference
    # Excel engine (file_handlers.py:84-90) has a native twin
    from datamatcher_spark.sources.xlsb import write_xlsb

    p_xlsb = tmp_path / "x.xlsb"
    write_xlsb([["k"], ["v1"]], p_xlsb)
    assert load_file(spark, p_xlsb).count() == 1
    with pytest.raises(ValueError, match="unsupported"):
        load_file(spark, tmp_path / "x.bin")
    df = load_file(spark, "/root/testdata/sf0.001/region.parquet")
    assert df.count() > 0


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    src = tmp_path / "events_in"
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "props", F.col("props").cast("string")
    ).repartition(4).write.parquet(str(src))
    return str(src)


def test_windowed_counts_stream_matches_batch(spark, tmp_path, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    assert stream.isStreaming
    out = tmp_path / "agg_out"
    run_to_table(
        windowed_counts(stream), str(out), str(tmp_path / "ckpt"), mode="append"
    )
    got = spark.read.parquet(str(out))
    batch = (
        spark.read.parquet(events_stream_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .count()
    )
    # append mode emits only watermark-closed windows; everything emitted
    # must match the batch answer exactly
    assert 0 < got.count() <= batch.count()
    joined = got.join(
        batch.select(
            F.col("window.start").alias("window_start"), "event_type",
            F.col("count").alias("n_batch"),
        ),
        ["window_start", "event_type"],
    )
    assert joined.count() == got.count()
    assert joined.filter("n != n_batch").count() == 0


def test_dedup_stream(spark, tmp_path, events_stream_dir):
    stream = read_events_stream(spark, events_stream_dir)
    out = tmp_path / "dedup_out"
    run_to_table(dedup_stream(stream), str(out), str(tmp_path / "ckpt2"))
    got = spark.read.parquet(str(out))
    n_src = spark.read.parquet(events_stream_dir).count()
    assert got.count() == n_src  # event_ids are unique in the fixture
    assert got.select("event_id").distinct().count() == n_src
