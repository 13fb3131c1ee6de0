"""applyInPandasWithState cross-batch url dedup lineage."""

from __future__ import annotations

import datetime as dt

import pandas as pd


def _write_batch(spark, path, rows):
    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    from edspdf_spark.schemas import PAGES_SCHEMA

    spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def test_dedup_stream_first_seen(spark, tmp_path):
    from edspdf_spark.streaming.stream import dedup_stream_first_seen, read_pages_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: u1 twice (different hours), u2 once
    _write_batch(
        spark,
        src,
        [
            ("u1", _ts(1), b"x", "", "en"),
            ("u1", _ts(2), b"x", "", "en"),
            ("u2", _ts(3), b"x", "", "fr"),
        ],
    )
    q = dedup_stream_first_seen(read_pages_stream(spark, src), out, ckpt)
    q.awaitTermination()

    first = {r.url: r for r in spark.read.parquet(out).collect()}
    assert first["u1"].n_dups_so_far == 1 and first["u2"].n_dups_so_far == 0
    assert first["u1"].first_seen == _ts(1)

    # batch 2: u1 re-crawled, u3 new — state must carry across restarts
    _write_batch(spark, src, [("u1", _ts(9), b"x", "", "en"), ("u3", _ts(9), b"x", "", "de")])
    q2 = dedup_stream_first_seen(read_pages_stream(spark, src), out, ckpt)
    q2.awaitTermination()

    rows = spark.read.parquet(out).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    assert max(r.n_dups_so_far for r in by_url["u1"]) == 2
    assert all(r.first_seen == _ts(1) for r in by_url["u1"])  # state kept first ts
    assert max(r.n_dups_so_far for r in by_url["u3"]) == 0
    # deduped first-seen view: one (url, first_seen, lang) regardless of row count
    assert {(r.url, r.lang) for r in by_url["u1"]} == {("u1", "en")}
