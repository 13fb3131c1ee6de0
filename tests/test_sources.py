"""Source/sink round-trips — re-expresses the reference's data tests
(/root/reference/tests/core/test_data.py: read X → pipeline → write Y with
a total-box-count invariant) as DataFrame assertions."""

from __future__ import annotations

import pytest

from edspdf_spark.fixtures import build_pages_df, gen_docs_pandas
from edspdf_spark.operators import extract_blocs


@pytest.fixture(scope="module")
def expected_blocs(spark):
    return extract_blocs(build_pages_df(spark, 30, partitions=2)).count()


def test_parquet_roundtrip(spark, tmp_path, expected_blocs):
    from edspdf_spark.sources.readers import read_pages_parquet
    from edspdf_spark.sources.writers import write_parquet

    p = str(tmp_path / "pages")
    write_parquet(build_pages_df(spark, 30, partitions=2), p, mode="overwrite")
    back = read_pages_parquet(spark, p)
    assert extract_blocs(back).count() == expected_blocs


def test_parquet_overwrite_guard(spark, tmp_path):
    from edspdf_spark.sources.writers import write_parquet

    p = str(tmp_path / "guard")
    df = build_pages_df(spark, 5)
    write_parquet(df, p)
    with pytest.raises(Exception):
        write_parquet(df, p)  # mode='error' refuses like the reference


def test_pandas_roundtrip(spark, expected_blocs):
    from edspdf_spark.sources.readers import from_pandas
    from edspdf_spark.sources.writers import to_pandas

    pdf = gen_docs_pandas(range(30))
    df = from_pandas(spark, pdf)
    assert extract_blocs(df).count() == expected_blocs
    out = to_pandas(df)
    assert len(out) == 30 and set(out.columns) == {"url", "warc_ts", "html", "text", "lang"}


def test_iterable_roundtrip(spark, expected_blocs):
    from edspdf_spark.sources.readers import from_iterable
    from edspdf_spark.sources.writers import to_iterable

    rows = [
        (r.url, r.warc_ts.to_pydatetime(), r.html, r.text, r.lang)
        for r in gen_docs_pandas(range(30)).itertuples(index=False)
    ]
    df = from_iterable(spark, rows)
    assert extract_blocs(df).count() == expected_blocs
    assert sum(1 for _ in to_iterable(df.select("url"))) == 30


def test_files_roundtrip(spark, tmp_path, expected_blocs):
    from edspdf_spark.sources.readers import read_files_binary
    from edspdf_spark.sources.writers import write_files

    d = str(tmp_path / "files")
    write_files(build_pages_df(spark, 30, partitions=2), d)
    back = read_files_binary(spark, d, glob="*")
    assert back.count() == 30
    assert extract_blocs(back).count() == expected_blocs


def test_scan_pruning_pushdown(spark, tmp_path):
    """Catalyst must push the lang filter and prune to (url, html)."""
    from edspdf_spark.sources.readers import read_pages_parquet
    from edspdf_spark.sources.writers import write_parquet

    p = str(tmp_path / "prune")
    write_parquet(build_pages_df(spark, 20), p, mode="overwrite")
    df = read_pages_parquet(spark, p, lang="en", columns=["url", "html"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    assert "text" not in plan.split("ReadSchema")[1][:200]


def test_annotation_sidecar_roundtrip(spark, tmp_path):
    """S1 sidecar: write <stem>.pdf + <stem>.json, read back with
    load_annotations=True → annotations attached where present, NULL
    elsewhere (reference data/files.py:97-103 attach-if-present)."""
    import json

    from edspdf_spark.sources.readers import read_files_binary
    from edspdf_spark.sources.writers import write_files

    from pyspark.sql import functions as F

    pages = spark.createDataFrame(
        [
            ("https://a.test/one", b"PAYLOAD-1", json.dumps({"label": "body"})),
            ("https://b.test/two.x", b"PAYLOAD-2", None),  # no sidecar
        ],
        "url string, html binary, annotations string",
    )
    out = str(tmp_path / "files")
    write_files(pages, out, annotations_col="annotations", suffix=".pdf")

    back = read_files_binary(spark, out, glob="*.pdf", load_annotations=True)
    rows = {bytes(r["html"]): r for r in back.collect()}
    assert len(rows) == 2
    assert json.loads(rows[b"PAYLOAD-1"]["annotations"]) == {"label": "body"}
    assert rows[b"PAYLOAD-2"]["annotations"] is None
    # the .json sidecars themselves must not appear as payload rows
    assert all(not r["url"].endswith(".json") for r in rows.values())


def test_write_training_shards_lays_out_permutation(spark, tmp_path):
    """Shard dirs are rank-sorted inside, and streaming shards 0..n-1
    reproduces exactly the with_shuffle_order permutation — the property
    a trainer relies on for reproducible data order."""
    import glob
    import os

    import pyarrow.parquet as pq

    from edspdf_spark.functions.quality import with_shuffle_order
    from edspdf_spark.sources.writers import write_training_shards

    df = spark.createDataFrame([(i, f"t{i}") for i in range(500)], "doc_id long, text string")
    p = str(tmp_path / "shards")
    write_training_shards(df, p, seed=7, n_shards=8)

    expected = [
        r.doc_id
        for r in sorted(
            with_shuffle_order(df, seed=7, n_shards=8).collect(),
            key=lambda r: (r.shuffle_shard, r.shuffle_rank, r.doc_id),
        )
    ]
    got = []
    shard_dirs = sorted(
        glob.glob(os.path.join(p, "shuffle_shard=*")),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )
    assert len(shard_dirs) == 8
    for d in shard_dirs:
        ranks_in_shard = []
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            t = pq.read_table(f)
            got.extend(t.column("doc_id").to_pylist())
            ranks_in_shard.extend(t.column("shuffle_rank").to_pylist())
        assert ranks_in_shard == sorted(ranks_in_shard)  # rank-sorted files
    assert got == expected  # the exact permutation, end to end
    # epoch 2: a different seed lays out a different order
    p2 = str(tmp_path / "shards2")
    write_training_shards(df, p2, seed=8, n_shards=8)
    got2 = []
    for d in sorted(
        glob.glob(os.path.join(p2, "shuffle_shard=*")),
        key=lambda x: int(x.rsplit("=", 1)[1]),
    ):
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            got2.extend(pq.read_table(f).column("doc_id").to_pylist())
    assert got2 != got and sorted(got2) == sorted(got)


def test_write_files_distinct_urls_never_collide(spark, tmp_path):
    """Sanitization collisions ('http://a/b' vs 'http://a_b') must not
    overwrite each other — the stem carries a digest of the full url."""
    import os

    from edspdf_spark.sources.writers import write_files

    df = spark.createDataFrame(
        [("http://a/b", b"one"), ("http://a_b", b"two")],
        "url string, html binary",
    )
    out = str(tmp_path / "files")
    write_files(df, out, suffix=".bin")
    files = sorted(os.listdir(out))
    assert len(files) == 2
    contents = sorted(open(os.path.join(out, f), "rb").read() for f in files)
    assert contents == [b"one", b"two"]


def test_read_pages_parquet_relative_filename(spark, tmp_path):
    """A dotted relative path like 'pages.parquet' scans the file — it
    must not be routed to catalog table 'parquet' in database 'pages'."""
    import os

    from edspdf_spark.sources.readers import read_pages_parquet
    from edspdf_spark.fixtures import build_pages_df

    build_pages_df(spark, 5).write.parquet(str(tmp_path / "pages.parquet"))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert read_pages_parquet(spark, "pages.parquet").count() == 5
    finally:
        os.chdir(cwd)
