"""Synthesize an sf1-scale test dir (10× sf0.1) for cap-binding oracle
verification (VERDICT r4 #5): the LSH hot-bucket cap, drop monitor,
component truncation and SemDeDup serve-set behaviors only bind above the
driver's sf0.01 window, so the pair-generating queries deserve one
10×-larger Spark-vs-DuckDB pass.

Replication is DETERMINISTIC and dup-structured: copy k ∈ [0, 10) shifts
doc_id by k·N; docs with doc_id % 3 == 0 keep their text byte-identical
across copies (exact-dup mass → dedup caps bind), the rest get a per-copy
suffix token (near-dup mass → LSH band buckets bind). Embeddings replicate
unchanged under shifted vec_ids (10-way duplicate vectors → SemDeDup and
ANN serve stress). Everything is written with DuckDB so the Spark and
oracle sides read the very same parquet bytes; the remaining eight tables
copy over unchanged (the five target queries only scan documents +
embeddings).

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/edspdf_sf1)
Then:  python tools/check_oracles.py <out_dir> \
         lsh_candidate_pairs,lsh_neardup,dedup_components,semdedup,dedup_exact_normalized
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/edspdf_sf1"
COPIES = 10

TABLES = "region nation customer supplier part orders lineitem events".split()


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]

    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + k.k * {n_docs} AS doc_id,
                 CASE WHEN k.k = 0 OR d.doc_id % 3 = 0 THEN d.text
                      ELSE d.text || ' variant' || CAST(k.k AS VARCHAR)
                 END AS text,
                 d.lang, d.source,
                 CAST(len(CASE WHEN k.k = 0 OR d.doc_id % 3 = 0 THEN d.text
                      ELSE d.text || ' variant' || CAST(k.k AS VARCHAR) END)
                      AS BIGINT) AS n_chars
          FROM read_parquet('{SRC}/documents.parquet') d,
               (SELECT UNNEST(generate_series(0, {COPIES - 1})) AS k) k
          ORDER BY doc_id
        ) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + k.k * {n_vecs} AS vec_id, e.embedding
          FROM read_parquet('{SRC}/embeddings.parquet') e,
               (SELECT UNNEST(generate_series(0, {COPIES - 1})) AS k) k
          ORDER BY vec_id
        ) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    got = con.execute(
        f"SELECT count(*) FROM read_parquet('{OUT}/documents.parquet')"
    ).fetchone()[0]
    print(f"wrote {OUT}: {got} documents, {n_vecs * COPIES} embeddings")


if __name__ == "__main__":
    main()
