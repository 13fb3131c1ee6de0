"""One scaling-bench job: full pipeline on a fixed corpus at a given core
count. Prints one JSON line. Run via tools/scaling_bench.py."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edspdf_spark import get_spark


def main():
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    n_docs = int(sys.argv[3])

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"scale-{cores}",
        shuffle_partitions=max(cores, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from edspdf_spark.operators import aggregate_simple, classify_mask, extract_blocs
    from edspdf_spark.skew import repartition_pages

    # warmup: JVM/codegen/Arrow init so the measured run is steady-state
    pages = spark.read.parquet(corpus)
    warm = aggregate_simple(
        classify_mask(
            extract_blocs(pages.limit(200)), [("body", 0.2, 0.3, 0.9, 0.6)], 0.1
        )
    )
    warm.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    out = aggregate_simple(
        classify_mask(
            extract_blocs(repartition_pages(pages, cores * 4)),
            [("body", 0.2, 0.3, 0.9, 0.6)],
            0.1,
        )
    )
    out.write.format("noop").mode("overwrite").save()
    secs = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "seconds": round(secs, 3),
                "docs_per_sec": round(n_docs / secs, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
