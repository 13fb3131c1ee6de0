"""Streaming per-document grouping: the scale-safe replacement for
``groupBy.applyInPandas``.

``groupBy(url).applyInPandas`` materializes one pandas DataFrame PER GROUP —
measured on this engine at 120k docs: the aggregate stage was 53 s of an
83 s pipeline, almost all per-group pandas machinery. The streaming form
keeps the same shuffle (repartition by url) but sorts on the JVM side
(Tungsten) and hands the Python worker large Arrow batches; url groups are
sliced out of each batch with numpy boundary indices, and the partition's
trailing — possibly batch-spanning — group is carried over to the next
batch. Used by the simple/markdown aggregators (P6/P7), the random
classifier (P5) and the box merger (A6).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def map_url_groups(
    df: DataFrame,
    flush: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    order_cols: Sequence = ("page_num", "bloc_ord"),
) -> DataFrame:
    """``repartition(url) → sortWithinPartitions(url, *order_cols) →
    mapInPandas`` where ``flush`` receives frames containing only COMPLETE
    url groups (rows of one url are contiguous and never split across two
    ``flush`` calls)."""

    def stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: Optional[pd.DataFrame] = None
        for pdf in batches:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
                buf = None
            if not len(pdf):
                continue
            urls = pdf["url"].to_numpy()
            # the partition is url-sorted, so the (possibly batch-spanning)
            # last group starts at the first occurrence of the last url
            cut = int(np.argmax(urls == urls[-1]))
            buf = pdf.iloc[cut:]
            if cut:
                yield flush(pdf.iloc[:cut])
        if buf is not None and len(buf):
            yield flush(buf)

    part = df.repartition("url").sortWithinPartitions("url", *order_cols)
    return part.mapInPandas(stream, schema=schema)


def group_bounds(urls: np.ndarray):
    """(starts, ends) index pairs of the contiguous url runs in a frame."""
    change = np.nonzero(urls[1:] != urls[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(urls)]))
    return starts, ends
