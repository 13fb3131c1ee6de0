"""A6 — merge same-label boxes into maximal non-overlapping rectangles.

Per-document iterative graph algorithm (reference
``edspdf/visualization/merge.py:11-113``): two same-key boxes are mergeable
iff their merged bbox overlaps no box of another key; maximal cliques of the
mergeability graph become the new keys; iterate until cliques stop
conflicting, then emit each group's bbox.

Graph algorithms don't map to DataFrame ops (SURVEY.md A6), so this runs as
``groupBy(url).applyInPandas`` — each document's box list is tiny. networkx
isn't available in this sandbox; ``_find_cliques`` is our own implementation
of the same Bron–Kerbosch-with-pivot algorithm networkx uses.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MERGED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("x0", T.DoubleType(), True),
        T.StructField("y0", T.DoubleType(), True),
        T.StructField("x1", T.DoubleType(), True),
        T.StructField("y1", T.DoubleType(), True),
        T.StructField("n_merged", T.IntegerType(), False),
    ]
)


def _find_cliques(adj: np.ndarray) -> Iterator[List[int]]:
    """Maximal cliques, Bron–Kerbosch with pivoting (iterative)."""
    n = len(adj)
    adj_sets = [set(np.flatnonzero(adj[i])) - {i} for i in range(n)]
    if n == 0:
        return
    Q: List[int] = []
    cand = set(range(n))
    subg = set(range(n))
    stack = []
    u = max(subg, key=lambda v: len(cand & adj_sets[v]))
    ext_u = cand - adj_sets[u]
    while True:
        if ext_u:
            q = ext_u.pop()
            cand.remove(q)
            Q.append(q)
            adj_q = adj_sets[q]
            subg_q = subg & adj_q
            if not subg_q:
                yield list(Q)
                Q.pop()
            else:
                cand_q = cand & adj_q
                if cand_q:
                    stack.append((subg, cand, ext_u))
                    subg, cand = subg_q, cand_q
                    u = max(subg, key=lambda v: len(cand & adj_sets[v]))
                    ext_u = cand - adj_sets[u]
                else:
                    yield list(Q)
                    Q.pop()
        else:
            if not stack:
                return
            Q.pop()
            subg, cand, ext_u = stack.pop()


def merge_boxes_kernel(
    labels: np.ndarray, coords: np.ndarray
) -> List[tuple]:
    """One document's (labels, [x0,x1,y0,y1]) → merged (label, x0, y0, x1,
    y1, n) tuples. Mirrors merge.py:30-113."""
    n = len(labels)
    if n == 0:
        return []
    merge_keys = np.unique(labels.astype(str), return_inverse=True)[1].copy()

    while True:
        adj = np.zeros((n, n), dtype=bool)
        for key in np.unique(merge_keys):
            key_filter = merge_keys == key
            x0, x1, y0, y1 = coords[key_filter].T
            obs = coords[~key_filter]
            A = (slice(None), None, None)
            B = (None, slice(None), None)
            merged_x0 = np.minimum(x0[A], x0[B])
            merged_x1 = np.maximum(x1[A], x1[B])
            merged_y0 = np.minimum(y0[A], y0[B])
            merged_y1 = np.maximum(y1[A], y1[B])
            if len(obs):
                obs_x0, obs_x1, obs_y0, obs_y1 = obs.T
                dx = np.minimum(merged_x1, obs_x1) - np.maximum(merged_x0, obs_x0)
                dy = np.minimum(merged_y1, obs_y1) - np.maximum(merged_y0, obs_y0)
                no_between = (~((dx > 0) & (dy > 0))).all(-1)
            else:
                no_between = np.ones(merged_x0.shape[:2], dtype=bool)
            idx = np.flatnonzero(key_filter)
            adj[idx[:, None], idx[None, :]] = no_between

        conflicting = False
        seen: set = set()
        for clique_idx, clique in enumerate(_find_cliques(adj)):
            for box_idx in clique:
                if box_idx in seen:
                    conflicting = True
                else:
                    seen.add(box_idx)
                    merge_keys[box_idx] = clique_idx
        if not conflicting:
            break

    x0, x1, y0, y1 = coords.T
    out = []
    for group_key in dict.fromkeys(merge_keys):
        idx = [i for i, k in enumerate(merge_keys) if k == group_key]
        first = idx[0]
        out.append(
            (
                labels[first],
                float(x0[idx].min()),
                float(y0[idx].min()),
                float(x1[idx].max()),
                float(y1[idx].max()),
                len(idx),
            )
        )
    return out


def merge_boxes(blocs: DataFrame) -> DataFrame:
    """blocs (labeled) → merged rectangles per (url)."""

    def per_doc(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp[~grp["error"]].sort_values(["page_num", "bloc_ord"], kind="stable")
        if not len(grp):
            return pd.DataFrame(columns=[f.name for f in MERGED_SCHEMA.fields])
        url = grp["url"].iloc[0]
        labels = grp["label"].to_numpy()
        coords = grp[["x0", "x1", "y0", "y1"]].to_numpy(dtype=np.float64)
        rows = [
            {
                "url": url,
                "label": r[0],
                "x0": r[1],
                "y0": r[2],
                "x1": r[3],
                "y1": r[4],
                "n_merged": r[5],
            }
            for r in merge_boxes_kernel(labels, coords)
        ]
        return pd.DataFrame(rows, columns=[f.name for f in MERGED_SCHEMA.fields])

    return blocs.groupBy("url").applyInPandas(per_doc, schema=MERGED_SCHEMA)
