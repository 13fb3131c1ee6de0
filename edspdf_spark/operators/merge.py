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

#: Above this box count the exact clique merge degrades to a bounded
#: per-label-run bbox merge: each re-key round builds O(m² · n_other)
#: pairwise-bbox tensors per label group (a 1200-box document is ~10⁹
#: booleans per round — measured stalling a worker), so the exact path is
#: reserved for the visualization-sized documents it was designed for
#: (reference test fixtures are ≤ ~50 boxes/page).
MERGE_MAX_BOXES = 400

#: Maximal-clique enumeration is exponential in the worst case (a same-label
#: group that is ALMOST fully mergeable is a near-complete graph with holes —
#: observed on synthetic page geometry). One document may enumerate at most
#: this many cliques per round before degrading to the bounded fallback.
MERGE_MAX_CLIQUES = 10_000

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
                    # subg_q non-empty with cand_q empty: some ALREADY
                    # PROCESSED vertex extends Q, so Q is NOT maximal —
                    # Bron–Kerbosch (and networkx find_cliques) yields
                    # only on empty subg_q; yielding here emitted
                    # spurious subset cliques that re-marked seen boxes
                    # as conflicting and kept the re-key loop churning
                    Q.pop()
        else:
            if not stack:
                return
            Q.pop()
            subg, cand, ext_u = stack.pop()


def _run_merge_fallback(labels: np.ndarray, coords: np.ndarray) -> List[tuple]:
    """Bounded degenerate merge: one bbox per contiguous same-label run.
    Used when the exact clique merge would be unbounded in memory (giant
    documents) or time (exponential clique structure, non-terminating
    re-key cycles)."""
    n = len(labels)
    out = []
    start = 0
    for i in range(1, n + 1):
        if i == n or labels[i] != labels[start]:
            c = coords[start:i]
            out.append(
                (
                    labels[start],
                    float(c[:, 0].min()),
                    float(c[:, 2].min()),
                    float(c[:, 1].max()),
                    float(c[:, 3].max()),
                    i - start,
                )
            )
            start = i
    return out


def merge_boxes_kernel(
    labels: np.ndarray, coords: np.ndarray, max_iter: int = 20
) -> List[tuple]:
    """One document's (labels, [x0,x1,y0,y1]) → merged (label, x0, y0, x1,
    y1, n) tuples. Mirrors merge.py:30-113 — with one robustness addition:
    the reference's ``while True`` re-keying loop has NO termination
    guarantee (the clique relabeling can 2-cycle; observed on synthetic
    page geometry, where it hangs networkx and our Bron–Kerbosch alike), so
    the loop is bounded by ``max_iter`` and exits deterministically with
    the current grouping — one stuck document must never stall a 10^12-doc
    stage. Convergent inputs (every reference fixture) are unaffected."""
    n = len(labels)
    if n == 0:
        return []
    if n > MERGE_MAX_BOXES:
        # the pairwise-bbox tensors are O(n² · n_other) — a skewed multi-
        # thousand-box document would OOM the worker
        return _run_merge_fallback(labels, coords)
    merge_keys = np.unique(labels.astype(str), return_inverse=True)[1].copy()

    for _ in range(max_iter):
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
            if clique_idx >= MERGE_MAX_CLIQUES:
                # exponential clique structure — bounded fallback, one
                # stuck document must never stall the stage
                return _run_merge_fallback(labels, coords)
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
    """blocs (labeled) → merged rectangles per (url).

    Runs on the streaming sorted-partition form (operators/grouped.py)
    rather than ``groupBy.applyInPandas`` — one Arrow batch holds many
    documents; each document's tiny box list is sliced out with numpy
    boundary indices and fed to the per-doc clique kernel."""
    from pyspark.sql import functions as F

    from edspdf_spark.operators.grouped import group_bounds, map_url_groups

    out_cols = [f.name for f in MERGED_SCHEMA.fields]

    def flush(pdf: pd.DataFrame) -> pd.DataFrame:
        urls = pdf["url"].to_numpy()
        starts, ends = group_bounds(urls)
        labels_all = pdf["label"].to_numpy()
        coords_all = pdf[["x0", "x1", "y0", "y1"]].to_numpy(dtype=np.float64)
        rows = []
        for s, e in zip(starts, ends):
            for r in merge_boxes_kernel(labels_all[s:e], coords_all[s:e]):
                rows.append(
                    {
                        "url": urls[s],
                        "label": r[0],
                        "x0": r[1],
                        "y0": r[2],
                        "x1": r[3],
                        "y1": r[4],
                        "n_merged": r[5],
                    }
                )
        out = pd.DataFrame(rows, columns=out_cols)
        if not len(out):  # keep dtypes Arrow-castable on empty flushes
            out = pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols})
        return out

    good = blocs.filter(~F.col("error"))
    return map_url_groups(good, flush, MERGED_SCHEMA)
