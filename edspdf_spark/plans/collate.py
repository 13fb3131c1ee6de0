"""X6 — training-data prep: preprocess / collate / compressed batch dicts.

Reference: ``Pipeline.preprocess_many`` + ``collate``
(``/root/reference/edspdf/pipeline.py:600-658``) and
``batch_compress_dict`` / ``decompress_dict``
(``/root/reference/edspdf/utils/collections.py:126-192``).

The reference's training prep walks PDFDoc objects per component and
serializes nested feature dicts, deduplicating values shared between
components (referential identity, keys merged with ``|``).  Here the
feature extraction is the engine's distributed operators (E1 layout
columns, E3 token features); this module owns the driver-side tail: turning
a per-doc grouped DataFrame into nested feature dicts, compressing shared
values, and batching — the shapes a torch training loop consumes.

Scale note: preprocessing itself stays distributed (``to_doc_dicts`` uses
``toLocalIterator`` so only one partition is resident driver-side at a
time); compress/collate operate per-batch, never on the whole corpus.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Iterator, List, Sequence

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# flatten / compress / decompress (utils/collections.py:126-192)
# ---------------------------------------------------------------------------


def _flatten(d: Any, path: str, out: List) -> None:
    if isinstance(d, dict):
        for k, v in d.items():
            _flatten(v, f"{path}/{k}" if path else str(k), out)
    else:
        out.append((path, d))


def discover_scheme(item: Dict[str, Any]) -> List[str]:
    """Discover the ``|``-merged key scheme from ONE item, like the
    reference's generated ``flatten`` (collections.py:100-123 + 156-162):
    paths whose values are the SAME object (referential identity) in the
    probe item are merged into a single key.  The scheme is structural —
    applied unchanged to every subsequent item so batch keys stay
    consistent for collation.

    Identity-merging applies ONLY to non-interned objects (arrays,
    lists, dicts, tensors — what the reference actually shares across
    components): Python interns small ints, bools, and short strings, so
    two UNRELATED scalar fields that happen to hold the same ``1`` would
    satisfy ``id(a) == id(b)`` and be merged — after which every later
    item silently takes the first path's value for both keys."""
    flat: List = []
    _flatten(item, "", flat)
    by_id: Dict[int, List[str]] = {}
    order: List[int] = []
    uniq = 0
    for path, value in flat:
        if isinstance(value, (int, float, bool, complex, str, bytes, type(None))):
            uniq += 1
            key = -uniq  # scalars never merge; id() is never negative
        else:
            key = id(value)
        if key not in by_id:
            order.append(key)
        by_id.setdefault(key, []).append(path)
    return ["|".join(by_id[k]) for k in order]


def _get_path(item: Dict[str, Any], path: str) -> Any:
    cur: Any = item
    for part in path.split("/"):
        cur = cur[part]
    return cur


def compress_dict(item: Dict[str, Any], scheme: Sequence[str]) -> Dict[str, Any]:
    """Flatten ``item`` under a fixed scheme: each merged key stores the
    value of its FIRST path (all merged paths held identical values in the
    probe item; the reference asserts this structurally by reusing the
    generated flatten code, collections.py:156-162)."""
    return {key: _get_path(item, key.split("|")[0]) for key in scheme}


def batch_compress_dict(seq: Iterable[Dict[str, Any]]) -> Iterator[Dict[str, Any]]:
    """Generator port of the reference's ``batch_compress_dict`` class:
    the scheme is discovered from the first item, then applied to all."""
    it = iter(seq)
    try:
        first = next(it)
    except StopIteration:
        return
    scheme = discover_scheme(first)
    yield compress_dict(first, scheme)
    for item in it:
        yield compress_dict(item, scheme)


def decompress_dict(obj: Dict[str, Any]) -> Dict[str, Any]:
    """Invert :func:`compress_dict` (collections.py:166-192): split merged
    ``|`` keys, rebuild the nested structure, shared values appear at every
    original path."""
    res: Dict[str, Any] = {}
    for key, value in obj.items():
        for path in key.split("|"):
            current = res
            parts = path.split("/")
            for part in parts[:-1]:
                current = current.setdefault(part, {})
            current[parts[-1]] = value
    return res


def ld_to_dl(seq: Sequence[Dict[str, Any]]) -> Dict[str, List]:
    """List-of-dicts → dict-of-lists (the reference's collate primitive)."""
    if not seq:
        return {}
    return {k: [d.get(k) for d in seq] for k in seq[0]}


def batchify(items: Iterable[Any], batch_size: int) -> Iterator[List[Any]]:
    """Reference ``utils/collections.py:batchify`` — fixed-size chunks."""
    batch: List[Any] = []
    for item in items:
        batch.append(item)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


# ---------------------------------------------------------------------------
# preprocess: per-doc nested feature dicts from a blocs DataFrame
# ---------------------------------------------------------------------------


def preprocess_doc_rows(rows: Sequence) -> Dict[str, Any]:
    """One document's BoxLayoutPreprocessor feature dict
    (box_layout_preprocessor.py:62-75): per-page lists of xmin/ymin/xmax/
    ymax/width/height/first_page/last_page.  ``rows`` are that url's bloc
    Rows sorted by (page_num, bloc_ord)."""
    pages: Dict[int, List] = {}
    for r in rows:
        pages.setdefault(r.page_num, []).append(r)
    page_nums = sorted(pages)
    last_p = page_nums[-1] if page_nums else 0
    feats = {
        "xmin": [], "ymin": [], "xmax": [], "ymax": [],
        "width": [], "height": [], "first_page": [], "last_page": [],
    }
    for p in page_nums:
        bs = pages[p]
        feats["xmin"].append([b.x0 for b in bs])
        feats["ymin"].append([b.y0 for b in bs])
        feats["xmax"].append([b.x1 for b in bs])
        feats["ymax"].append([b.y1 for b in bs])
        feats["width"].append([b.x1 - b.x0 for b in bs])
        feats["height"].append([b.y1 - b.y0 for b in bs])
        feats["first_page"].append([p == page_nums[0] for _ in bs])
        feats["last_page"].append([p == last_p for _ in bs])
    return feats


def to_doc_dicts(blocs: DataFrame) -> Iterator[Dict[str, Any]]:
    """Stream per-document feature dicts off a blocs DataFrame.

    The sort + url-grouping runs DISTRIBUTED (one shuffle on url);
    ``toLocalIterator`` then yields one partition at a time, so the driver
    never holds the corpus.  Each yielded dict is
    ``{"url": ..., "box_preprocessor": <BoxLayoutPreprocessor dict>}`` —
    the same nesting ``Pipeline.preprocess`` produces per component.
    """
    ordered = blocs.repartition("url").sortWithinPartitions(
        "url", "page_num", "bloc_ord"
    )
    current_url, current_rows = None, []
    for row in ordered.toLocalIterator(prefetchPartitions=True):
        if row.url != current_url:
            if current_rows:
                yield {
                    "url": current_url,
                    "box_preprocessor": preprocess_doc_rows(current_rows),
                }
            current_url, current_rows = row.url, []
        current_rows.append(row)
    if current_rows:
        yield {"url": current_url, "box_preprocessor": preprocess_doc_rows(current_rows)}


def preprocess_many(
    blocs: DataFrame, batch_size: int = 32, compress: bool = True
) -> Iterator[Dict[str, Any]]:
    """X6 end-to-end: doc dicts → (optional) compressed flat dicts →
    collated dict-of-lists batches (pipeline.py:600-658)."""
    docs = to_doc_dicts(blocs)
    stream: Iterable[Dict[str, Any]] = (
        batch_compress_dict(docs) if compress else docs
    )
    for batch in batchify(stream, batch_size):
        yield ld_to_dl(batch)
