"""Vectorized rectangle-overlap label alignment kernel.

NumPy re-expression of the reference's alignment kernel
(``edspdf/utils/alignment.py:28-56``), shared by the BIOUL/partition grouped
UDFs and by the test oracle for the pure-DataFrame mask classifier.

Semantics (all reproduced exactly):

* an implicit catch-all src box ``(-INF, INF, -INF, INF)`` labeled
  ``pollution_label`` is appended LAST (alignment.py:28-34);
* ``score = overlap / src_area`` with zero areas clamped to 1
  (alignment.py:46-51);
* scores where ``overlap / dst_area < threshold`` are zeroed
  (alignment.py:53-54);
* argmax over src boxes; ``np.argmax`` returns the FIRST maximal index, so
  ties — including the all-zero row of a zero-area dst box — go to the
  earliest src box (alignment.py:55-56).
"""

from __future__ import annotations

import numpy as np

INF = 100000  # alignment.py:9


def align_labels_kernel(
    src: np.ndarray,
    dst: np.ndarray,
    threshold: float = 0.0001,
) -> np.ndarray:
    """Return, for each dst box, the index of its matched src box.

    src : (n_src, 4) float64 [x0, x1, y0, y1] — WITHOUT the catch-all; the
          returned index equals n_src when the catch-all wins.
    dst : (n_dst, 4) float64 [x0, x1, y0, y1]
    """
    dst = np.asarray(dst, dtype=np.float64).reshape(-1, 4)
    if len(dst) == 0:
        return np.zeros(0, dtype=np.int64)
    src_full = np.concatenate(
        [np.asarray(src, dtype=np.float64).reshape(-1, 4), [[-INF, INF, -INF, INF]]],
        axis=0,
    )
    sx0, sx1, sy0, sy1 = (src_full[:, i][:, None] for i in range(4))
    dx0, dx1, dy0_, dy1_ = (dst[:, i][None, :] for i in range(4))

    dx = np.minimum(sx1, dx1) - np.maximum(sx0, dx0)
    dy = np.minimum(sy1, dy1_) - np.maximum(sy0, dy0_)
    overlap = np.clip(dx, 0, None) * np.clip(dy, 0, None)

    src_area = (sx1 - sx0) * (sy1 - sy0)  # (n_src+1, 1)
    dst_area = (dx1 - dx0) * (dy1_ - dy0_)  # (1, n_dst)
    src_area = np.where(src_area == 0, 1.0, src_area)
    dst_area = np.where(dst_area == 0, 1.0, dst_area)

    score = overlap / src_area
    score[(overlap / dst_area) < threshold] = 0.0
    return score.argmax(0)
