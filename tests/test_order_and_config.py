"""P10/P11 pairwise-feature skeleton and the X8 config round-trip."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.order import ORDER_FEATURE_COLS, pairwise_order_features


def _ref_pair_features(bi, bj):
    """Independent transcription of the reference feature math
    (trainable_order_ba.py:165-221), quirks included (min-union,
    half-extent 'centres')."""

    def delta(a, b):
        ax0, ay0, ax1, ay1 = a
        bx0, by0, bx1, by1 = b
        axc, ayc = (ax1 - ax0) / 2, (ay1 - ay0) / 2
        aw, ah = ax1 - ax0, ay1 - ay0
        bxc, byc = (bx1 - bx0) / 2, (by1 - by0) / 2
        bw, bh = bx1 - bx0, by1 - by0
        return [
            (axc - bxc) / aw,
            (ayc - byc) / ah,
            math.log(aw / bw),
            math.log(ah / bh),
            (bxc - axc) / bw,
            (byc - ayc) / bh,
        ]

    u = (
        min(bi[0], bj[0]),
        min(bi[1], bj[1]),
        min(bi[2], bj[2]),
        min(bi[3], bj[3]),
    )
    return delta(bi, bj) + delta(bi, u) + delta(bj, u)


def test_pairwise_order_features_match_reference_math(spark):
    from edspdf_spark.schemas import BLOC_SCHEMA

    boxes = {
        0: (0.1, 0.1, 0.9, 0.2),
        1: (0.1, 0.3, 0.45, 0.42),
        2: (0.55, 0.3, 0.9, 0.45),
    }
    rows = [
        ("d", 0, i, x0, y0, x1, y1, f"t{i}", [], None, False)
        for i, (x0, y0, x1, y1) in boxes.items()
    ]
    blocs = spark.createDataFrame(rows, BLOC_SCHEMA)
    out = pairwise_order_features(blocs)
    got = {(r["ord_i"], r["ord_j"]): [r[c] for c in ORDER_FEATURE_COLS] for r in out.collect()}
    assert len(got) == 6  # 3 blocs → 6 ordered pairs
    for (i, j), vals in got.items():
        exp = _ref_pair_features(boxes[i], boxes[j])
        assert vals == pytest.approx(exp, rel=1e-12), (i, j)


def test_pairwise_order_scorer_hook(spark):
    from edspdf_spark.schemas import BLOC_SCHEMA

    rows = [
        ("d", 0, i, 0.1, 0.1 * (i + 1), 0.9, 0.1 * (i + 1) + 0.05, f"t{i}", [], None, False)
        for i in range(3)
    ]
    blocs = spark.createDataFrame(rows, BLOC_SCHEMA)

    def scorer(df):
        # stand-in for the broadcast pairwise model (a Pandas UDF in prod):
        # any deterministic function of the feature columns
        return df.withColumn("score", -F.abs(F.col("dij_log_h")) - F.col("ord_j"))

    out = pairwise_order_features(blocs, scorer=scorer)
    assert "score" in out.columns
    from pyspark.sql import Window

    best = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("url", "page_num", "ord_i")
                .orderBy(F.col("score").desc(), F.col("ord_j"))
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    follows = {r["ord_i"]: r["ord_j"] for r in best}
    # equal heights → log_h term is 0 for every pair; -ord_j decides
    assert follows == {0: 1, 1: 0, 2: 0}


def test_pipeline_config_roundtrip(spark, tmp_path):
    from edspdf_spark.fixtures import build_pages_df
    from edspdf_spark.plans import Pipeline, load

    config = {
        "pipeline": ["extractor", "classifier", "aggregator"],
        "components": {
            "extractor": {"@factory": "extractor", "extract_style": True},
            "classifier": {
                "@factory": "mask-classifier",
                "x0": 0.0, "y0": 0.0, "x1": 1.0, "y1": 0.6, "threshold": 0.1,
            },
            "aggregator": {"@factory": "simple-aggregator"},
        },
    }
    pipe = Pipeline.from_config(config)
    assert pipe.to_config() == config  # exact inverse

    art = str(tmp_path / "model")
    pipe.to_disk(art)
    reloaded = load(art)
    assert reloaded.to_config() == config

    pages = build_pages_df(spark, 12, partitions=2)
    a = sorted((r["url"], r["label"], r["text"]) for r in pipe(pages).collect())
    b = sorted((r["url"], r["label"], r["text"]) for r in reloaded(pages).collect())
    assert a == b and len(a) > 0


def test_load_rejects_unknown_factory():
    from edspdf_spark.plans import Pipeline

    with pytest.raises(KeyError, match="unknown factory"):
        Pipeline.from_config(
            {"pipeline": ["x"], "components": {"x": {"@factory": "nope"}}}
        )


def test_embedding_pipeline_from_config(spark, tmp_path):
    """X8 × E-stack: an extract → E2 embed → E6 contextualize pipeline
    assembled purely from a JSON config round-trips and runs."""
    from edspdf_spark.fixtures import build_pages_df
    from edspdf_spark.plans import Pipeline, load

    config = {
        "pipeline": ["extractor", "embedding", "transformer"],
        "components": {
            "extractor": {"@factory": "extractor", "extract_style": False},
            "embedding": {"@factory": "box-layout-embedding", "size": 24, "seed": 7},
            "transformer": {"@factory": "box-transformer", "dim": 24, "n_heads": 4},
        },
    }
    pipe = Pipeline.from_config(config)
    art = str(tmp_path / "emb_model")
    pipe.to_disk(art)
    reloaded = load(art)
    assert reloaded.to_config() == config

    pages = build_pages_df(spark, 6, partitions=2)
    out = reloaded(pages).collect()
    assert len(out) > 0
    assert all(len(r.emb) == 24 for r in out)
