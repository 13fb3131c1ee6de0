from edspdf_spark.ml.forest import RandomForest, train_forest_on_masks, classify_forest

__all__ = ["RandomForest", "train_forest_on_masks", "classify_forest"]
