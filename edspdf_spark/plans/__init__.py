from edspdf_spark.plans.pipeline import Pipeline, FACTORIES

__all__ = ["Pipeline", "FACTORIES"]
