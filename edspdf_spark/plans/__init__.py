from edspdf_spark.plans.pipeline import Pipeline, FACTORIES, load

__all__ = ["Pipeline", "FACTORIES", "load"]
