from koalas_spark.plans.session import CONSTANT_DIMS, dim, get_spark

__all__ = ["CONSTANT_DIMS", "dim", "get_spark"]
