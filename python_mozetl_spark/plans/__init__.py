from python_mozetl_spark.plans.queries import REGISTRY, Query  # noqa: F401
