from flink_tank_spark.plans.registry import QuerySpec, all_queries

__all__ = ["QuerySpec", "all_queries"]
