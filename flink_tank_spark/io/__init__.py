from flink_tank_spark.io.tables import TABLES, load_table, register_tables

__all__ = ["TABLES", "load_table", "register_tables"]
