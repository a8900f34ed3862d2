"""presto_copy_spark — PySpark-native engine with Presto-parity capabilities."""

from .engine import Engine
from .session import get_spark
from .catalog import register_tables, load_table, TABLES

__all__ = ["Engine", "get_spark", "register_tables", "load_table", "TABLES"]
