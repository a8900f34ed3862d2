"""Engine facade: ``Engine.sql(text) -> DataFrame``.

Reference analogue: the whole query lifecycle of SURVEY §3 —
QueuedStatementResource → SqlParser → StatementAnalyzer → LogicalPlanner →
PlanOptimizers → scheduler → operators.  On Spark every one of those
stages is Catalyst's job; the engine keeps only (a) catalog bootstrap,
(b) a Presto→Spark SQL dialect shim, and (c) the compat function registry
(see functions/).

The dialect shim is deliberately light: Spark SQL already accepts the
overwhelming majority of Presto's ANSI surface.  We normalize the small
set of lexical differences and rely on registered compat functions for
name gaps.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_tables
from .functions import register_all
from .session import get_spark

__all__ = ["Engine"]

# Presto-name -> Spark-name rewrites that can't be SQL UDFs (aggregates,
# or functions whose arguments translate 1:1 so a token swap suffices).
_AGG_RENAMES = {
    "approx_distinct": "approx_count_distinct",
    "arbitrary": "any_value",
    "array_agg": "collect_list",
    "set_agg": "collect_set",
    "stddev": "stddev_samp",
    "variance": "var_samp",
}


class Engine:
    """Thin session wrapper: catalog + dialect shim + compat functions."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        self.tables = register_tables(self.spark, sf_dir)
        register_all(self.spark)

    # -- dialect -----------------------------------------------------------
    @staticmethod
    def transpile(sql: str) -> str:
        """Presto SQL -> Spark SQL (lexical normalization only).

        - double-quoted identifiers -> backticks (Presto quotes idents
          with ``"``; Spark treats ``"`` as string literal)
        - aggregate-name renames (approx_distinct, arbitrary, ...)
        """
        out = []
        i, n = 0, len(sql)
        while i < n:
            c = sql[i]
            if c == "'":  # skip string literal (with '' escape)
                j = i + 1
                while j < n:
                    if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                        j += 2
                    elif sql[j] == "'":
                        break
                    else:
                        j += 1
                out.append(sql[i : j + 1])
                i = j + 1
            elif c == '"':  # identifier quote -> backtick
                j = sql.find('"', i + 1)
                j = n - 1 if j < 0 else j
                out.append("`" + sql[i + 1 : j] + "`")
                i = j + 1
            else:
                out.append(c)
                i += 1
        text = "".join(out)
        for presto, spark_name in _AGG_RENAMES.items():
            text = re.sub(rf"\b{presto}\s*\(", f"{spark_name}(", text, flags=re.I)
        return text

    # -- API ---------------------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(self.transpile(text))

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def explain(self, text: str, mode: str = "formatted") -> str:
        """EXPLAIN — ExplainAnalyzeOperator analogue (plan text)."""
        from .plans.inspect import plan_string

        return plan_string(self.sql(text), mode)

    def analyze(self, name: str, columns: list[str] | None = None) -> None:
        """ANALYZE TABLE — StatisticsWriterOperator analogue; feeds CBO
        (spark.sql.cbo.enabled is on in session.py).  Temp views can't
        hold catalog stats, so the table is materialized into the
        session warehouse first (what a real deployment has anyway)."""
        if name in self.tables:
            stats_name = f"{name}_stats"
            self.spark.sql(f"DROP TABLE IF EXISTS {stats_name}")
            # a prior session may have left the managed location behind
            # (ephemeral in-memory catalog, persistent warehouse dir)
            import shutil

            warehouse = self.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            shutil.rmtree(
                f"{warehouse.removeprefix('file:')}/{stats_name}", ignore_errors=True
            )
            self.tables[name].write.mode("overwrite").saveAsTable(stats_name)
            name = stats_name
        cols = f" FOR COLUMNS {', '.join(columns)}" if columns else ""
        self.spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS{cols}")
