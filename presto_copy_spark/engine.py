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

from pyspark.sql import DataFrame, SparkSession

from . import dialect
from .catalog import register_tables
from .functions import register_all
from .session import get_spark

__all__ = ["Engine"]


class Engine:
    """Thin session wrapper: catalog + dialect shim + compat functions."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        self.tables = register_tables(self.spark, sf_dir)
        register_all(self.spark)

    # -- dialect -----------------------------------------------------------
    @staticmethod
    def transpile(sql: str) -> str:
        """Presto SQL -> Spark SQL — see presto_copy_spark.dialect for
        the full rule set (token-level: string literals and quoted
        identifiers are never touched by rewrites)."""
        return dialect.transpile(sql)

    # -- API ---------------------------------------------------------------
    def sql(self, text: str) -> DataFrame:
        return self.spark.sql(self.transpile(text))

    def execute(self, script: str) -> DataFrame | None:
        """Run a ``;``-separated multi-statement script (the Presto CLI /
        product-test file shape: DDL then queries), returning the last
        statement's DataFrame.  Splitting is token-aware — semicolons
        inside string literals or quoted identifiers never split."""
        stmts, cur = [], []
        for kind, tok in dialect.tokenize(script):
            if kind == "op" and tok == ";":
                stmts.append("".join(t for _, t in cur))
                cur = []
            else:
                cur.append((kind, tok))
        stmts.append("".join(t for _, t in cur))
        out: DataFrame | None = None
        for stmt in stmts:
            if stmt.strip():
                out = self.sql(stmt)
        return out

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- view DDL ----------------------------------------------------------
    # Reference: CreateViewTask / DropViewTask (presto-main/.../execution);
    # views are logical (SQL text expanded at query time), which is exactly
    # Spark's view semantics.  The dialect shim maps Presto's CREATE VIEW
    # to TEMPORARY (base tables are temp views); Presto-spelled SQL works
    # in the body.
    def create_view(self, name: str, presto_sql: str, replace: bool = True) -> None:
        rep = "OR REPLACE " if replace else ""
        self.sql(f"CREATE {rep}VIEW {name} AS {presto_sql}")

    def drop_view(self, name: str, if_exists: bool = True) -> None:
        ex = "IF EXISTS " if if_exists else ""
        self.sql(f"DROP VIEW {ex}{name}")

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
