"""Registry queries implemented THROUGH the Presto-dialect SQL front end.

Each query here is expressed as Presto-spelled SQL text and executed via
``Engine.sql`` (presto_copy_spark/engine.py), proving the transpiler on
unit-first datetime functions, TRY(), UNNEST WITH ORDINALITY, interval
literals, and Presto aggregate spellings.

Reference: presto-parser/src/main/antlr4/.../SqlBase.g4 (the reference's
canonical entry is SQL text); golden files under
presto-product-tests/src/main/resources/sql-tests/testcases/.
"""

from __future__ import annotations

from .registry import query  # noqa: F401

# Queries are registered below once the round-2 transpiler lands.
