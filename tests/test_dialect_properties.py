"""Property-based dialect invariants (hypothesis).

The transpiler's safety story rests on two lexical guarantees that unit
tests can only spot-check:

1. tokenize is LOSSLESS — concatenating the tokens reproduces the input
   byte-for-byte, for ANY text (the rewrite pass can therefore never
   corrupt the parts it doesn't understand).
2. string literals survive transpile UNTOUCHED — no rewrite rule ever
   fires inside quotes (the r1 regex shim's bug class).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from presto_copy_spark.dialect import tokenize, transpile

# SQL-ish soup: identifiers, operators, quotes, numbers, whitespace,
# unicode — anything the tokenizer might choke on.
_sql_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)

_ident = st.from_regex(r"[A-Za-z_][A-Za-z_0-9]{0,10}", fullmatch=True)
_literal_body = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="'"),
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(_sql_text)
def test_tokenize_is_lossless(text):
    assert "".join(t for _, t in tokenize(text)) == text


@settings(max_examples=200, deadline=None)
@given(_ident, _literal_body, _ident)
def test_string_literals_survive_transpile(col, lit, table):
    # embed rewrite-triggering names INSIDE the literal: none may fire
    payload = f"variance(x) TRY(a/b) date_add ARRAY[1] decimal '9' {lit}"
    quoted = "'" + payload.replace("'", "''") + "'"
    sql = f"SELECT {col}, {quoted} AS s FROM {table}"
    out = transpile(sql)
    assert quoted in out, (sql, out)


@settings(max_examples=100, deadline=None)
@given(st.lists(_ident, min_size=1, max_size=5))
def test_call_renames_never_touch_bare_identifiers(names):
    # identifiers NOT followed by '(' must pass through verbatim even if
    # they collide with rename-table entries
    sql = "SELECT " + ", ".join(["variance", "array_agg", *names]) + " FROM t"
    assert transpile(sql) == sql
