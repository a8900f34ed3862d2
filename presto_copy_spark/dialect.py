"""Presto SQL -> Spark SQL transpiler (token-level).

Reference: the reference engine's canonical entry point is SQL text
through a 907-line ANTLR grammar (presto-parser/src/main/antlr4/
com/facebook/presto/sql/parser/SqlBase.g4; SqlParser.java:49,
AstBuilder.java).  Spark SQL already accepts the overwhelming majority
of that ANSI surface, so this module is a *dialect shim*, not a parser:
it tokenizes the text (so string literals and quoted identifiers are
never touched by rewrites) and fixes the known lexical/semantic deltas:

- ``"ident"`` (with ``""`` escapes) -> ```ident``` backtick quoting
- aggregate-name renames (``approx_distinct`` -> ``approx_count_distinct``,
  ``variance`` -> ``var_samp``, ...) applied only at call sites
- unit-first datetime calls: ``date_add('day', n, ts)`` ->
  ``timestampadd(DAY, n, ts)``; ``date_diff`` -> ``timestampdiff``
  (Spark's timestampdiff matches Presto's day-aware truncating
  semantics — DateTimeFunctions.java:760 diffTimestamp)
- MySQL-style format strings: ``date_format(ts, '%Y-%m-%d')`` /
  ``date_parse(s, fmt)`` -> Java patterns (DateTimeFunctions.java:996)
- ``TRY(expr)`` (TryFunction.java) -> ``try_cast`` / ``try_divide`` /
  ``try_add`` / ``try_subtract`` / ``try_multiply`` /
  ``try_element_at`` for the expressible shapes; other expressions are
  left wrapped in parens (under ANSI mode they would raise — documented)
- typed literals: ``decimal '1.23'`` -> ``CAST('1.23' AS DECIMAL(p,s))``
  with Presto's literal-derived precision/scale
- ``tpch.<schema>.<table>`` / ``hive.`` qualified names -> bare table
  (the engine registers fixtures as unqualified temp views)
- ``CROSS JOIN UNNEST(e) [WITH ORDINALITY] AS t(c...)`` ->
  ``LATERAL VIEW`` explode/posexplode/inline forms (1-based ordinality
  preserved; empty/null arrays drop the row exactly like Presto)
- ORDER BY null-ordering: Presto sorts NULL as larger than any value,
  Spark as smaller — every sort item without an explicit modifier gets
  NULLS LAST (ASC) / NULLS FIRST (DESC), incl. window ORDER BY
- ``TABLESAMPLE BERNOULLI/SYSTEM (p)`` -> ``TABLESAMPLE (p PERCENT)``
- window fixups: frame clauses on ranking/lag/lead are stripped (Presto
  ignores them, Spark rejects), and rank-family windows with no ORDER BY
  get a constant one (Presto all-rows-peers semantics)
- literal ``color``/``rgb``/``render``/``bar`` calls constant-fold to
  byte-exact ColorFunctions.java output (ANSI-256, awt-HSB gradients)

Everything else (``||`` concat, interval literals, window frames,
GROUPING SETS, approx_percentile 2-arg, ...) passes through untouched
because Spark's surface already agrees.
"""

from __future__ import annotations

import re

__all__ = ["transpile", "tokenize", "PrestoFeatureUnsupportedError"]


class PrestoFeatureUnsupportedError(NotImplementedError):
    """Raised for Presto surface the engine documents as unsupported
    (SURVEY §1.2) — a clear transpiler-level message instead of Spark's
    downstream parse error.  Reference types: StandardTypes.java:42-43
    (TIME / TIME WITH TIME ZONE), :55-57 (TIMESTAMP WITH TIME ZONE)."""

    def __init__(self, feature: str):
        super().__init__(f"unsupported: {feature} (documented gap, SURVEY §1.2)")

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------
# token kinds: str qid word num op ws comment
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|/\*.*?\*/)
  | (?P<str>'(?:[^']|'')*')
  | (?P<qid>"(?:[^"]|"")*")
  | (?P<num>\d+(?:\.\d*)?(?:[eE][+-]?\d+)?|\.\d+)
  | (?P<word>[A-Za-z_][A-Za-z_0-9$]*)
  | (?P<op><=>|<>|!=|<=|>=|\|\||=>|->|.)
    """,
    re.VERBOSE | re.DOTALL,
)


def tokenize(sql: str) -> list[tuple[str, str]]:
    """Split SQL into (kind, text) tokens; lossless concatenation."""
    out: list[tuple[str, str]] = []
    pos = 0
    for m in _TOKEN_RE.finditer(sql):
        if m.start() != pos:  # unreachable: pattern has a catch-all
            out.append(("op", sql[pos : m.start()]))
        out.append((m.lastgroup, m.group()))
        pos = m.end()
    if pos < len(sql):
        out.append(("op", sql[pos:]))
    return out


def _is_sig(tok: tuple[str, str]) -> bool:
    return tok[0] not in ("ws", "comment")


def _next_sig(tokens: list, i: int) -> int:
    """Index of next significant token at/after i, or len(tokens)."""
    while i < len(tokens) and not _is_sig(tokens[i]):
        i += 1
    return i


def _match_paren(tokens: list, i: int) -> int:
    """tokens[i] == '('; return index of matching ')'."""
    depth = 0
    for j in range(i, len(tokens)):
        k, t = tokens[j]
        if k == "op" and t == "(":
            depth += 1
        elif k == "op" and t == ")":
            depth -= 1
            if depth == 0:
                return j
    raise ValueError("unbalanced parentheses in SQL")


def _split_args(tokens: list, lo: int, hi: int) -> list[list]:
    """Split tokens[lo:hi] (inside a call's parens) on top-level commas."""
    args: list[list] = []
    cur: list = []
    depth = 0
    for j in range(lo, hi):
        k, t = tokens[j]
        if k == "op" and t in ("(", "["):
            depth += 1
        elif k == "op" and t in (")", "]"):
            depth -= 1
        if k == "op" and t == "," and depth == 0:
            args.append(cur)
            cur = []
        else:
            cur.append(tokens[j])
    if cur or args:
        args.append(cur)
    return [a for a in args]


def _strip(arg: list) -> list:
    while arg and not _is_sig(arg[0]):
        arg = arg[1:]
    while arg and not _is_sig(arg[-1]):
        arg = arg[:-1]
    return arg


def _render_tokens(tokens: list) -> str:
    return "".join(t for _, t in tokens)


def _str_value(tok: tuple[str, str]) -> str:
    """Literal value of a 'str' token."""
    return tok[1][1:-1].replace("''", "'")


# ---------------------------------------------------------------------------
# rewrite rules
# ---------------------------------------------------------------------------
# simple call-site renames (Presto name -> Spark name); applied only when
# followed by '(' so column names are never touched.
_CALL_RENAMES = {
    "approx_distinct": "approx_count_distinct",
    "arbitrary": "any_value",
    "array_agg": "collect_list",
    "set_agg": "collect_set",
    "stddev": "stddev_samp",
    "variance": "var_samp",
    "json_extract": "get_json_object",
    # json_extract_scalar keeps its own name: the registered compat macro
    # returns NULL for non-scalar results (Presto semantics), which a bare
    # get_json_object rename would not.
    "zip": "arrays_zip",
    "regexp_like": "rlike",
    # lambda predicates (ArrayFunctions.java anyMatch/allMatch): Spark
    # spells them exists/forall; none_match needs a NOT wrap (below)
    "any_match": "exists",
    "all_match": "forall",
    # Presto contains(array, elem) (ArrayContains.java); Presto has no
    # string contains, so the rename is unambiguous in Presto-spelled SQL
    "contains": "array_contains",
    # split_to_map is NOT renamed to str_to_map: Presto splits on
    # LITERAL delimiters, Spark's str_to_map on regexes — the compat
    # macro (compat.py) regex-quotes the delimiters instead.
    "ends_with": "endswith",
    "regexp_split": "split",
    "week": "weekofyear",  # DateTimeFunctions.java week == week_of_year
    # BitwiseFunctions.java aggregate twins (Spark names)
    "bitwise_and_agg": "bit_and",
    "bitwise_or_agg": "bit_or",
    "bitwise_xor_agg": "bit_xor",
    # HLL sketch constructor (ApproximateSetAggregation.java) -> the
    # Datasketches twin; merge/cardinality accessors stay type-dependent
    # (documented in COVERAGE) so only the unambiguous name is renamed
    "approx_set": "hll_sketch_agg",
    # SetDigest constructor/merger (SetDigestFunctions.java) over the
    # theta twin — same rename policy as qdigest_agg -> KLL below; the
    # minhash-register surface stays a documented typed error
    "make_set_digest": "theta_sketch_agg",
    "merge_set_digest": "theta_union_agg",
    # qdigest/tdigest surface (QuantileDigestFunctions.java,
    # TDigestFunctions.java) over Spark's Datasketches KLL double sketch
    # (the engine's digest model — COVERAGE.md): the rename carries the
    # quantile/value LITERAL through to the Spark builtin, which demands
    # a foldable rank argument (a CREATE FUNCTION macro parameter is not
    # foldable — that blocked the macro form).
    "value_at_quantile": "kll_sketch_get_quantile_double",
    "quantile_at_value": "kll_sketch_get_rank_double",
    "qdigest_agg": "kll_sketch_agg_double",
    "tdigest_agg": "kll_sketch_agg_double",
    # theta-sketch accessor aliases (SetDigest/theta twins — COVERAGE.md)
    "sketch_theta_estimate": "theta_sketch_estimate",
}

_TIME_UNITS = {
    "microsecond": "MICROSECOND",
    "millisecond": "MILLISECOND",
    "second": "SECOND",
    "minute": "MINUTE",
    "hour": "HOUR",
    "day": "DAY",
    "week": "WEEK",
    "month": "MONTH",
    "quarter": "QUARTER",
    "year": "YEAR",
}

_MYSQL_TO_JAVA = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%i", "mm"),
    ("%s", "ss"),
    ("%f", "SSSSSS"),
    ("%T", "HH:mm:ss"),
    ("%j", "DDD"),
    ("%a", "EEE"),
    ("%W", "EEEE"),
    ("%M", "MMMM"),
    ("%b", "MMM"),
    ("%e", "d"),
    ("%k", "H"),
    ("%%", "%"),
]


def _mysql_to_java(fmt: str) -> str:
    for a, b in _MYSQL_TO_JAVA:
        fmt = fmt.replace(a, b)
    return fmt


def _quote_str(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


# window functions whose frame clause Presto ignores (and Spark rejects)
_RANK_FAMILY = {"rank", "dense_rank", "percent_rank", "cume_dist", "ntile", "row_number"}
_WINDOW_FN_FIXUPS = _RANK_FAMILY | {"lag", "lead"}

_TRY_BINOPS = {
    "/": "try_divide",
    "+": "try_add",
    "-": "try_subtract",
    "*": "try_multiply",
}


def _rewrite_try(arg: list) -> str:
    """TRY(expr): map the expressible shapes onto Spark's try_* family."""
    arg = _strip(arg)
    if not arg:
        return "(NULL)"
    k0, t0 = arg[0]
    first = t0.lower() if k0 == "word" else None
    if first in ("cast", "element_at"):
        nxt = _next_sig(arg, 1)
        # only when the call spans the whole argument (TRY(CAST(..)) yes,
        # TRY(CAST(..) / y) no — that's a division to map instead)
        if (
            nxt < len(arg)
            and arg[nxt][1] == "("
            and _match_paren(arg, nxt) == len(arg) - 1
        ):
            repl = "try_cast" if first == "cast" else "try_element_at"
            return repl + _render_tokens(arg[1:])
    # single top-level binary arithmetic op -> try_<op>(lhs, rhs)
    depth = 0
    op_at = -1
    n_ops = 0
    for j, (k, t) in enumerate(arg):
        if k == "op" and t == "(":
            depth += 1
        elif k == "op" and t == ")":
            depth -= 1
        elif k == "op" and t in _TRY_BINOPS and depth == 0:
            prev = None
            for p in range(j - 1, -1, -1):
                if _is_sig(arg[p]):
                    prev = arg[p]
                    break
            # unary +/- (no preceding operand) is not a binary op
            if prev is not None and not (prev[0] == "op" and prev[1] in "(,+-*/"):
                op_at = j
                n_ops += 1
    if n_ops == 1:
        lhs = _render_tokens(_strip(arg[:op_at]))
        rhs = _render_tokens(_strip(arg[op_at + 1 :]))
        return f"{_TRY_BINOPS[arg[op_at][1]]}({lhs}, {rhs})"
    # not expressible: pass through (raises under ANSI if it errors)
    return "(" + _render_tokens(arg) + ")"


# GeoFunctions.java long-tail with no planar-core equivalent here (the
# WKT parse / area / centroid / contains / intersects / within /
# envelope / length subset IS implemented — functions/geometry.py).
# Each of these raises the typed unsupported error with its own name so
# a porting user hits a clear one-line diagnosis, not a Spark
# resolution failure.  COVERAGE.md carries the full inventory.
_GEO_UNSUPPORTED = frozenset(
    {
        # round 5 closed: geometry_union / geometry_union_agg /
        # convex_hull_agg / st_union / st_convexhull /
        # line_interpolate_point / line_locate_point /
        # to_geojson_geometry / from_geojson_geometry /
        # geometry_nearest_points — pure-Catalyst HOF implementations
        # in functions/geometry.py (documented convex/star-shaped
        # union subset; see its module docstring)
        # round 6 closed: st_intersection (convex-convex hull-of-
        # candidates), st_touches, st_relate (synthesized DE-9IM),
        # st_geomfrombinary (NDR WKB decode), st_buffer (POINT 32-gon),
        # simplify_geometry (chord-distance twin),
        # geometry_invalid_reason, flatten_geometry_collections,
        # to_spherical_geography / to_geometry (tag twin + great-circle
        # distance + spherical-excess area), st_difference /
        # st_symdifference (exact convex fan decomposition ->
        # MULTIPOLYGON of disjoint convex pieces) — functions/geometry.py
        "line_interpolate_points",
    }
)


# PrecisionRecallAggregation.java family: the state is a pair of
# fixed-width weight histograms over pred in [0, 1) (B buckets,
# bucket = floor(min(pred, 0.99999999999) * B)); each output entry i
# (0-based, emitted while the suffix true-weight is still positive)
# derives from the prefix/suffix sums:
#   TP_i = totalTrue - prefixTrue(i)    FN_i = prefixTrue(i)
#   FP_i = totalFalse - prefixFalse(i)  TN_i = prefixFalse(i)
# With a LITERAL bucket count the whole thing is 2B CASE-filtered sum()
# aggregates plus row-local array math on the one output row — exactly
# the reference's histogram state, expressed declaratively.
_CLASSIFICATION_AGGS = {
    # name -> per-bucket output expression over (tp, fp, pt, pf, tt, tf)
    # tp/fp = suffix weights, pt/pf = prefix weights, tt/tf = totals
    "classification_precision": "{tp} / ({tp} + {fp})",
    "classification_recall": "{tp} / {tt}",
    "classification_fall_out": "{fp} / {tf}",
    "classification_miss_rate": "{pt} / {tt}",
    "classification_thresholds": "CAST(i9 - 1 AS DOUBLE) / {b}",
}

_CLASSIFICATION_MAX_BUCKETS = 256


def _rewrite_classification(low: str, args: list[list]) -> str | None:
    b = _lit_num(args[0])
    if b is None or not (1 <= int(b) <= _CLASSIFICATION_MAX_BUCKETS):
        raise PrestoFeatureUnsupportedError(
            f"{low} requires a literal bucket count <= "
            f"{_CLASSIFICATION_MAX_BUCKETS} (transpile-time histogram expansion)"
        )
    b = int(b)
    outcome = _render_tokens(_strip(args[1]))
    pred = _render_tokens(_strip(args[2]))
    weight = (
        _render_tokens(_strip(args[3])) if len(args) == 4 else "1.0"
    )
    if len(args) == 4:
        # PrecisionRecallAggregation.java throws INVALID_FUNCTION_ARGUMENT
        # for negative weights (round-5 ADVICE item 4)
        weight = (
            f"CASE WHEN CAST({weight} AS DOUBLE) < 0D THEN"
            f" CAST(raise_error(concat('{low}: weight must be"
            f" non-negative: ', CAST({weight} AS STRING))) AS DOUBLE)"
            f" ELSE CAST({weight} AS DOUBLE) END"
        )
    # predictions outside [0, 1] throw in the reference instead of
    # silently matching no bucket (round-5 ADVICE item 4)
    bucket = (
        f"CASE WHEN CAST({pred} AS DOUBLE) < 0D"
        f" OR CAST({pred} AS DOUBLE) > 1D THEN"
        f" CAST(raise_error(concat('{low}: prediction must be in [0, 1]: ',"
        f" CAST({pred} AS STRING))) AS BIGINT)"
        f" ELSE CAST(floor(least(CAST({pred} AS DOUBLE),"
        f" 0.99999999999) * {b}) AS BIGINT) END"
    )
    th = ", ".join(
        f"sum(CASE WHEN ({outcome}) AND {bucket} = {i}"
        f" THEN CAST({weight} AS DOUBLE) ELSE 0D END)"
        for i in range(b)
    )
    fh = ", ".join(
        f"sum(CASE WHEN NOT ({outcome}) AND {bucket} = {i}"
        f" THEN CAST({weight} AS DOUBLE) ELSE 0D END)"
        for i in range(b)
    )
    entry = _CLASSIFICATION_AGGS[low].format(
        tp="(aggregate(s9.th, 0D, (a9, v9) -> a9 + v9)"
        " - aggregate(slice(s9.th, 1, i9 - 1), 0D, (a9, v9) -> a9 + v9))",
        fp="(aggregate(s9.fh, 0D, (a9, v9) -> a9 + v9)"
        " - aggregate(slice(s9.fh, 1, i9 - 1), 0D, (a9, v9) -> a9 + v9))",
        pt="aggregate(slice(s9.th, 1, i9 - 1), 0D, (a9, v9) -> a9 + v9)",
        pf="aggregate(slice(s9.fh, 1, i9 - 1), 0D, (a9, v9) -> a9 + v9)",
        tt="aggregate(s9.th, 0D, (a9, v9) -> a9 + v9)",
        tf="aggregate(s9.fh, 0D, (a9, v9) -> a9 + v9)",
        b=f"{b}.0",
    )
    # output length: emit bucket i while suffix true-weight > 0, i.e.
    # up to (last non-empty true bucket) + 1
    length = (
        "aggregate(sequence(1, size(s9.th)), 0,"
        " (l9, i9) -> CASE WHEN element_at(s9.th, i9) > 0D THEN i9 ELSE l9 END)"
    )
    return (
        f"element_at(transform(array(named_struct('th', array({th}),"
        f" 'fh', array({fh}))), s9 ->"
        f" CASE WHEN {length} < 1 THEN CAST(array() AS ARRAY<DOUBLE>)"
        f" ELSE transform(sequence(1, {length}), i9 -> {entry}) END), 1)"
    )


# Sketch-serialization internals with no Datasketches-twin equivalent:
# these names manipulate Presto's OWN serialized sketch layouts
# (construct/destructure/scale a tdigest's centroid list, SFM/KHLL
# mergers, SetDigest minhash-register access), which the engine's
# Datasketches binaries do not expose.  The surrounding functionality
# (agg + estimate + merge + quantile/rank accessors) IS implemented
# over the twins — see COVERAGE.md sketch inventory.
_SKETCH_UNSUPPORTED = frozenset(
    {
        "construct_tdigest",
        "destructure_tdigest",
        "scale_tdigest",
        "scale_qdigest",
        "merge_sfm",
        # round 6 closed: khyperloglog_agg / merge_khll /
        # uniqueness_distribution / reidentification_potential (KHLL
        # twin — functions/compat.py) and trimmed_mean
        "noisy_empty_approx_set_sfm",
        "noisy_approx_distinct_sfm",
        "noisy_approx_set_sfm",
        # round 8 closed: sketch_theta_summary + hash_counts now parse
        # the compact-theta layout directly (functions/sketch_layout.py)
    }
)


def _rewrite_call(name: str, args: list[list]) -> str | None:
    """Rewrite one call site; args are token lists. None = no rewrite."""
    low = name.lower()
    if low in _GEO_UNSUPPORTED:
        raise PrestoFeatureUnsupportedError(
            f"geospatial function {low} (OGC long-tail; the WKT planar "
            "core is implemented — see COVERAGE.md geometry inventory)"
        )
    if low in _SKETCH_UNSUPPORTED:
        raise PrestoFeatureUnsupportedError(
            f"sketch-internal function {low} (operates on Presto's "
            "serialized sketch layout; the engine's sketches are "
            "Datasketches twins — agg/estimate/merge/quantile accessors "
            "are implemented, see COVERAGE.md sketch inventory)"
        )
    if low == "convex_hull_agg" and len(args) == 1:
        # AggregationFunction convex_hull_agg (GeometryUnionAgg.java
        # sibling): hull of every input geometry's points — collect the
        # flattened point arrays with the builtin agg, hull once in the
        # finish expression (st_hull_of_points, functions/geometry.py)
        e = _render_tokens(_strip(args[0]))
        return f"st_hull_of_points(flatten(flatten(collect_list(({e}).rings))))"
    if low == "geometry_union_agg" and len(args) == 1:
        # union of all input geometries via the same star-shaped union
        # core as geometry_union (documented convex subset)
        e = _render_tokens(_strip(args[0]))
        return f"st_union_all(collect_list({e}))"
    if low == "nearest_points" and len(args) == 2:
        # alias: the reference's SQL name is geometry_nearest_points
        a0 = _render_tokens(_strip(args[0]))
        a1 = _render_tokens(_strip(args[1]))
        return f"geometry_nearest_points({a0}, {a1})"
    if low == "spatial_partitions" and len(args) in (2, 3):
        # GeoFunctions.java:1195 spatialPartitions(kdbTree, geometry
        # [, distance]).  The KdbTree arrives as the planner-injected
        # CAST('<json>' AS KdbTree) literal (ExtractSpatialJoins.java:665)
        # — parse it at transpile time into a flat leaves array and
        # evaluate findIntersectingLeaves as a pure-Catalyst filter()
        # (functions/geometry.py sql_spatial_partitions).
        from .functions.geometry import sql_spatial_partitions

        json_toks = [t for t in args[0] if t[0] == "str"]
        if len(json_toks) != 1:
            raise PrestoFeatureUnsupportedError(
                "spatial_partitions requires a literal KdbTree — the"
                " CAST('<json>' AS KdbTree) form the reference planner"
                " injects (ExtractSpatialJoins.java:665)"
            )
        g = _render_tokens(_strip(args[1]))
        d = _render_tokens(_strip(args[2])) if len(args) == 3 else None
        return sql_spatial_partitions(_str_value(json_toks[0]), g, d)
    if low == "try" and len(args) == 1:
        return _rewrite_try(args[0])
    if low in ("date_add", "date_diff") and len(args) == 3:
        unit_arg = _strip(args[0])
        if len(unit_arg) == 1 and unit_arg[0][0] == "str":
            unit = _str_value(unit_arg[0]).lower()
            if unit in _TIME_UNITS:
                fn = "timestampadd" if low == "date_add" else "timestampdiff"
                a1 = _render_tokens(_strip(args[1]))
                a2 = _render_tokens(_strip(args[2]))
                return f"{fn}({_TIME_UNITS[unit]}, {a1}, {a2})"
        return None
    if low in ("date_format", "format_datetime") and len(args) == 2:
        fmt_arg = _strip(args[1])
        if len(fmt_arg) == 1 and fmt_arg[0][0] == "str":
            fmt = _str_value(fmt_arg[0])
            java = _mysql_to_java(fmt) if low == "date_format" else fmt
            a0 = _render_tokens(_strip(args[0]))
            return f"date_format({a0}, {_quote_str(java)})"
        return None
    if low == "date_parse" and len(args) == 2:
        fmt_arg = _strip(args[1])
        if len(fmt_arg) == 1 and fmt_arg[0][0] == "str":
            java = _mysql_to_java(_str_value(fmt_arg[0]))
            a0 = _render_tokens(_strip(args[0]))
            return f"to_timestamp({a0}, {_quote_str(java)})"
        return None
    if low in ("rgb", "color", "render", "bar"):
        folded = _fold_color_call(low, args)
        if folded is not None:
            return folded
        # round 6: non-literal args route to the registered Arrow-
        # batched UDFs (functions/__init__.py _register_color_py);
        # SQL UDF names are single-arity so defaults are supplied here
        if low == "bar" and len(args) == 2:
            # ColorFunctions.bar 2-arg defaults: red -> green
            a0 = _render_tokens(_strip(args[0]))
            a1 = _render_tokens(_strip(args[1]))
            return f"bar({a0}, {a1}, 16711680, 65280)"
        if low == "render" and len(args) == 1:
            # render(boolean): fixed green-check / red-cross literals
            # (ColorFunctions.java renderBoolean), base64-armored so the
            # raw ANSI ESC bytes never enter the SQL text
            import base64

            from .functions.presto import py_render_bool

            b64t = base64.b64encode(py_render_bool(True).encode()).decode()
            b64f = base64.b64encode(py_render_bool(False).encode()).decode()
            e = _render_tokens(_strip(args[0]))
            return (
                f"IF(CAST({e} AS BOOLEAN),"
                f" CAST(unbase64('{b64t}') AS STRING),"
                f" CAST(unbase64('{b64f}') AS STRING))"
            )
    if low == "features":
        # MLFeaturesFunctions.java: features(a, b, ...) builds the dense
        # 0..n-1 feature vector -> array<double>
        rendered = [f"CAST({_render_tokens(_strip(a))} AS DOUBLE)" for a in args]
        return f"array({', '.join(rendered)})"
    if low == "random" and len(args) <= 1:
        # MathFunctions.java: random() -> double in [0,1);
        # random(n) -> integer in [0, n)
        if not args or not any(_is_sig(t) for t in args[0]):
            return "rand()"
        a0 = _render_tokens(_strip(args[0]))
        return f"CAST(floor(rand() * ({a0})) AS BIGINT)"
    if low in ("regexp_extract", "regexp_extract_all") and len(args) == 2:
        # Presto's 2-arg form returns the FULL match (group 0); Spark's
        # default group is 1 and errors on group-less patterns
        a0 = _render_tokens(_strip(args[0]))
        a1 = _render_tokens(_strip(args[1]))
        return f"{low}({a0}, {a1}, 0)"
    if low == "bit_count" and len(args) == 2:
        # Presto bit_count(x, bits) counts over the `bits`-wide two's
        # complement value; Spark's builtin is 1-arg (64-bit), so mask
        # down for literal widths < 64
        bits = _lit_num(args[1])
        a0 = _render_tokens(_strip(args[0]))
        if bits == 64:
            return f"bit_count({a0})"
        if bits is not None and 2 <= bits < 64:
            mask = (1 << int(bits)) - 1
            return f"bit_count(({a0}) & {mask}L)"
        return None
    if low == "normalize" and len(args) == 2:
        # normalize(x, NFD) — the form is a bare identifier keyword
        # (SqlBase.g4 normalForm); route to the per-form pandas UDF
        form_arg = _strip(args[1])
        if len(form_arg) == 1 and form_arg[0][0] == "word":
            form = form_arg[0][1].lower()
            if form in ("nfc", "nfd", "nfkc", "nfkd"):
                a0 = _render_tokens(_strip(args[0]))
                return f"__normalize_{form}({a0})"
        return None
    if low == "combinations" and len(args) == 2:
        # ArrayCombinationsFunction.java: n-element subsequences in
        # index order, n <= 5.  Expanded for LITERAL n as nested
        # transform/flatten over index tuples i1 < i2 < ... < in.
        n = _lit_num(args[1])
        if n is not None and 0 <= int(n) <= 5:
            n = int(n)
            a = _render_tokens(_strip(args[0]))
            if n == 0:
                return f"array(slice({a}, 1, 0))"  # [[]] typed like a
            inner = (
                "array(" + ", ".join(f"element_at({a}, i{k})" for k in range(1, n + 1)) + ")"
            )
            expr = inner
            for k in range(n, 0, -1):
                lo = "1" if k == 1 else f"i{k-1} + 1"
                # upper bound leaves room for the remaining n-k indices;
                # also keeps lo <= hi always (Spark sequence(4, 3) would
                # DESCEND, not return empty)
                hi = f"size({a}) - {n - k}" if k < n else f"size({a})"
                body = f"transform(sequence({lo}, {hi}), i{k} -> {expr})"
                expr = body if k == n else f"flatten({body})"
            # empty sequence(x, y) with x > y errors in Spark; guard
            # short arrays (Presto returns [] when n > cardinality)
            return (
                f"(CASE WHEN size({a}) < {n} THEN array() ELSE {expr} END)"
            )
        return None
    if low == "kurtosis" and len(args) == 1:
        # CentralMomentsAggregation.java:84: Presto kurtosis is the
        # UNBIASED sample excess ((n-1)n(n+1))/((n-2)(n-3)) * m4/m2^2
        # - 3(n-1)^2/((n-2)(n-3)), NULL for n < 4; Spark's builtin is
        # the population g2 = n*m4/m2^2 - 3, computed with a streaming
        # central-moment state (numerically stable — no catastrophic
        # cancellation for large-mean/small-spread data, unlike a raw
        # power-sum expansion).  The two are related by the exact
        # identity G2 = (n-1)/((n-2)(n-3)) * ((n+1)*g2 + 6), so the
        # transpiler emits that conversion over the stable builtin.
        e = _render_tokens(_strip(args[0]))
        x = f"CAST({e} AS DOUBLE)"
        n = f"CAST(count({x}) AS DOUBLE)"
        return (
            f"CASE WHEN count({x}) < 4 THEN NULL ELSE"
            f" (({n} - 1) / (({n} - 2) * ({n} - 3)))"
            f" * (({n} + 1) * kurtosis({x}) + 6) END"
        )
    if low == "values_at_quantiles" and len(args) == 2:
        # QuantileDigestFunctions.java valuesAtQuantiles: expand a
        # LITERAL quantile array into one foldable-rank KLL accessor
        # call per quantile (Spark's accessor takes a single foldable
        # rank; the rank argument must stay a literal, which is why this
        # is a transpile-time rewrite and not a macro)
        a1 = _strip(args[1])
        nums, ok = [], True
        for k, v in a1:
            if k == "num":
                nums.append(v)
            elif k in ("ws", "comment"):
                continue
            elif k == "word" and v.lower() == "array":
                continue
            elif k == "op" and v in ("[", "]", "(", ")", ","):
                continue
            else:
                ok = False
                break
        if ok and nums:
            sk = _render_tokens(_strip(args[0]))
            calls = ", ".join(
                f"kll_sketch_get_quantile_double({sk}, {q})" for q in nums
            )
            return f"array({calls})"
    if low == "quantiles_at_values" and len(args) == 2:
        # QuantileDigestFunctions.java quantilesAtValues — the inverse
        # vector accessor; same literal-array expansion over the KLL
        # rank accessor (quantile_at_value's target)
        a1 = _strip(args[1])
        nums, ok = [], True
        for k, v in a1:
            if k == "num":
                nums.append(v)
            elif k in ("ws", "comment"):
                continue
            elif k == "word" and v.lower() == "array":
                continue
            elif k == "op" and v in ("[", "]", "(", ")", ","):
                continue
            else:
                ok = False
                break
        if ok and nums:
            sk = _render_tokens(_strip(args[0]))
            calls = ", ".join(
                f"kll_sketch_get_rank_double({sk}, {q})" for q in nums
            )
            return f"array({calls})"
    if low in ("date_parse", "format_datetime", "parse_datetime") and len(args) == 2:
        # MySQLFunctions date_parse(%-format) / Joda format_datetime,
        # parse_datetime — for LITERAL formats the translation happens
        # at transpile time (functions/presto.py carries the same table
        # for the Column-helper path).  Joda patterns are passed through:
        # the yyyy/MM/dd/HH/mm/ss/SSS core is identical in Spark's
        # DateTimeFormatter (week-year 'x' and era differences are out
        # of the supported subset).
        fmt = _lit_str(args[1])
        if fmt is not None:
            e = _render_tokens(_strip(args[0]))
            if low == "date_parse":
                from .functions.presto import _mysql_format_to_java

                jfmt = _mysql_format_to_java(fmt).replace("'", "''")
                return f"to_timestamp({e}, '{jfmt}')"
            jfmt = fmt.replace("'", "''")
            if low == "parse_datetime":
                return f"to_timestamp({e}, '{jfmt}')"
            return f"date_format({e}, '{jfmt}')"
        return None
    if low == "rgb" and len(args) == 3:
        # ColorFunctions.java rgb: pack validated 0-255 components
        a0, a1, a2 = (_render_tokens(_strip(a)) for a in args)
        return (
            f"(CAST(({a0}) AS BIGINT) * 65536"
            f" + CAST(({a1}) AS BIGINT) * 256 + CAST(({a2}) AS BIGINT))"
        )
    if low in (
        "ip_prefix",
        "ip_subnet_min",
        "ip_subnet_max",
        "ip_subnet_range",
        "is_subnet_of",
    ):
        # IpPrefixFunctions.java family: inline the generated v4+v6
        # macro text instead of leaving a SQL-UDF call.  Spark's
        # ResolveSQLFunctions re-parses and re-analyzes the ~6 KB
        # registered body at EVERY call site (measured ~60-130 ms of
        # pure planning on the round-5 floor table), while direct
        # inlining is parsed once with the query.  Args are rendered
        # text; the generators may embed them more than once, which is
        # safe for the deterministic expressions the transpiler emits.
        from .functions.compat import (
            _ip_prefix_sql,
            _ip_subnet_bound_sql,
            _is_subnet_of_sql,
        )

        rendered = [f"({_render_tokens(_strip(a))})" for a in args]
        if low == "ip_prefix" and len(args) == 2:
            return _ip_prefix_sql(rendered[0], f"CAST({rendered[1]} AS INT)")
        if low == "ip_subnet_min" and len(args) == 1:
            return _ip_subnet_bound_sql(rendered[0], "min")
        if low == "ip_subnet_max" and len(args) == 1:
            return _ip_subnet_bound_sql(rendered[0], "max")
        if low == "ip_subnet_range" and len(args) == 1:
            return (
                "array("
                + _ip_subnet_bound_sql(rendered[0], "min")
                + ", "
                + _ip_subnet_bound_sql(rendered[0], "max")
                + ")"
            )
        if low == "is_subnet_of" and len(args) == 2:
            return _is_subnet_of_sql(rendered[0], rendered[1])
    if low in ("parse_duration", "parse_presto_data_size", "char2hexint") and len(
        args
    ) == 1:
        # same ResolveSQLFunctions-bypass inlining as the ip_* family —
        # these bodies are small but each registered-UDF call site still
        # pays a fixed body re-analysis cost per plan
        e = f"({_render_tokens(_strip(args[0]))})"
        if low == "char2hexint":
            return f"upper(hex(encode({e}, 'UTF-16BE')))"
        if low == "parse_duration":
            return (
                f"CAST(regexp_extract({e}, '^\\\\s*([0-9.]+)', 1) AS DOUBLE)"
                f" * (CASE lower(regexp_extract({e}, '([a-zA-Z]+)\\\\s*$', 1))"
                " WHEN 'ns' THEN 1e-9 WHEN 'us' THEN 1e-6 WHEN 'ms' THEN 1e-3"
                " WHEN 's' THEN 1e0 WHEN 'm' THEN 60e0 WHEN 'h' THEN 3600e0"
                " WHEN 'd' THEN 86400e0 END)"
            )
        return (
            f"CAST(regexp_extract({e}, '^\\\\s*([0-9.]+)', 1) AS DOUBLE)"
            f" * (CASE regexp_extract({e}, '([a-zA-Z]+)\\\\s*$', 1)"
            " WHEN 'B' THEN 1e0 WHEN 'kB' THEN 1024e0 WHEN 'MB' THEN 1048576e0"
            " WHEN 'GB' THEN 1073741824e0 WHEN 'TB' THEN 1099511627776e0"
            " WHEN 'PB' THEN 1125899906842624e0 END)"
        )
    if low == "khyperloglog_agg" and len(args) == 2:
        # KHyperLogLogAggregationFunction: the twin collects the
        # distinct (hash(value), hash(uii)) pairs of the group, keeps
        # the bottom-K value-hashes and groups uii-hashes per key with
        # one boundary scan (functions/compat.py khll_from_pairs_sql;
        # cap-guarded — beyond ~1M distinct pairs a two-level
        # aggregation is the scalable shape)
        from .functions.compat import khll_from_pairs_sql, khll_hash_sql

        x = _render_tokens(_strip(args[0]))
        u = _render_tokens(_strip(args[1]))
        pairs = (
            "array_sort(array_distinct(collect_list(named_struct("
            f"'h', {khll_hash_sql(x)}, 'u', {khll_hash_sql(u)}))))"
        )
        return khll_from_pairs_sql(pairs)
    if low == "uniqueness_distribution" and len(args) == 1:
        # 1-arg form defaults to DEFAULT_HISTOGRAM_SIZE = 256
        # (KHyperLogLog.java:59); SQL UDFs are single-arity so the
        # default is supplied here
        e = _render_tokens(_strip(args[0]))
        return f"uniqueness_distribution({e}, 256)"
    if low == "geometric_mean" and len(args) == 1:
        # GeometricMeanAggregations.java: state is (sum of ln, count),
        # result exp(logSum / count).  Java's Math.log gives -Inf for 0
        # and NaN for negatives, so logSum saturates: any negative ->
        # NaN, else any zero -> exp(-Inf) = 0.  Spark's ln returns NULL
        # for x <= 0 (and avg skips NULLs), so the branches are made
        # explicit (round-5 ADVICE item 1).
        e = _render_tokens(_strip(args[0]))
        d = f"CAST({e} AS DOUBLE)"
        return (
            f"CASE WHEN min({d}) < 0D THEN CAST('NaN' AS DOUBLE)"
            f" WHEN min({d}) = 0D THEN 0D"
            f" ELSE exp(avg(ln({d}))) END"
        )
    if low == "noisy_count_if_gaussian" and len(args) == 2:
        # NoisyCountIfGaussianAggregation.java, 2-arg (unseeded) form:
        # exact conditional count + one N(0, scale) draw, clipped at 0.
        # noise_scale = 0 folds to the exact count (the oracle path);
        # the seeded per-group form stays on the Column helper
        # (functions/presto.py noisy_count_if_gaussian — the group keys
        # aren't visible at transpile time).
        cond = _render_tokens(_strip(args[0]))
        scale = _render_tokens(_strip(args[1]))
        return (
            f"greatest(CAST(round(CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END)"
            f" AS DOUBLE) + randn() * ({scale})) AS BIGINT), 0L)"
        )
    if low in _CLASSIFICATION_AGGS and len(args) in (3, 4):
        return _rewrite_classification(low, args)
    if low == "numeric_histogram" and len(args) in (2, 3):
        # NumericHistogramAggregation.java: adaptive bin-merging whose
        # bins depend on insertion order — engine-specific in the
        # reference itself (parallel splits merge differently).  The
        # deterministic twin here: B equi-depth bins, centered at the
        # mid-quantiles (i+0.5)/B, each carrying total_weight/B —
        # documented twin semantics like qdigest -> KLL.  Literal
        # bucket count required.  The weighted form uses Spark's
        # percentile(x, p, w) frequency argument.
        b = _lit_num(args[0])
        if b is None or not (1 <= int(b) <= _CLASSIFICATION_MAX_BUCKETS):
            raise PrestoFeatureUnsupportedError(
                "numeric_histogram requires a literal bucket count <= "
                f"{_CLASSIFICATION_MAX_BUCKETS}"
            )
        b = int(b)
        x = _render_tokens(_strip(args[1]))
        if len(args) == 3:
            w = _render_tokens(_strip(args[2]))
            cents = ", ".join(
                f"percentile(CAST({x} AS DOUBLE), {(i + 0.5) / b!r},"
                f" CAST({w} AS BIGINT))"
                for i in range(b)
            )
            total = f"CAST(sum(CAST({w} AS DOUBLE)) AS DOUBLE)"
        else:
            cents = ", ".join(
                f"percentile(CAST({x} AS DOUBLE), {(i + 0.5) / b!r})"
                for i in range(b)
            )
            total = f"CAST(count({x}) AS DOUBLE)"
        return (
            f"map_from_arrays(array({cents}),"
            f" array_repeat({total} / {b}, {b}))"
        )
    if low == "differential_entropy" and len(args) == 6:
        # DifferentialEntropyAggregation.java, fixed_histogram_mle
        # strategy (FixedHistogramMleStateStrategy.calculateEntropy):
        # bucketed weight histogram over [min, max), entropy =
        # (-sum p*ln p + ln(width)) / ln 2 with p = w_b / sum(w).
        # Literal bucket count / method / bounds required (the same
        # transpile-time histogram expansion as classification_*);
        # the reservoir-sample Vasicek forms (2-3 args) stay
        # unsupported — their state is a random reservoir.
        b = _lit_num(args[0])
        method = _lit_str(args[3])
        mn, mx = _lit_num(args[4]), _lit_num(args[5])
        if (
            b is None
            or not (1 <= int(b) <= _CLASSIFICATION_MAX_BUCKETS)
            or method is None
            or method.lower() != "fixed_histogram_mle"
            or mn is None
            or mx is None
            or not float(mx) > float(mn)
        ):
            raise PrestoFeatureUnsupportedError(
                "differential_entropy requires the 6-arg"
                " fixed_histogram_mle form with literal bucket count"
                f" <= {_CLASSIFICATION_MAX_BUCKETS} and literal bounds"
                " (reservoir/Vasicek methods are stateful-random)"
            )
        b = int(b)
        width = (float(mx) - float(mn)) / b
        sample = _render_tokens(_strip(args[1]))
        wgt = _render_tokens(_strip(args[2]))
        bucket = (
            f"greatest(0L, least(CAST(floor((CAST({sample} AS DOUBLE)"
            f" - {float(mn)!r}) / {width!r}) AS BIGINT), {b - 1}L))"
        )
        hist = ", ".join(
            f"sum(CASE WHEN {bucket} = {i} THEN CAST({wgt} AS DOUBLE)"
            " ELSE 0D END)"
            for i in range(b)
        )
        return (
            f"element_at(transform(array(array({hist})), h9 ->"
            " element_at(transform(array(aggregate(h9, 0D,"
            " (a9, v9) -> a9 + v9)), tw9 ->"
            " CASE WHEN tw9 = 0D THEN CAST('NaN' AS DOUBLE) ELSE"
            " (aggregate(h9, 0D, (a9, v9) -> a9 - CASE WHEN v9 > 0D"
            " THEN (v9 / tw9) * ln(v9 / tw9) ELSE 0D END)"
            f" + ln({width!r})) / ln(2.0D) END), 1)), 1)"
        )
        return None
    if low == "entropy" and len(args) == 1:
        # EntropyAggregation.java: Shannon entropy (bits) of the count
        # distribution c -> log2(S) - sum(c*log2(c))/S with S = sum(c);
        # one aggregation pass, 0*log(0) dropped by the CASE
        c = _render_tokens(_strip(args[0]))
        return (
            f"(log2(sum({c})) - sum(CASE WHEN ({c}) > 0 THEN ({c}) * log2({c}) END)"
            f" / sum({c}))"
        )
    if low == "set_union" and len(args) == 1:
        # SetUnionFunction.java: aggregate union of array values ->
        # distinct-flatten over the collected arrays
        a0 = _render_tokens(_strip(args[0]))
        return f"array_distinct(flatten(collect_list({a0})))"
    if low == "none_match" and len(args) == 2:
        # ArrayFunctions.java noneMatch == NOT exists; Presto's NULL
        # semantics carry over (exists -> NULL => NOT NULL => NULL)
        a0 = _render_tokens(_strip(args[0]))
        a1 = _render_tokens(_strip(args[1]))
        return f"(NOT exists({a0}, {a1}))"
    if low == "map" and len(args) == 2:
        # Presto's MAP(key_array, value_array) constructor
        # (MapConstructor.java) vs Spark's varargs map(k, v, ...): only
        # rewrite when the first argument is visibly an array, so
        # Spark-style map(k, v) passes through untouched.
        first = _strip(args[0])
        if first and first[0][0] == "word" and first[0][1].lower() == "array":
            a0 = _render_tokens(first)
            a1 = _render_tokens(_strip(args[1]))
            return f"map_from_arrays({a0}, {a1})"
        return None
    return None



def _lit_str(arg: list) -> str | None:
    """String-literal value of an arg token list (unquoted, '' -> ')."""
    sig = _strip(arg)
    if len(sig) == 1 and sig[0][0] == "str":
        return sig[0][1][1:-1].replace("''", "'")
    return None


def _lit_num(arg: list):
    """Numeric literal value of an arg token list (handles unary minus)."""
    sig = _strip(arg)
    if len(sig) == 1 and sig[0][0] == "num":
        t = sig[0][1]
        return float(t) if ("." in t or "e" in t.lower()) else int(t)
    if (
        len(sig) == 2
        and sig[0] == ("op", "-")
        and sig[1][0] == "num"
    ):
        v = _lit_num([sig[1]])
        return None if v is None else -v
    return None


def _fold_color_call(low: str, args: list) -> str | None:
    """Constant-fold literal color/rgb/render/bar calls via the exact
    Python ports in functions/presto.py (ColorFunctions.java parity).
    Non-literal args return None and fall through (the Python Column
    helpers cover expression use)."""
    from .functions import presto as pf

    def lit_str(a):
        sig = _strip(a)
        return _str_value(sig[0]) if len(sig) == 1 and sig[0][0] == "str" else None

    def lit_bool(a):
        sig = _strip(a)
        if len(sig) == 1 and sig[0][0] == "word" and sig[0][1].lower() in ("true", "false"):
            return sig[0][1].lower() == "true"
        return None

    try:
        if low == "rgb" and len(args) == 3:
            vals = [_lit_num(a) for a in args]
            if all(isinstance(v, int) for v in vals):
                r, g, b = vals
                return str((r << 16) | (g << 8) | b)
        elif low == "color":
            if len(args) == 1:
                v = lit_str(args[0])
                if v is not None:
                    return str(pf._py_color(v))
            elif len(args) == 3:
                f, c1, c2 = _lit_num(args[0]), _lit_num(args[1]), _lit_num(args[2])
                if all(v is not None for v in (f, c1, c2)):
                    return str(pf.color_interpolate(float(f), int(c1), int(c2)))
            elif len(args) == 5:
                vals = [_lit_num(a) for a in args]
                if all(v is not None for v in vals):
                    v, lo, hi, c1, c2 = vals
                    return str(pf.color_value_interpolate(v, lo, hi, int(c1), int(c2)))
        elif low == "render":
            if len(args) == 1:
                b = lit_bool(args[0])
                if b is not None:
                    return _quote_str(pf.py_render_bool(b))
            elif len(args) == 2:
                c = _lit_num(args[1])
                if c is not None:
                    txt = lit_str(args[0])
                    if txt is None:
                        n = _lit_num(args[0])
                        txt = None if n is None else str(n)
                    if txt is not None:
                        return _quote_str(pf.py_render(txt, int(c)))
        elif low == "bar":
            vals = [_lit_num(a) for a in args]
            if len(vals) in (2, 4) and all(v is not None for v in vals):
                return _quote_str(pf.py_bar(float(vals[0]), int(vals[1]), *map(int, vals[2:])))
    except (ValueError, KeyError, ZeroDivisionError):
        # ZeroDivisionError: defensive — a degenerate literal call (e.g.
        # color(v, lo, lo, c1, c2)) must not abort the whole transpile.
        return None
    return None


def _rewrite_unnest(tokens: list, i: int) -> tuple[str, int] | None:
    """At tokens[i] == word 'unnest' preceded by CROSS JOIN: rewrite

        CROSS JOIN UNNEST(e [, e2]) [WITH ORDINALITY] AS t(c1 [, c2 ...])

    into a LATERAL VIEW clause. Returns (replacement_text, next_index)
    where replacement covers tokens[i:next_index]; the caller is expected
    to have already dropped the preceding CROSS JOIN words.
    """
    j = _next_sig(tokens, i + 1)
    if j >= len(tokens) or tokens[j][1] != "(":
        return None
    close = _match_paren(tokens, j)
    exprs = [_render_tokens(_strip(a)) for a in _split_args(tokens, j + 1, close)]
    k = _next_sig(tokens, close + 1)
    ordinality = False
    if k < len(tokens) and tokens[k][0] == "word" and tokens[k][1].lower() == "with":
        k2 = _next_sig(tokens, k + 1)
        if k2 < len(tokens) and tokens[k2][1].lower() == "ordinality":
            ordinality = True
            k = _next_sig(tokens, k2 + 1)
    if k >= len(tokens) or tokens[k][0] != "word" or tokens[k][1].lower() != "as":
        return None
    k = _next_sig(tokens, k + 1)
    if k >= len(tokens) or tokens[k][0] not in ("word", "qid"):
        return None
    alias = tokens[k][1].strip('"')
    k = _next_sig(tokens, k + 1)
    if k >= len(tokens) or tokens[k][1] != "(":
        return None
    cols_close = _match_paren(tokens, k)
    cols = [_render_tokens(_strip(a)) for a in _split_args(tokens, k + 1, cols_close)]
    nxt = cols_close + 1

    col_list = ", ".join(cols)
    if ordinality:
        if len(exprs) == 1 and len(cols) == 2:
            # 1-based ordinality via transform's index lambda; inline()
            # drops the row for empty/null arrays exactly like UNNEST.
            gen = (
                f"inline(transform({exprs[0]}, (x_, i_) ->"
                f" struct(x_, CAST(i_ + 1 AS BIGINT))))"
            )
        else:
            return None
    elif len(exprs) == 1 and len(cols) == 1:
        gen = f"explode({exprs[0]})"
    elif len(exprs) == 1 and len(cols) == 2:
        # map unnest -> explode yields (key, value)
        gen = f"explode({exprs[0]})"
    elif len(exprs) == len(cols):
        # multi-array zip; arrays_zip pads short arrays with NULL like Presto
        gen = f"inline(arrays_zip({', '.join(exprs)}))"
    else:
        return None
    return f"LATERAL VIEW {gen} {alias} AS {col_list}", nxt


def _rewrite_view_ddl(tokens: list) -> str | None:
    """``CREATE [OR REPLACE] VIEW name [COMMENT 's'] [SECURITY
    DEFINER|INVOKER] AS query`` (SqlBase.g4 createView; reference
    CreateViewTask) -> Spark ``CREATE [OR REPLACE] TEMPORARY VIEW``.

    TEMPORARY because the engine's base tables are temp views over the
    parquet fixtures and Spark refuses persistent views that reference
    temp relations; semantics otherwise match (logical view, expanded at
    query time, fails on duplicate unless OR REPLACE).  COMMENT and
    SECURITY clauses are metadata-only here and are dropped.  DROP VIEW
    passes through untouched — Spark resolves temp views first.
    """
    i = _next_sig(tokens, 0)
    if i >= len(tokens) or tokens[i][0] != "word" or tokens[i][1].lower() != "create":
        return None
    j = _next_sig(tokens, i + 1)
    replace = ""
    if j < len(tokens) and tokens[j][0] == "word" and tokens[j][1].lower() == "or":
        k = _next_sig(tokens, j + 1)
        if k < len(tokens) and tokens[k][0] == "word" and tokens[k][1].lower() == "replace":
            replace = "OR REPLACE "
            j = _next_sig(tokens, k + 1)
        else:
            return None
    if j >= len(tokens) or tokens[j][0] != "word" or tokens[j][1].lower() != "view":
        return None
    m = _next_sig(tokens, j + 1)
    name_parts: list = []
    while m < len(tokens):
        k0, t0 = tokens[m]
        if k0 == "word" and t0.lower() in ("comment", "security", "as"):
            break
        name_parts.append(tokens[m])
        m = _next_sig(tokens, m + 1)
    if not name_parts:
        return None
    while m < len(tokens) and tokens[m][1].lower() in ("comment", "security"):
        m = _next_sig(tokens, m + 1)  # the clause argument (str / word)
        m = _next_sig(tokens, m + 1)
    if m >= len(tokens) or tokens[m][0] != "word" or tokens[m][1].lower() != "as":
        return None
    name = _render_tokens(
        tokenize(_transpile_tokens(name_parts))  # normalize "q"->`q` quoting
    )
    body = _transpile_tokens(tokens[m + 1 :]).strip()
    return f"CREATE {replace}TEMPORARY VIEW {name} AS {body}"


# ---------------------------------------------------------------------------
# main pass
# ---------------------------------------------------------------------------
def _row_type_to_struct(tokens: list) -> str:
    """`ROW(name type, ...)` type syntax -> `STRUCT<name: type, ...>`
    (recursive for nested ROW; VARCHAR -> STRING inside types).
    tokens = [ROW, ..., (, fields..., )] — the paren is located by
    significance, not position, so `ROW (x int)` whitespace parses."""
    opn = _next_sig(tokens, 1)
    close = _match_paren(tokens, opn)
    fields = []
    for arg in _split_args(tokens, opn + 1, close):
        sig = _strip(arg)
        if not sig:
            continue
        name = sig[0][1]
        rest = _strip(sig[1:])
        # nested ROW type
        if rest and rest[0][0] == "word" and rest[0][1].lower() == "row":
            j = _next_sig(rest, 1)
            if j < len(rest) and rest[j] == ("op", "("):
                typ = _row_type_to_struct(rest[: _match_paren(rest, j) + 1])
                fields.append(f"{name}: {typ}")
                continue
        typ = _render_tokens(rest).strip()
        if typ.lower() == "varchar":
            typ = "STRING"
        fields.append(f"{name}: {typ}")
    return "STRUCT<" + ", ".join(fields) + ">"


def _split_at_time_zone(arg: list) -> tuple[list, str] | None:
    """Split `expr AT TIME ZONE 'tz'` at top level -> (expr_tokens,
    tz_literal); None when the shape doesn't match."""
    depth = 0
    for i, (k, t) in enumerate(arg):
        if k == "op" and t == "(":
            depth += 1
        elif k == "op" and t == ")":
            depth -= 1
        elif depth == 0 and k == "word" and t.lower() == "at":
            j1 = _next_sig(arg, i + 1)
            j2 = _next_sig(arg, j1 + 1) if j1 < len(arg) else len(arg)
            j3 = _next_sig(arg, j2 + 1) if j2 < len(arg) else len(arg)
            if (
                j3 < len(arg)
                and arg[j1][0] == "word"
                and arg[j1][1].lower() == "time"
                and arg[j2][0] == "word"
                and arg[j2][1].lower() == "zone"
                and arg[j3][0] == "str"
            ):
                return arg[:i], arg[j3][1]
    return None


def _transpile_tokens(tokens: list) -> str:
    out: list[str] = []
    i = 0
    n = len(tokens)
    while i < n:
        kind, text = tokens[i]
        if kind == "qid":
            inner = text[1:-1].replace('""', '"').replace("`", "``")
            out.append(f"`{inner}`")
            i += 1
            continue
        if kind == "word":
            low = text.lower()
            # ARRAY[e1, e2, ...] literal (SqlBase.g4 arrayConstructor) ->
            # array(e1, e2, ...); only when the bracket directly follows
            # the ARRAY keyword, so subscripts a[i] are never touched.
            if low == "array":
                j = _next_sig(tokens, i + 1)
                if j < n and tokens[j] == ("op", "["):
                    depth = 0
                    close = -1
                    for j2 in range(j, n):
                        if tokens[j2][1] == "[":
                            depth += 1
                        elif tokens[j2][1] == "]":
                            depth -= 1
                            if depth == 0:
                                close = j2
                                break
                    if close > 0:
                        inner = _transpile_tokens(tokens[j + 1 : close])
                        out.append(f"array({inner})")
                        i = close + 1
                        continue
            # bare VARCHAR at the tail of a CAST (Presto's unbounded
            # varchar) -> STRING; `AS VARCHAR)` is the only shape touched
            # so columns/aliases named varchar survive.
            if low == "varchar":
                p1 = i - 1
                while p1 >= 0 and not _is_sig(tokens[p1]):
                    p1 -= 1
                j = _next_sig(tokens, i + 1)
                if (
                    p1 >= 0
                    and tokens[p1][0] == "word"
                    and tokens[p1][1].lower() == "as"
                    and j < n
                    and tokens[j] == ("op", ")")
                ):
                    out.append("STRING")
                    i += 1
                    continue
            # typed DECIMAL literal: decimal '1.23' -> CAST('1.23' AS
            # DECIMAL(p,s)) with Presto's literal-derived precision/scale
            # (SqlBase.g4 number: DECIMAL_VALUE; DecimalLiteral).
            if low == "decimal":
                j = _next_sig(tokens, i + 1)
                if j < n and tokens[j][0] == "str":
                    digits = _str_value(tokens[j]).strip().lstrip("+-")
                    frac = digits.split(".")[1] if "." in digits else ""
                    prec = max(1, len(digits.replace(".", "").lstrip("0") or "0"))
                    prec = max(prec, len(frac))
                    out.append(
                        f"CAST({tokens[j][1]} AS DECIMAL({prec},{len(frac)}))"
                    )
                    i = j + 1
                    continue
            # catalog-qualified TPC-H names: tpch.<schema>.<table> (and
            # hive.<schema>.<table>) -> bare table, which the engine
            # registers as a temp view over the fixtures.
            if low in ("tpch", "hive"):
                j = _next_sig(tokens, i + 1)
                if j < n and tokens[j] == ("op", "."):
                    k = _next_sig(tokens, j + 1)
                    if k < n and tokens[k][0] in ("word", "qid"):
                        j2 = _next_sig(tokens, k + 1)
                        if j2 < n and tokens[j2] == ("op", "."):
                            k2 = _next_sig(tokens, j2 + 1)
                            if k2 < n and tokens[k2][0] in ("word", "qid"):
                                out.append(tokens[k2][1])
                                i = k2 + 1
                                continue
            # ORDER BY null-ordering normalization: Presto treats NULL as
            # LARGER than any value (ASC -> NULLS LAST, DESC -> NULLS
            # FIRST; SqlBase.g4 sortItem default), Spark as smaller.
            # Append the explicit modifier to every sort item that lacks
            # one, in both query-level and window ORDER BY clauses.
            if low == "order":
                j = _next_sig(tokens, i + 1)
                if j < n and tokens[j][0] == "word" and tokens[j][1].lower() == "by":
                    end, depth = j + 1, 0
                    terminators = {"limit", "offset", "fetch", "rows", "range", "groups"}
                    while end < n:
                        k2, t2 = tokens[end]
                        if k2 == "op" and t2 == "(":
                            depth += 1
                        elif k2 == "op" and t2 == ")":
                            if depth == 0:
                                break
                            depth -= 1
                        elif k2 == "op" and t2 == ";" and depth == 0:
                            break
                        elif (
                            k2 == "word" and depth == 0 and t2.lower() in terminators
                        ):
                            break
                        end += 1
                    items = _split_args(tokens, j + 1, end)
                    rendered = []
                    for it in items:
                        sig = [t for t in it if _is_sig(t)]
                        words = [t[1].lower() for t in sig if t[0] == "word"]
                        body = _transpile_tokens(_strip(it))
                        if "nulls" in words:
                            rendered.append(body)
                        elif words and words[-1] == "desc":
                            rendered.append(body + " NULLS FIRST")
                        else:
                            rendered.append(body + " NULLS LAST")
                    out.append("ORDER BY " + ", ".join(rendered))
                    # separator before a keyword terminator (not before ')')
                    if end < n and tokens[end][1] not in (")",):
                        out.append(" ")
                    i = end
                    continue
            # TABLESAMPLE BERNOULLI(p) / SYSTEM(p) (SqlBase.g4
            # sampledRelation) -> Spark TABLESAMPLE (p PERCENT).  Spark's
            # PERCENT sampling is row-level Bernoulli; SYSTEM's
            # block-level shortcut has no Spark equivalent, so both map
            # to the statistically-safe row form.
            if low == "tablesample":
                j = _next_sig(tokens, i + 1)
                if (
                    j < n
                    and tokens[j][0] == "word"
                    and tokens[j][1].lower() in ("bernoulli", "system")
                ):
                    k = _next_sig(tokens, j + 1)
                    if k < n and tokens[k] == ("op", "("):
                        close = _match_paren(tokens, k)
                        pct = _render_tokens(
                            _strip(tokens[k + 1 : close])
                        )
                        out.append(f"TABLESAMPLE ({pct} PERCENT)")
                        i = close + 1
                        continue
            # CROSS JOIN UNNEST / , UNNEST  ->  LATERAL VIEW ...
            if low in ("cross", ","):
                pass  # handled via lookahead below on 'unnest'
            if low == "unnest":
                # find the preceding significant tokens already emitted:
                # we instead look BACK in the source token stream.
                p1 = i - 1
                while p1 >= 0 and not _is_sig(tokens[p1]):
                    p1 -= 1
                joined_by_cross = False
                comma_join = p1 >= 0 and tokens[p1] == ("op", ",")
                if p1 >= 0 and tokens[p1][0] == "word" and tokens[p1][1].lower() == "join":
                    p2 = p1 - 1
                    while p2 >= 0 and not _is_sig(tokens[p2]):
                        p2 -= 1
                    if p2 >= 0 and tokens[p2][0] == "word" and tokens[p2][1].lower() == "cross":
                        joined_by_cross = True
                if joined_by_cross or comma_join:
                    res = _rewrite_unnest(tokens, i)
                    if res is not None:
                        repl, nxt = res
                        # drop the already-emitted CROSS JOIN (or comma)
                        drop = 2 if joined_by_cross else 1
                        sig_seen = 0
                        while out and sig_seen < drop:
                            popped = out.pop()
                            if popped.strip():
                                sig_seen += 1
                        out.append(" ")
                        out.append(repl)
                        i = nxt
                        continue
            # window-spec fixups for ranking/offset functions
            # (WindowAnnotationsProcessor / SqlBase.g4 windowFrame):
            # Presto accepts — and ignores — a frame clause on rank-like
            # and lag/lead functions, and allows rank() with no ORDER BY
            # (all rows are peers).  Spark rejects both, so the dialect
            # strips the irrelevant frame and, for the rank family,
            # injects a constant ORDER BY reproducing all-peers.
            if low in _WINDOW_FN_FIXUPS:
                j0 = _next_sig(tokens, i + 1)
                if j0 < n and tokens[j0] == ("op", "("):
                    call_close = _match_paren(tokens, j0)
                    j1 = _next_sig(tokens, call_close + 1)
                    if (
                        j1 < n
                        and tokens[j1][0] == "word"
                        and tokens[j1][1].lower() == "over"
                    ):
                        j2 = _next_sig(tokens, j1 + 1)
                        if j2 < n and tokens[j2] == ("op", "("):
                            spec_close = _match_paren(tokens, j2)
                            spec = tokens[j2 + 1 : spec_close]
                            # truncate at a top-level frame keyword
                            depth = 0
                            cut = len(spec)
                            has_order = False
                            for si, (sk, st) in enumerate(spec):
                                if sk == "op" and st == "(":
                                    depth += 1
                                elif sk == "op" and st == ")":
                                    depth -= 1
                                elif sk == "word" and depth == 0:
                                    w = st.lower()
                                    if w in ("rows", "range", "groups"):
                                        cut = si
                                        break
                                    if w == "order":
                                        has_order = True
                            spec_text = _transpile_tokens(_strip(spec[:cut]))
                            if low in _RANK_FAMILY and not has_order:
                                spec_text = (spec_text + " ORDER BY 1").strip()
                            call = _transpile_tokens(tokens[i : call_close + 1])
                            out.append(f"{call} OVER ({spec_text})")
                            i = spec_close + 1
                            continue
            # Quantified comparisons (SqlBase.g4 comparisonQuantifier):
            # Spark has no ANY/SOME/ALL quantifiers — `= ANY(subq)` is
            # IN and `<> ALL(subq)` is NOT IN (exact 3-valued-logic
            # equivalents); the other operator/quantifier combinations
            # have no NULL-and-empty-set-faithful rewrite and raise the
            # documented-gap error instead of a Spark parse failure.
            if low in ("any", "some", "all"):
                j = _next_sig(tokens, i + 1)
                p1 = i - 1
                while p1 >= 0 and not _is_sig(tokens[p1]):
                    p1 -= 1
                prev_op = (
                    tokens[p1][1]
                    if p1 >= 0 and tokens[p1][0] == "op"
                    and tokens[p1][1] in ("=", "<>", "!=", "<", "<=", ">", ">=")
                    else None
                )
                if prev_op and j < n and tokens[j] == ("op", "("):
                    if prev_op == "=" and low in ("any", "some"):
                        repl = "IN"
                    elif prev_op in ("<>", "!=") and low == "all":
                        repl = "NOT IN"
                    else:
                        raise PrestoFeatureUnsupportedError(
                            f"quantified comparison {prev_op} {text.upper()}"
                        )
                    # drop the already-emitted comparison operator
                    # (match its text — a comment between the operator
                    # and the quantifier must not be popped instead)
                    kept: list[str] = []
                    while out:
                        popped = out.pop()
                        if popped.strip() == prev_op:
                            break
                        kept.append(popped)
                    out.extend(reversed(kept))
                    out.append(f" {repl} ")
                    i += 1
                    continue
            # ROW constructor / ROW type (SqlBase.g4 rowConstructor,
            # ROW type): constructor -> struct(...); in a CAST type
            # position (after AS) -> STRUCT<name: type, ...> so
            # `CAST(ROW(1,2) AS ROW(x int, y int)).x` keeps working.
            if low == "row":
                j = _next_sig(tokens, i + 1)
                if j < n and tokens[j] == ("op", "("):
                    close = _match_paren(tokens, j)
                    p1 = i - 1
                    while p1 >= 0 and not _is_sig(tokens[p1]):
                        p1 -= 1
                    in_type_pos = (
                        p1 >= 0
                        and tokens[p1][0] == "word"
                        and tokens[p1][1].lower() == "as"
                    )
                    if in_type_pos:
                        out.append(_row_type_to_struct(tokens[i : close + 1]))
                    else:
                        inner = _transpile_tokens(tokens[j + 1 : close])
                        out.append(f"struct({inner})")
                    i = close + 1
                    continue
            # timezone_hour/minute over `expr AT TIME ZONE 'tz'`
            # (SqlBase.g4 AT_TIMEZONE; DateTimeFunctions timezoneHour):
            # Spark has no timestamp-with-time-zone VALUE, but the zone
            # OFFSET at the instant is computable — from_utc_timestamp
            # shifts the wall clock by exactly that offset under the
            # engine's pinned UTC session zone.  Truncation toward zero
            # reproduces Presto's -5:-30 split for negative offsets.
            if low in ("timezone_hour", "timezone_minute"):
                j = _next_sig(tokens, i + 1)
                if j < n and tokens[j] == ("op", "("):
                    close = _match_paren(tokens, j)
                    atz = _split_at_time_zone(_strip(tokens[j + 1 : close]))
                    if atz is not None:
                        expr_toks, tz = atz
                        e = _transpile_tokens(expr_toks)
                        off = (
                            f"(unix_timestamp(from_utc_timestamp({e}, {tz}))"
                            f" - unix_timestamp({e}))"
                        )
                        if low == "timezone_hour":
                            out.append(f"CAST({off} / 3600.0 AS INT)")
                        else:
                            out.append(
                                f"(CAST({off} / 60.0 AS INT)"
                                f" - 60 * CAST({off} / 3600.0 AS INT))"
                            )
                        i = close + 1
                        continue
            # Documented type gaps -> clear transpiler errors instead of
            # Spark's downstream parse failure.
            if low == "at":
                j1 = _next_sig(tokens, i + 1)
                j2 = _next_sig(tokens, j1 + 1) if j1 < n else n
                if (
                    j2 < n
                    and tokens[j1][0] == "word"
                    and tokens[j1][1].lower() == "time"
                    and tokens[j2][0] == "word"
                    and tokens[j2][1].lower() == "zone"
                ):
                    raise PrestoFeatureUnsupportedError(
                        "timestamp with time zone (AT TIME ZONE outside"
                        " timezone_hour/timezone_minute)"
                    )
            if low == "time":
                j1 = _next_sig(tokens, i + 1)
                p1 = i - 1
                while p1 >= 0 and not _is_sig(tokens[p1]):
                    p1 -= 1
                prev = tokens[p1][1].lower() if p1 >= 0 and tokens[p1][0] == "word" else ""
                if j1 < n and tokens[j1][0] == "str":
                    raise PrestoFeatureUnsupportedError("TIME literal / time type")
                if prev == "with" and j1 < n and tokens[j1][1].lower() == "zone":
                    # `<type> WITH TIME ZONE` — the leading TIME/TIMESTAMP
                    # word was already emitted; the message names the gap.
                    raise PrestoFeatureUnsupportedError("type with time zone")
                if prev == "as" and j1 < n and tokens[j1] == ("op", ")"):
                    # only a CAST's type position — `SELECT 1 AS time)`
                    # inside a subquery is a legal alias.  Walk back to
                    # the innermost unmatched '(' and require cast(.
                    depth = 0
                    k2 = i - 1
                    in_cast = False
                    while k2 >= 0:
                        kk, tt = tokens[k2]
                        if kk == "op" and tt == ")":
                            depth += 1
                        elif kk == "op" and tt == "(":
                            if depth == 0:
                                p2 = k2 - 1
                                while p2 >= 0 and not _is_sig(tokens[p2]):
                                    p2 -= 1
                                in_cast = (
                                    p2 >= 0
                                    and tokens[p2][0] == "word"
                                    and tokens[p2][1].lower() in ("cast", "try_cast")
                                )
                                break
                            depth -= 1
                        k2 -= 1
                    if in_cast:
                        raise PrestoFeatureUnsupportedError("CAST to time type")
            # function-call rewrites
            j = _next_sig(tokens, i + 1)
            if j < n and tokens[j] == ("op", "("):
                close = _match_paren(tokens, j)
                args = _split_args(tokens, j + 1, close)
                # rewrite inner calls first (recursive)
                args = [tokenize(_transpile_tokens(a)) for a in args]
                repl = _rewrite_call(text, args)
                if repl is not None:
                    out.append(repl)
                    i = close + 1
                    continue
                if low in _CALL_RENAMES:
                    inner = ", ".join(_render_tokens(_strip(a)) for a in args)
                    out.append(f"{_CALL_RENAMES[low]}({inner})")
                    i = close + 1
                    continue
        out.append(text)
        i += 1
    return "".join(out)


def transpile(sql: str) -> str:
    """Presto SQL text -> Spark SQL text."""
    tokens = tokenize(sql)
    view_ddl = _rewrite_view_ddl(tokens)
    if view_ddl is not None:
        return view_ddl
    return _transpile_tokens(tokens)
