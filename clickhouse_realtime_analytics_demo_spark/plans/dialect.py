"""ClickHouse -> Spark SQL dialect shim.

The reference passes raw ClickHouse SQL strings to the server
(app_interactive.py:256-304 query gateway; chat_service.py:356-405
NL->SQL), so its query surface is the ClickHouse dialect.  Our engine's
execution path is ``spark.sql``; this module rewrites the dialect
constructs the reference corpus actually uses (SURVEY.md §2.8, §3.3)
into Spark SQL so those same strings run unchanged.

Implementation: a small tokenizer walks the SQL once, skipping string
literals ('...'), line comments (``-- ...``) and block comments, and
rewrites

- function calls (balanced-paren argument parsing, recursive, so
  nested calls like ``toDate(now() - INTERVAL 7 DAY)`` work),
- ``PREWHERE`` clauses (merged into ``WHERE`` — Spark/Parquet predicate
  pushdown already gives the two-phase-read behavior, SURVEY.md X5),
- non-literal ``INTERVAL expr UNIT`` arithmetic (ClickHouse allows
  column expressions as interval counts; Spark needs
  ``make_interval``),
- ``numbers(N)`` table function -> ``range(N)`` subquery.

This is a string->string pass: no Python UDFs are registered, every
rewrite lands on a Spark builtin, so gateway queries keep whole-stage
codegen exactly like hand-written DataFrame code.
"""

from __future__ import annotations

import re
from collections.abc import Callable

__all__ = ["rewrite"]

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_NUM = re.compile(r"^\d+$")
_INTERVAL_ARG = re.compile(r"^\s*INTERVAL\s+(\S+)\s+(\w+?)S?\s*$", re.IGNORECASE)

_UNIT_SECONDS = {
    "SECOND": 1,
    "MINUTE": 60,
    "HOUR": 3600,
    "DAY": 86400,
}

# make_interval(years, months, weeks, days, hours, mins, secs) slot per unit
_MAKE_INTERVAL_SLOT = {
    "YEAR": 0,
    "MONTH": 1,
    "WEEK": 2,
    "DAY": 3,
    "HOUR": 4,
    "MINUTE": 5,
    "SECOND": 6,
}


def _strip_quotes(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        return s[1:-1]
    return s


def _datediff(args: list[str]) -> str:
    """ClickHouse dateDiff(unit, start, end) counts *boundary
    crossings* from start to end (SURVEY.md §2.8) — not elapsed time.
    Each unit maps to an expression with exactly those semantics."""
    unit = _strip_quotes(args[0]).upper()
    a, b = args[1].strip(), args[2].strip()
    if unit == "DAY":
        return f"datediff(CAST({b} AS DATE), CAST({a} AS DATE))"
    if unit == "WEEK":
        return f"(datediff(CAST(date_trunc('week', {b}) AS DATE), CAST(date_trunc('week', {a}) AS DATE)) div 7)"
    if unit == "MONTH":
        return f"((year({b}) - year({a})) * 12 + (month({b}) - month({a})))"
    if unit == "QUARTER":
        return f"((year({b}) - year({a})) * 4 + (quarter({b}) - quarter({a})))"
    if unit == "YEAR":
        return f"(year({b}) - year({a}))"
    if unit in _UNIT_SECONDS:
        s = _UNIT_SECONDS[unit]
        lu = unit.lower()
        return (
            f"((unix_timestamp(date_trunc('{lu}', {b})) - "
            f"unix_timestamp(date_trunc('{lu}', {a}))) div {s})"
        )
    raise ValueError(f"dateDiff: unsupported unit {unit!r}")


def _to_start_of_interval(args: list[str]) -> str:
    ts = args[0].strip()
    m = _INTERVAL_ARG.match(args[1])
    if not m:
        raise ValueError(f"toStartOfInterval: expected INTERVAL literal, got {args[1]!r}")
    n, unit = int(m.group(1)), m.group(2).upper()
    if unit in _UNIT_SECONDS:
        s = n * _UNIT_SECONDS[unit]
        return f"timestamp_seconds((unix_timestamp({ts}) div {s}) * {s})"
    if unit == "MONTH" and n == 1:
        return f"date_trunc('month', {ts})"
    raise ValueError(f"toStartOfInterval: unsupported unit {unit!r}")


def _format_readable_size(args: list[str]) -> str:
    x = args[0].strip()
    tiers = [(1024**4, "TiB"), (1024**3, "GiB"), (1024**2, "MiB"), (1024, "KiB")]
    branches = "".join(
        f"WHEN {x} >= {t} THEN concat(CAST(round({x} / {t}.0, 2) AS STRING), ' {label}') "
        for t, label in tiers
    )
    return f"(CASE {branches}ELSE concat(CAST(round({x}, 2) AS STRING), ' B') END)"


def _cond(arg: str) -> str:
    """ClickHouse -If combinators accept UInt8 conditions (nonzero =
    true, e.g. countIf(JSONHas(...))); Spark's count_if/CASE want
    BOOLEAN. CAST(... AS BOOLEAN) is an identity on booleans and the
    nonzero test on integers — exactly ClickHouse's coercion."""
    return f"CAST({arg.strip()} AS BOOLEAN)"


def _sum_if(args: list[str]) -> str:
    # ClickHouse sumIf returns 0 (not NULL) when nothing matches.
    return f"coalesce(sum(CASE WHEN {_cond(args[1])} THEN {args[0].strip()} END), 0)"


def _avg_if(args: list[str]) -> str:
    return f"avg(CASE WHEN {_cond(args[1])} THEN {args[0].strip()} END)"


def _regex_escaped_literal(arg: str) -> str:
    """Spark ``split`` takes a REGEX; ClickHouse splitByChar/-String
    take literal separators. Escape when the arg is a quoted literal;
    pass through (wrapped) otherwise."""
    s = arg.strip()
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'":
        import re as _re

        return "'" + _re.escape(s[1:-1]).replace("\\", "\\\\").replace("'", "\\'") + "'"
    return s


def _rename(name: str) -> Callable[[list[str]], str]:
    def fn(args: list[str]) -> str:
        return f"{name}({', '.join(a.strip() for a in args)})"

    return fn


def _count(args: list[str]) -> str:
    if not args or not args[0].strip():
        return "count(*)"
    return f"count({', '.join(a.strip() for a in args)})"


def _json_path_parts(args: list[str]) -> tuple[str, list[str]]:
    """Shared key→JSONPath-segment translation for the JSON family.
    Returns (json expr, path segments). Numeric indices (1-based array
    access in ClickHouse) map to [i-1]. Keys containing a dot (or
    other JSONPath metacharacters) take the bracket form
    ``$['key.with.dots']`` so they read ONE key, not a nested path.
    Negative (from-the-end) indices are rejected — Spark's
    get_json_object JSONPath has no from-the-end addressing, and a
    silent [-n-1] translation would always read NULL (r11 ADVICE
    dialect.py:164)."""
    expr = args[0].strip()
    parts = []
    for raw in args[1:]:
        key = _strip_quotes(raw.strip())
        if key.lstrip("-").isdigit():
            idx = int(key)
            if idx < 0:
                raise ValueError(
                    "JSONExtract: negative (from-the-end) indices are not "
                    "supported by Spark's get_json_object JSONPath"
                )
            parts.append(f"[{idx - 1}]")
        elif key.isidentifier():
            parts.append(f".{key}")
        else:
            if "'" in key or "\\" in key:
                raise ValueError(
                    f"JSONExtract: key {key!r} contains a quote/backslash — "
                    "not expressible in Spark's JSONPath literal"
                )
            parts.append(f"['{key}']")
    return expr, parts


def _path_literal(path: str) -> str:
    # bracket-form keys put single quotes INSIDE the SQL string
    # literal — backslash-escape them for Spark's parser
    return "'" + path.replace(chr(39), chr(92) + chr(39)) + "'"


def _json_path(args: list[str]) -> str:
    """ClickHouse JSONExtract*(json, 'key'[, 'key2'...]) single/nested
    key form → get_json_object(json, '$.key[.key2...]')."""
    expr, parts = _json_path_parts(args)
    return f"get_json_object({expr}, {_path_literal('$' + ''.join(parts))})"


def _json_has(args: list[str]) -> str:
    """JSONHas → presence probe that counts JSON nulls as present,
    matching ClickHouse in BOTH addressing forms (r12/r13 divergences,
    now closed):

    - **object key** (``.key`` or bracket-form ``['k.x']`` for keys
      with dots/metacharacters): ``json_object_keys`` on the ENCLOSING
      object — ``JSONHas('{"a":null}','a') = 1``. Non-object parents
      and malformed JSON yield NULL keys → 0, the ClickHouse result.
    - **array index** (last arg numeric, 1-based): index-EXISTENCE via
      ``json_array_length`` on the enclosing array — a null ELEMENT
      counts (``JSONHas('[null]', 1) = 1``), out-of-range and
      non-array parents are 0 (VERDICT r13 #6: the old extraction
      probe conflated null elements with absent indices).

    Emits a summable 0/1 INT (the UInt8 analog); a BARE WHERE
    JSONHas(...) must be written `JSONHas(...) = 1` (Spark refuses an
    int condition — loud, never silent; the If-combinator positions
    are coerced by _cond)."""
    expr, parts = _json_path_parts(args)
    if not parts:
        return f"coalesce(CAST({_json_path(args)} IS NOT NULL AS INT), 0)"
    last = parts[-1]
    parent = "$" + "".join(parts[:-1])
    if last.startswith("[") and not last.startswith("['"):
        # numeric index: parts hold the 0-based translation, so the
        # element exists iff the enclosing array's length exceeds it
        idx0 = int(last[1:-1])
        if idx0 < 0:
            # ClickHouse indices are 1-based (negatives rejected
            # upstream), so index 0 translated to [-1] here: it
            # addresses no element — JSONHas is 0 for EVERY array,
            # where `len > -1` would claim 1 (r14 ADVICE dialect:231)
            return "0"
        arr = (
            expr
            if len(parts) == 1
            else f"get_json_object({expr}, {_path_literal(parent)})"
        )
        return f"coalesce(CAST(json_array_length({arr}) > {idx0} AS INT), 0)"
    key = last[1:] if last.startswith(".") else _strip_quotes(last[1:-1])
    keys_expr = (
        f"json_object_keys({expr})"
        if parent == "$"
        else f"json_object_keys(get_json_object({expr}, {_path_literal(parent)}))"
    )
    key_lit = "'" + key.replace(chr(39), chr(92) + chr(39)) + "'"
    return f"coalesce(CAST(array_contains({keys_expr}, {key_lit}) AS INT), 0)"


def _uniq_merge_reject(args: list[str]) -> str:
    raise ValueError(
        "uniqMerge: the shim's uniqState finalizes to a plain count per "
        "group, so uniqMerge over it has no correct rewrite (distinct "
        "counts are not summable — sum() would overcount). Re-aggregate "
        "from the base table with uniq()/approx_count_distinct, or use "
        "the mergeable HLL state the engine's MVs keep "
        "(hll_sketch_agg / hll_union_agg, streaming/mv.py)"
    )


def _hof_reject(name: str, n_arrays: int) -> str:
    raise ValueError(
        f"{name}: {n_arrays} array arguments — Spark's array HOFs take one "
        "array (arrayMap's 2-array form maps to zip_with; others have no "
        "multi-array twin)"
    )


_REWRITES: dict[str, Callable[[list[str]], str]] = {
    # date/time extraction (01-create-tables.sql:40-41,50; app.py:92,181)
    "todate": _rename("to_date"),
    "todatetime": _rename("to_timestamp"),
    "tohour": _rename("hour"),
    "toyyyymm": lambda a: f"CAST(date_format({a[0].strip()}, 'yyyyMM') AS INT)",
    # time bucketing (05-add-refreshable-mvs:115-124; app_interactive.py:226)
    "tostartofmonth": lambda a: f"CAST(date_trunc('month', {a[0].strip()}) AS DATE)",
    "tostartofweek": lambda a: f"CAST(date_trunc('week', {a[0].strip()}) AS DATE)",
    "tomonday": lambda a: f"CAST(date_trunc('week', {a[0].strip()}) AS DATE)",
    "tostartofday": lambda a: f"date_trunc('day', {a[0].strip()})",
    "tostartofhour": lambda a: f"date_trunc('hour', {a[0].strip()})",
    "tostartofminute": lambda a: f"date_trunc('minute', {a[0].strip()})",
    "tostartofinterval": _to_start_of_interval,
    # current time (app.py:59,186)
    "now": lambda a: "current_timestamp()",
    "today": lambda a: "current_date()",
    "yesterday": lambda a: "date_sub(current_date(), 1)",
    # aggregates (SURVEY.md §2.4)
    "count": _count,
    "uniq": _rename("approx_count_distinct"),
    "uniqexact": lambda a: f"count(DISTINCT {', '.join(x.strip() for x in a)})",
    "uniqcombined": _rename("approx_count_distinct"),
    "countif": lambda a: f"count_if({_cond(a[0])})",
    "sumif": _sum_if,
    "avgif": _avg_if,
    # State/Merge combinators over fully-merged MV tables
    # (sample_queries.sql:79-85 on mv_user_funnel; DDL
    # 01-create-tables.sql:119-132): our MV parts store partials as
    # plain numbers, so -State at view-definition time is the plain
    # aggregate and -Merge at read time is SUM over the partial rows —
    # the AggregatingMergeTree algebra on relational state.
    "countstate": _count,
    "sumstate": _rename("sum"),
    "countmerge": _rename("sum"),
    "summerge": _rename("sum"),
    "uniqstate": _rename("approx_count_distinct"),
    # uniqMerge has NO value-level twin: uniqState above finalizes to a
    # NUMBER per group (distinct counts are not summable — a sum()
    # "fix" silently overcounts), so the pair cannot half-translate.
    # Loud guidance instead (r12 ADVICE): the mergeable-sketch path is
    # hll_sketch_agg/hll_union_agg, which streaming/mv.py uses for
    # exactly this (daily_user_activity's sessions_hll).
    "uniqmerge": _uniq_merge_reject,
    "grouparray": _rename("collect_list"),
    "groupuniqarray": lambda a: f"collect_set({a[0].strip()})",
    # note: quantified comparison `> ANY (SELECT ...)` must NOT become
    # any_value — guarded by the subquery check.
    "any": lambda a: (
        f"ANY({', '.join(x.strip() for x in a)})"
        if a and a[0].strip().upper().startswith(("SELECT", "WITH"))
        else f"any_value({', '.join(x.strip() for x in a)})"
    ),
    "argmax": _rename("max_by"),
    "argmin": _rename("min_by"),
    "median": lambda a: f"percentile({a[0].strip()}, 0.5)",
    "quantile": lambda a: f"percentile({a[0].strip()}, 0.5)",
    # scalar / misc (SURVEY.md §2.8)
    "datediff": _datediff,
    "date_diff": _datediff,
    "arraystringconcat": _rename("array_join"),
    "formatreadablesize": _format_readable_size,
    "intdiv": lambda a: f"({a[0].strip()} div {a[1].strip()})",
    "modulo": lambda a: f"({a[0].strip()} % {a[1].strip()})",
    "empty": lambda a: f"({a[0].strip()} = '')",
    "notempty": lambda a: f"({a[0].strip()} != '')",
    "lengthutf8": _rename("length"),
    "lowerutf8": _rename("lower"),
    "upperutf8": _rename("upper"),
    "ifnull": _rename("coalesce"),
    "if": lambda a: f"(CASE WHEN {_cond(a[0])} THEN {a[1].strip()} ELSE {a[2].strip()} END)",
    "multiif": lambda a: "(CASE "
    + " ".join(
        f"WHEN {_cond(a[i])} THEN {a[i + 1].strip()}" for i in range(0, len(a) - 1, 2)
    )
    + f" ELSE {a[-1].strip()} END)",
    "has": _rename("array_contains"),
    "numbers": lambda a: f"(SELECT id AS number FROM range({a[0].strip()}))",
    # type-conversion family (LLM/chat queries emit these constantly;
    # ClickHouse docs sql-reference/functions/type-conversion-functions)
    "tostring": lambda a: f"CAST({a[0].strip()} AS STRING)",
    "toint8": lambda a: f"CAST({a[0].strip()} AS TINYINT)",
    "toint16": lambda a: f"CAST({a[0].strip()} AS SMALLINT)",
    "toint32": lambda a: f"CAST({a[0].strip()} AS INT)",
    "toint64": lambda a: f"CAST({a[0].strip()} AS BIGINT)",
    "touint8": lambda a: f"CAST({a[0].strip()} AS INT)",
    "touint16": lambda a: f"CAST({a[0].strip()} AS INT)",
    "touint32": lambda a: f"CAST({a[0].strip()} AS BIGINT)",
    "touint64": lambda a: f"CAST({a[0].strip()} AS BIGINT)",
    "tofloat32": lambda a: f"CAST({a[0].strip()} AS FLOAT)",
    "tofloat64": lambda a: f"CAST({a[0].strip()} AS DOUBLE)",
    "todecimal32": lambda a: f"CAST({a[0].strip()} AS DECIMAL(9,{a[1].strip()}))",
    "todecimal64": lambda a: f"CAST({a[0].strip()} AS DECIMAL(18,{a[1].strip()}))",
    # array family (sample_queries.sql uses groupArray/arrayStringConcat;
    # arrayJoin is the CH idiom for explode)
    "arrayjoin": _rename("explode"),
    "arraylength": _rename("size"),
    # both 1-based; element_at also shares ClickHouse's negative
    # (from-the-end) indexing
    "arrayelement": _rename("element_at"),
    "arraydistinct": _rename("array_distinct"),
    "arraysort": _rename("array_sort"),
    "splitbychar": lambda a: f"split({a[1].strip()}, {_regex_escaped_literal(a[0])})",
    "splitbystring": lambda a: f"split({a[1].strip()}, {_regex_escaped_literal(a[0])})",
    # date-part extraction (sql-reference/functions/date-time-functions)
    "toyear": _rename("year"),
    "toquarter": _rename("quarter"),
    "tomonth": _rename("month"),
    "todayofmonth": _rename("day"),
    "tominute": _rename("minute"),
    "tosecond": _rename("second"),
    # ClickHouse toDayOfWeek: Monday=1..Sunday=7; Spark dayofweek:
    # Sunday=1..Saturday=7 — shift so both agree (DuckDB isodow twin)
    "todayofweek": lambda a: f"(((dayofweek({a[0].strip()}) + 5) % 7) + 1)",
    # string functions (sql-reference/functions/string-functions;
    # position/instr are both 1-based, 0 when absent — identical).
    # The 3-arg start_pos form maps to locate(needle, haystack, pos)
    # — instr has no start argument, and dropping it silently returned
    # the wrong position (r11 ADVICE dialect.py:260).
    "position": lambda a: (
        f"instr({a[0].strip()}, {a[1].strip()})"
        if len(a) == 2
        else f"locate({a[1].strip()}, {a[0].strip()}, {a[2].strip()})"
    ),
    "positioncaseinsensitive": lambda a: (
        f"instr(lower({a[0].strip()}), lower({a[1].strip()}))"
        if len(a) == 2
        else f"locate(lower({a[1].strip()}), lower({a[0].strip()}), {a[2].strip()})"
    ),
    "startswith": _rename("startswith"),
    "endswith": _rename("endswith"),
    "substringutf8": _rename("substring"),
    "trimleft": _rename("ltrim"),
    "trimright": _rename("rtrim"),
    "trimboth": _rename("trim"),
    "leftpad": _rename("lpad"),
    "rightpad": _rename("rpad"),
    "concatwithseparator": _rename("concat_ws"),
    "replaceall": _rename("replace"),
    "replaceregexpall": lambda a: (
        f"regexp_replace({a[0].strip()}, {a[1].strip()}, {a[2].strip()})"
    ),
    # array higher-order functions (ClickHouse puts the LAMBDA first,
    # Spark puts the array first — pure argument reorder; the lambda
    # text passes through, `x -> expr` is valid in both dialects).
    # ClickHouse's multi-array forms: arrayMap(lam, a1, a2) has an
    # exact Spark twin in zip_with; the other HOFs have none, so >1
    # array RAISES instead of silently dropping the extra arrays and
    # computing wrong results (r11 ADVICE dialect.py:260).
    "arraymap": lambda a: (
        f"transform({a[1].strip()}, {a[0].strip()})"
        if len(a) == 2
        else f"zip_with({a[1].strip()}, {a[2].strip()}, {a[0].strip()})"
        if len(a) == 3
        else _hof_reject("arrayMap", len(a) - 1)
    ),
    "arrayfilter": lambda a: (
        f"filter({a[1].strip()}, {a[0].strip()})"
        if len(a) == 2
        else _hof_reject("arrayFilter", len(a) - 1)
    ),
    "arrayexists": lambda a: (
        f"exists({a[1].strip()}, {a[0].strip()})"
        if len(a) == 2
        else _hof_reject("arrayExists", len(a) - 1)
    ),
    "arrayall": lambda a: (
        f"forall({a[1].strip()}, {a[0].strip()})"
        if len(a) == 2
        else _hof_reject("arrayAll", len(a) - 1)
    ),
    "arraycount": lambda a: (
        f"size(filter({a[1].strip()}, {a[0].strip()}))"
        if len(a) == 2
        else f"size(filter({a[0].strip()}, x -> x != 0))"
        if len(a) == 1
        else _hof_reject("arrayCount", len(a) - 1)
    ),
    "arrayfirst": lambda a: (
        f"element_at(filter({a[1].strip()}, {a[0].strip()}), 1)"
        if len(a) == 2
        else _hof_reject("arrayFirst", len(a) - 1)
    ),
    # JSON family (ClickHouse sql-reference/functions/json-functions;
    # the events.props column carries JSON): single-key forms map to
    # get_json_object path expressions — JVM-side, codegen'd, no UDF
    # Numeric/bool extractors coalesce to ClickHouse's documented
    # missing-/mistyped-key defaults (0 / 0.0 / false), and JSONHas
    # yields 0/1 INT (UInt8 analog, summable) — a bare CAST's NULL
    # diverges from ClickHouse in avg(), comparisons, and NULL-skipping
    # aggregates (r11 ADVICE dialect.py:295). JSONHas null-vs-missing
    # is resolved via json_object_keys (see _json_has).
    "jsonextractstring": lambda a: _json_path(a),
    "jsonextractraw": lambda a: _json_path(a),
    "jsonextractint": lambda a: f"coalesce(CAST({_json_path(a)} AS BIGINT), 0)",
    "jsonextractuint": lambda a: f"coalesce(CAST({_json_path(a)} AS BIGINT), 0)",
    "jsonextractfloat": lambda a: f"coalesce(CAST({_json_path(a)} AS DOUBLE), 0.0d)",
    "jsonextractbool": lambda a: f"coalesce(CAST({_json_path(a)} AS BOOLEAN), false)",
    "jsonhas": _json_has,
    "simplejsonextractstring": lambda a: _json_path(a),
    "simplejsonextractint": lambda a: f"coalesce(CAST({_json_path(a)} AS BIGINT), 0)",
    "visitparamextractstring": lambda a: _json_path(a),
    "visitparamextractint": lambda a: f"coalesce(CAST({_json_path(a)} AS BIGINT), 0)",
    # dictionary layer (06-add-dictionaries.sql.disabled:139-183;
    # examples/sample_queries.sql:163-221) — plans/dictionaries.py
    "dictget": lambda a: _dictionaries().dict_get_sql(a[0], a[1], a[2]),
    "dictgetordefault": lambda a: _dictionaries().dict_get_sql(a[0], a[1], a[2], a[3]),
    "dictgetornull": lambda a: _dictionaries().dict_get_or_null_sql(a[0], a[1], a[2]),
    "dicthas": lambda a: _dictionaries().dict_has_sql(a[0], a[1]),
}


# --- parametric aggregate combinators: ClickHouse's two-group call
# form `name(params)(args)` (sql-reference/aggregate-functions/
# parametric-functions). Spark's percentile takes the fraction as a
# plain argument, so the rewrite folds the groups together. quantile*
# (exact interpolation) → percentile; quantileTDigest* (sketch) →
# approx_percentile (Spark's quantile sketch — same contract, a
# different sketch; the engine's own t-digest lives in
# streaming/tdigest_state.py). quantiles* returns an ARRAY in
# ClickHouse — percentile with an array of fractions matches.
def _quantile_parametric(agg: str, as_array: bool):
    def fn(params: list[str], args: list[str]) -> str:
        x = ", ".join(a.strip() for a in args)
        ps = ", ".join(p.strip() for p in params)
        if as_array or len(params) > 1:
            return f"{agg}({x}, array({ps}))"
        return f"{agg}({x}, {ps})"

    return fn


def _topk_parametric(params: list[str], args: list[str]) -> str:
    raise ValueError(
        "topK(k)(x) has no single-expression Spark twin — use the "
        "relational top-k (row_number over count desc) or the mergeable "
        "topK state (streaming/topk_state.py, served by "
        "event_type_top_users_state)"
    )


_PARAMETRIC: dict[str, Callable[[list[str], list[str]], str]] = {
    "quantile": _quantile_parametric("percentile", as_array=False),
    "quantileexact": _quantile_parametric("percentile", as_array=False),
    "quantiles": _quantile_parametric("percentile", as_array=True),
    "quantilesexact": _quantile_parametric("percentile", as_array=True),
    "quantiletdigest": _quantile_parametric("approx_percentile", as_array=False),
    "quantilestdigest": _quantile_parametric("approx_percentile", as_array=True),
    # uniqUpTo(N): exact distinct count up to N, N+1 beyond — exactly
    # expressible (docs: parametric-functions#uniqupto)
    "uniqupto": lambda p, a: (
        f"least(count(DISTINCT {', '.join(x.strip() for x in a)}), "
        f"{p[0].strip()} + 1)"
    ),
    "topk": _topk_parametric,
    "topkweighted": _topk_parametric,
}


def _dictionaries():
    # Deferred import: dictionaries.py imports pyspark; keep this
    # module importable for pure string-rewrite unit tests.
    from clickhouse_realtime_analytics_demo_spark.plans import dictionaries

    return dictionaries

# Keywords that terminate a PREWHERE condition at its own paren depth.
_CLAUSE_KEYWORDS = frozenset(
    {"WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "SETTINGS", "UNION", "WINDOW", "QUALIFY"}
)


def _skip_noncode(sql: str, i: int) -> int:
    """If sql[i] starts a string literal or comment, return the index
    one past its end; otherwise return i."""
    if sql[i] == "'":
        j = i + 1
        while j < len(sql):
            if sql[j] == "\\":
                j += 2
                continue
            if sql[j] == "'":
                # '' is an escaped quote inside the literal
                if j + 1 < len(sql) and sql[j + 1] == "'":
                    j += 2
                    continue
                return j + 1
            j += 1
        return j
    if sql.startswith("--", i):
        j = sql.find("\n", i)
        return len(sql) if j < 0 else j + 1
    if sql.startswith("/*", i):
        j = sql.find("*/", i + 2)
        return len(sql) if j < 0 else j + 2
    return i


def _parse_args(sql: str, open_paren: int) -> tuple[list[str], int]:
    """Parse a balanced argument list starting at ``sql[open_paren] ==
    '('``. Returns (top-level args, index past the closing paren)."""
    depth = 0
    args: list[str] = []
    start = open_paren + 1
    i = open_paren
    while i < len(sql):
        j = _skip_noncode(sql, i)
        if j != i:
            i = j
            continue
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                args.append(sql[start:i])
                if len(args) == 1 and not args[0].strip():
                    args = []
                return args, i + 1
        elif c == "," and depth == 1:
            args.append(sql[start:i])
            start = i + 1
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def _rewrite_calls(sql: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(sql):
        j = _skip_noncode(sql, i)
        if j != i:
            out.append(sql[i:j])
            i = j
            continue
        m = _IDENT.match(sql, i)
        if not m:
            out.append(sql[i])
            i += 1
            continue
        name = m.group(0)
        k = m.end()
        while k < len(sql) and sql[k] in " \t":
            k += 1
        pfn = _PARAMETRIC.get(name.lower())
        if pfn is not None and k < len(sql) and sql[k] == "(":
            # two-group parametric form name(params)(args)?
            params, mid = _parse_args(sql, k)
            k2 = mid
            while k2 < len(sql) and sql[k2] in " \t":
                k2 += 1
            if k2 < len(sql) and sql[k2] == "(":
                args, end = _parse_args(sql, k2)
                out.append(
                    pfn(
                        [_rewrite_calls(p) for p in params],
                        [_rewrite_calls(a) for a in args],
                    )
                )
                i = end
                continue
        fn = _REWRITES.get(name.lower())
        if fn is not None and k < len(sql) and sql[k] == "(":
            args, end = _parse_args(sql, k)
            out.append(fn([_rewrite_calls(a) for a in args]))
            i = end
        else:
            out.append(name)
            i = m.end()
    return "".join(out)


def _strip_line_comments(fragment: str) -> str:
    """Remove ``-- …`` line comments (string-literal-aware)."""
    out = []
    i = 0
    while i < len(fragment):
        if fragment[i] == "'":
            j = _skip_noncode(fragment, i)
            out.append(fragment[i:j])
            i = j
            continue
        if fragment.startswith("--", i):
            j = fragment.find("\n", i)
            i = len(fragment) if j < 0 else j
            continue
        out.append(fragment[i])
        i += 1
    return "".join(out)


def _merge_prewhere(sql: str) -> str:
    """Rewrite ``PREWHERE c1 [WHERE c2]`` -> ``WHERE (c1) AND (c2)``.

    ClickHouse PREWHERE reads filter columns first and fetches the rest
    only for surviving rows (examples/sample_queries.sql:440-454); in
    Spark the same physics comes from Parquet predicate pushdown, so
    semantically it is just another conjunct.
    """
    upper = sql.upper()
    pos = 0
    while True:
        hit = None
        i, depth = 0, 0
        while i < len(sql):
            j = _skip_noncode(sql, i)
            if j != i:
                i = j
                continue
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            elif i >= pos and upper.startswith("PREWHERE", i) and _is_word(upper, i, 8):
                hit = (i, depth)
                break
            i += 1
        if hit is None:
            return sql
        start, pdepth = hit
        # find the end of the PREWHERE condition at the same depth
        i, depth = start + 8, pdepth
        cond_end, next_kw = len(sql), None
        while i < len(sql):
            j = _skip_noncode(sql, i)
            if j != i:
                i = j
                continue
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == pdepth:  # closing the subquery containing PREWHERE
                    cond_end = i
                    break
                depth -= 1
            elif c == ";" and depth == pdepth:
                cond_end = i
                break
            elif depth == pdepth:
                m = _IDENT.match(sql, i)
                if m and m.group(0).upper() in _CLAUSE_KEYWORDS:
                    cond_end, next_kw = i, m.group(0).upper()
                    break
                if m:
                    i = m.end()
                    continue
            i += 1
        # drop line comments from the captured condition: it gets
        # re-embedded inside parens on one logical line, where a
        # trailing `-- …` would swallow the closing paren
        cond = _strip_line_comments(sql[start + 8 : cond_end]).strip()
        if next_kw == "WHERE":
            # merge: PREWHERE c1 WHERE -> WHERE (c1) AND
            sql = sql[:start] + f"WHERE ({cond}) AND " + sql[cond_end + 5 :].lstrip()
        else:
            sql = sql[:start] + f"WHERE {cond} " + sql[cond_end:]
        upper = sql.upper()
        pos = start + 1


def _is_word(upper: str, i: int, length: int) -> bool:
    before_ok = i == 0 or not (upper[i - 1].isalnum() or upper[i - 1] == "_")
    end = i + length
    after_ok = end >= len(upper) or not (upper[end].isalnum() or upper[end] == "_")
    return before_ok and after_ok


_INTERVAL_EXPR = re.compile(
    r"\bINTERVAL\s+([A-Za-z_][A-Za-z0-9_.]*)\s+(SECOND|MINUTE|HOUR|DAY|WEEK|MONTH|YEAR)S?\b",
    re.IGNORECASE,
)


def _rewrite_nonliteral_intervals(sql: str) -> str:
    """``INTERVAL number DAY`` with a *column* count (legal in
    ClickHouse, e.g. sample_queries.sql:371) -> ``make_interval``."""

    def repl(m: re.Match[str]) -> str:
        count, unit = m.group(1), m.group(2).upper()
        slots = ["0"] * 7
        slots[_MAKE_INTERVAL_SLOT[unit]] = f"CAST({count} AS INT)"
        return f"make_interval({', '.join(slots)})"

    return _INTERVAL_EXPR.sub(repl, sql)


# ClickHouse EXPLAIN variants (PIPELINE, indexes=1, PLAN, ESTIMATE,
# SYNTAX, AST — sample_queries.sql:461-479) all normalize to Spark's
# EXPLAIN: Catalyst's formatted plan is the single surface carrying
# the pipeline/index-usage answers (PushedFilters, partition pruning).
_EXPLAIN_VARIANT = re.compile(
    r"^(\s*)EXPLAIN\s+(PIPELINE|PLAN|ESTIMATE|AST|SYNTAX|QUERY\s+TREE|indexes\s*=\s*1)\b\s*",
    re.IGNORECASE,
)

# system.* table names → flat view names (ops/introspect + query_log
# analogs registered by plans/corpus.prepare_reference_env; the
# reference reads them at sample_queries.sql:483-543).
_SYSTEM_TABLE = re.compile(
    r"\bsystem\.(query_log|parts|dictionaries|tables|functions|columns)\b",
    re.IGNORECASE,
)


def sub_code_only(pattern: re.Pattern, repl, sql: str) -> str:
    """Apply ``pattern.sub(repl, ...)`` to the CODE segments of the
    SQL only — string literals and comments pass through verbatim
    (the same scanner contract as ``_rewrite_calls``). Used for the
    whole-text regex rewrites (system.* mapping here; the corpus
    clock pin), which would otherwise silently rewrite matches inside
    literals, e.g. a gateway query filtering system_query_log by a
    query-text LIKE 'system.parts%'."""
    out: list[str] = []
    code_start = 0
    i = 0
    while i < len(sql):
        j = _skip_noncode(sql, i)
        if j != i:
            out.append(pattern.sub(repl, sql[code_start:i]))
            out.append(sql[i:j])
            code_start = i = j
            continue
        i += 1
    out.append(pattern.sub(repl, sql[code_start:]))
    return "".join(out)


# ---------------------------------------------- SELECT-alias precedence
#
# ClickHouse resolves a SELECT-list alias with PRECEDENCE over a
# same-named base column everywhere else in the query (the default
# prefer_column_name_to_alias=0); Spark resolves the reverse — a base
# column wins and the lateral alias loses, so the reference's
# `SUM(unique_users) AS unique_users ... revenue / unique_users`
# (examples/sample_queries.sql:89-100) either fails analysis
# (MISSING_AGGREGATION) or silently computes over the wrong column.
# The pass below recovers ClickHouse semantics by INLINING each
# alias's expression into later references: later select items and
# HAVING always; WHERE and GROUP BY only for aggregate-free,
# window-free aliases (an aggregate there is ClickHouse-illegal too).
# ORDER BY needs nothing — both engines resolve sort names against
# the output list first. AS-form aliases only; a parenthesized
# subquery is its own scope (substitution never descends into one,
# and each nested SELECT block is processed independently).

_AGG_NAMES = (
    # this pass runs BEFORE _rewrite_calls, so it must recognize both
    # the ClickHouse spellings (incl. the -State/-Merge/-If combinator
    # families, e.g. ex_2_3's sumMerge) and the Spark names the MV
    # fixture bodies already use
    r"sum|count|avg|min|max|median|any|anyLast|anyHeavy|argMin|argMax"
    r"|uniq\w*|quantile\w*|topK|groupArray\w*|groupUniqArray|groupBitmap\w*"
    r"|corr|covar\w*|stddev\w*|var\w*|\w+State|\w+Merge"
    # -If combinator: ONLY over known aggregate bases — a bare \w+If
    # also matched the SCALAR If family (multiIf/if/nullIf), excluding
    # their aliases from the `plain` map and silently resolving them
    # to base columns inside aggregates (r13 ADVICE, dialect.py:806)
    r"|(?:sum|count|avg|min|max|any|anyLast|anyHeavy|argMin|argMax|median"
    r"|topK|groupArray|groupUniqArray|corr|covarPop|covarSamp"
    r"|stddevPop|stddevSamp|varPop|varSamp)If"
    r"|first_value|last_value|collect_list|collect_set|approx_count_distinct"
    r"|percentile\w*|hll_sketch_agg|hll_union_agg"
)
# `OVER (…)` or a named window `OVER w` (WINDOW clause) — the bare
# paren form alone let named-window aliases into the `plain` map
# (r13 ADVICE, dialect.py:872)
_AGG_OR_WINDOW = re.compile(
    rf"(?i)\b({_AGG_NAMES})\s*\(|\bover\s*\(|\bover\s+[A-Za-z_]"
)
_AGG_NAME = re.compile(rf"(?i)^({_AGG_NAMES}|over)$")

# clause keywords that end the select list / delimit block clauses,
# at the block's own paren depth
_SELECT_LIST_END = frozenset(
    {"FROM", "WHERE", "PREWHERE", "GROUP", "HAVING", "ORDER", "LIMIT",
     "SETTINGS", "WINDOW", "QUALIFY", "UNION", "INTO", "FORMAT"}
)


def _scan_tokens(sql: str, start: int):
    """Yield (kind, i, j) over sql[start:]: kind 'noncode' (literal or
    comment), 'ident', or 'char'."""
    i = start
    while i < len(sql):
        j = _skip_noncode(sql, i)
        if j != i:
            yield "noncode", i, j
            i = j
            continue
        m = _IDENT.match(sql, i)
        if m:
            yield "ident", i, m.end()
            i = m.end()
            continue
        yield "char", i, i + 1
        i += 1


def _split_select_alias(item: str) -> tuple[str, str | None]:
    """Split one select item at its LAST top-level ``AS``; returns
    (expr, alias) or (item, None). ``CAST(x AS INT)``'s AS sits at
    depth 1 and never matches."""
    depth = 0
    last: tuple[int, int] | None = None
    for kind, i, j in _scan_tokens(item, 0):
        if kind == "char":
            if item[i] == "(":
                depth += 1
            elif item[i] == ")":
                depth -= 1
        elif kind == "ident" and depth == 0 and item[i:j].upper() == "AS":
            last = (i, j)
    if last is None:
        return item, None
    alias = item[last[1]:].strip()
    if not _IDENT.fullmatch(alias):
        return item, None
    return item[: last[0]], alias


def _substitute_aliases(
    text: str, aliases: dict[str, str], plain: dict[str, str] | None = None
) -> str:
    """Replace bare references to ``aliases`` keys with their
    parenthesized expressions. Exact-case identifier match (ClickHouse
    identifiers are case-sensitive); skips function-call positions,
    qualified names, and whole parenthesized subqueries. INSIDE an
    aggregate/OVER call only the ``plain`` (aggregate-free) subset
    applies — ClickHouse resolves a name in an aggregate's argument to
    the base column when the alias would nest aggregates
    (`SUM(page_views) AS page_views ... SUM(page_views)` sums the
    column, never the alias), but still expands scalar aliases there
    (`x+1 AS y, SUM(y)` sums x+1)."""
    if plain is None:
        plain = {k: v for k, v in aliases.items() if not _AGG_OR_WINDOW.search(v)}
    if not aliases:
        return text
    # lambda params (`x -> …`, `(x, y) -> …` in HOFs) shadow aliases
    # for the whole text: substituting either the declaration or a body
    # reference would corrupt the lambda — exclude colliding names
    lam = {
        m.group(1)
        for m in re.finditer(r"([A-Za-z_][A-Za-z0-9_]*)\s*(?:,|\))?\s*->", text)
    } | {
        n
        for m in re.finditer(r"\(([^()]*)\)\s*->", text)
        for n in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", m.group(1))
    }
    if lam & set(aliases):
        aliases = {k: v for k, v in aliases.items() if k not in lam}
        plain = {k: v for k, v in plain.items() if k not in lam}
        if not aliases:
            return text
    out: list[str] = []
    depth = 0
    agg_stack: list[int] = []  # paren depths of open aggregate calls
    pending_agg = False
    i = 0
    while i < len(text):
        j = _skip_noncode(text, i)
        if j != i:
            out.append(text[i:j])
            i = j
            continue
        if text[i] == "(":
            # subquery? copy the balanced group verbatim
            k = i + 1
            while k < len(text) and text[k] in " \t\r\n":
                k += 1
            m = _IDENT.match(text, k)
            if m and m.group(0).upper() == "SELECT":
                d2, k2 = 0, i
                while k2 < len(text):
                    j2 = _skip_noncode(text, k2)
                    if j2 != k2:
                        k2 = j2
                        continue
                    if text[k2] == "(":
                        d2 += 1
                    elif text[k2] == ")":
                        d2 -= 1
                        if d2 == 0:
                            k2 += 1
                            break
                    k2 += 1
                out.append(text[i:k2])
                i = k2
                pending_agg = False
                continue
            depth += 1
            if pending_agg:
                agg_stack.append(depth)
                pending_agg = False
            out.append("(")
            i += 1
            continue
        if text[i] == ")":
            if agg_stack and agg_stack[-1] == depth:
                agg_stack.pop()
            depth -= 1
            out.append(")")
            i += 1
            continue
        m = _IDENT.match(text, i)
        if not m:
            if text[i] not in " \t\r\n":
                pending_agg = False
            out.append(text[i])
            i += 1
            continue
        name = m.group(0)
        scope = plain if agg_stack else aliases
        expr = scope.get(name)
        qualified = (i > 0 and text[i - 1] == ".") or (
            m.end() < len(text) and text[m.end()] == "."
        )
        k = m.end()
        while k < len(text) and text[k] in " \t":
            k += 1
        is_call = k < len(text) and text[k] == "("
        pending_agg = is_call and bool(_AGG_NAME.fullmatch(name))
        if expr is not None and not qualified and not is_call:
            out.append(f"({expr})")
        else:
            out.append(name)
        i = m.end()
    return "".join(out)


def _rewrite_select_block(sql: str, start: int) -> tuple[str, int]:
    """Process one SELECT block starting just after its SELECT keyword:
    returns (rewritten block text, end index). The block ends when
    paren depth drops below the block's own, at a top-level ``;``, or
    at a top-level UNION/EXCEPT/INTERSECT (the next set operand is its
    own block, picked up by the outer scan)."""
    depth = 0
    items: list[str] = []
    seg_start = start
    pos = start
    end = len(sql)
    clauses: list[tuple[str, int, int]] = []  # (KW, seg_start, seg_end)
    cur_kw: str | None = None
    cur_start = -1
    in_select_list = True

    def _close_clause(upto: int) -> None:
        nonlocal cur_kw, cur_start
        if cur_kw is not None:
            clauses.append((cur_kw, cur_start, upto))
            cur_kw = None

    for kind, i, j in _scan_tokens(sql, start):
        if kind == "noncode":
            continue
        if kind == "char":
            c = sql[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth < 0:
                    end = i
                    break
            elif c == ";" and depth == 0:
                end = i
                break
            elif c == "," and depth == 0 and in_select_list:
                items.append(sql[seg_start:i])
                seg_start = i + 1
            continue
        word = sql[i:j].upper()
        if depth == 0 and word in ("UNION", "EXCEPT", "INTERSECT"):
            end = i
            break
        if depth == 0 and in_select_list and word in _SELECT_LIST_END:
            items.append(sql[seg_start:i])
            in_select_list = False
            cur_kw, cur_start = word, i
            continue
        if depth == 0 and not in_select_list and word in _SELECT_LIST_END:
            if word == "BY":  # GROUP BY / ORDER BY continuation
                continue
            _close_clause(i)
            cur_kw, cur_start = word, i
    else:
        i = len(sql)
    if in_select_list:
        items.append(sql[seg_start:end])
        in_select_list = False
    _close_clause(end)

    aliases: dict[str, str] = {}  # every AS alias (for later items/HAVING)
    plain: dict[str, str] = {}  # aggregate-free subset (WHERE/GROUP BY)
    new_items: list[str] = []
    for item in items:
        item = _substitute_aliases(item, aliases, plain)
        expr, alias = _split_select_alias(item)
        if alias is not None and expr.strip() != alias:
            # line comments inside the expression would comment out
            # everything after the inlined `(expr)` — strip them
            clean = _strip_line_comments(expr).strip()
            aliases[alias] = clean
            if not _AGG_OR_WINDOW.search(clean):
                plain[alias] = clean
        new_items.append(item)

    out = [",".join(new_items)]
    for kw, s, e in clauses:
        seg = sql[s:e]
        if kw == "HAVING":
            seg = _substitute_aliases(seg, aliases, plain)
        elif kw in ("WHERE", "PREWHERE", "GROUP"):
            seg = _substitute_aliases(seg, plain, plain)
        out.append(seg)
    # nested SELECTs (subqueries in items, FROM, or predicates) are
    # their own scopes — recurse over the rebuilt text
    return _inline_select_aliases("".join(out)), end


def _inline_select_aliases(sql: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(sql):
        j = _skip_noncode(sql, i)
        if j != i:
            out.append(sql[i:j])
            i = j
            continue
        m = _IDENT.match(sql, i)
        if m and m.group(0).upper() == "SELECT":
            out.append(sql[i : m.end()])
            block, end = _rewrite_select_block(sql, m.end())
            out.append(block)
            i = end
            continue
        if m:
            out.append(m.group(0))
            i = m.end()
            continue
        out.append(sql[i])
        i += 1
    return "".join(out)


def rewrite(sql: str) -> str:
    """Rewrite a ClickHouse-dialect query into Spark SQL."""
    sql = _EXPLAIN_VARIANT.sub(r"\1EXPLAIN ", sql)
    sql = sub_code_only(
        _SYSTEM_TABLE, lambda m: f"system_{m.group(1).lower()}", sql
    )
    sql = _merge_prewhere(sql)
    sql = _inline_select_aliases(sql)
    sql = _rewrite_calls(sql)
    sql = _rewrite_nonliteral_intervals(sql)
    return sql
