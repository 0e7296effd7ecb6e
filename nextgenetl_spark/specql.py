"""Declarative relational query specs with twin renderers.

A ``QuerySpec`` is a small, data-only description of a relational query —
base table, optional FK join, conjunctive filters, optional grouping with
aggregates, optional projection/DISTINCT/HAVING. Two independent renderers
compile ONE spec into (a) a PySpark DataFrame plan and (b) an ANSI SQL
string a DuckDB oracle can run. Because both executables derive from the
same value, any divergence between them is a bug in exactly one renderer or
engine — this is the reference's tier-1 test discipline
(``SURVEY.md §5``: golden SQL ↔ result parity, cf.
``tests in the reference repo exercising generated SQL strings``) applied
to the operator layer itself, and it powers the differential fuzz in
``tests/test_relational_fuzz.py``.

Cross-engine canonicalization rules (the same ones every workload oracle in
this repo follows):

- ``SUM`` over DOUBLE rounds to 2 decimals on both sides — inputs are
  2-decimal money values, so the true sum is always a 2-decimal number and
  sits 0.005 from any rounding boundary, far above double accumulation
  error at any group size this engine meets.
- ``SUM`` over INTEGER casts to BIGINT on the DuckDB side (DuckDB widens to
  HUGEINT, which stringifies identically but types differently).
- ``AVG`` is deliberately NOT in the fuzz surface: avg of 2-decimal values
  lands on arbitrary rationals whose round-half digit can sit within one
  double ulp of a rounding boundary, where HALF_UP vs round-to-even
  diverges spuriously. The workload suite pins AVG with hand-chosen
  fixtures instead (``pricing_summary``).
- ``COUNT``/``COUNT(DISTINCT)``/``MIN``/``MAX`` are exact and need no
  normalization.
- Window functions restrict to DETERMINISTIC shapes: the ORDER BY key is
  always the base table's unique PK, so ``row_number``/``lag`` have a
  single valid answer; ``rank`` without a unique order key would still be
  value-deterministic but is covered by the same shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nextgenetl_spark.catalog import load

# (table, column) -> logical type: "int", "double", "str", "ts"
SCHEMA: dict[str, dict[str, str]] = {
    "nation": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "int",
        "c_name": "str",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "str",
    },
    "orders": {
        "o_orderkey": "int",
        "o_custkey": "int",
        "o_orderstatus": "str",
        "o_totalprice": "double",
        "o_orderdate": "ts",
        "o_orderpriority": "str",
    },
    "lineitem": {
        "l_orderkey": "int",
        "l_partkey": "int",
        "l_suppkey": "int",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "str",
        "l_linestatus": "str",
        "l_shipdate": "ts",
    },
    "supplier": {"s_suppkey": "int", "s_name": "str", "s_nationkey": "int", "s_acctbal": "double"},
    "part": {
        "p_partkey": "int",
        "p_name": "str",
        "p_brand": "str",
        "p_type": "str",
        "p_size": "int",
        "p_retailprice": "double",
    },
}

# base table -> [(other table, base key, other key)]
FOREIGN_KEYS: dict[str, list[tuple[str, str, str]]] = {
    "orders": [("customer", "o_custkey", "c_custkey")],
    "lineitem": [
        ("orders", "l_orderkey", "o_orderkey"),
        ("part", "l_partkey", "p_partkey"),
        ("supplier", "l_suppkey", "s_suppkey"),
    ],
    "customer": [("nation", "c_nationkey", "n_nationkey")],
    "supplier": [("nation", "s_nationkey", "n_nationkey")],
}

# multi-hop FK paths for chain joins (each hop: other, base_key, other_key)
JOIN_CHAINS: list[list[tuple]] = [
    [("orders", "l_orderkey", "o_orderkey"), ("customer", "o_custkey", "c_custkey")],
    [("orders", "l_orderkey", "o_orderkey"), ("customer", "o_custkey", "c_custkey"),
     ("nation", "c_nationkey", "n_nationkey")],
    [("customer", "o_custkey", "c_custkey"), ("nation", "c_nationkey", "n_nationkey")],
    [("supplier", "l_suppkey", "s_suppkey"), ("nation", "s_nationkey", "n_nationkey")],
]
# base table each chain starts from
CHAIN_BASES = ["lineitem", "lineitem", "orders", "lineitem"]

FILTER_OPS = ("=", "<>", "<", "<=", ">", ">=", "in", "like", "isnull", "notnull")
AGG_FNS = ("count", "sum", "min", "max", "count_distinct")


@dataclass
class QuerySpec:
    """One relational query, engine-neutrally."""

    table: str
    join: tuple | None = None  # (other_table, base_key, other_key, "inner"|"left")
    chain: list = field(default_factory=list)  # multi-hop FK joins, same tuple shape, applied in order after `join`
    filters: list = field(default_factory=list)  # [(col, op, value)]
    group_by: list = field(default_factory=list)
    aggs: list = field(default_factory=list)  # [(fn, col)] — col None for count(*)
    select: list = field(default_factory=list)  # projection when not aggregating
    distinct: bool = False
    having_min_count: int | None = None  # HAVING count(*) >= n (grouped specs only)
    group_mode: str = "plain"  # "plain" | "rollup" | "cube" (grouped specs only)

    def columns(self) -> dict[str, str]:
        cols = dict(SCHEMA[self.table])
        if self.join:
            cols.update(SCHEMA[self.join[0]])
        for other, _bk, _ok, _how in self.chain:
            cols.update(SCHEMA[other])
        return cols


def _col_type(spec: QuerySpec, col: str) -> str:
    return spec.columns()[col]


def _sql_literal(value, typ: str) -> str:
    if typ == "str":
        return "'" + str(value).replace("'", "''") + "'"
    if typ == "ts":
        return f"TIMESTAMP '{value}'"
    return repr(value)


def _spark_filter(col: str, op: str, value, typ: str):
    c = F.col(col)
    if op == "=":
        return c == F.lit(value)
    if op == "<>":
        return c != F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "in":
        return c.isin(list(value))
    if op == "like":
        return c.like(value)
    if op == "isnull":
        return c.isNull()
    if op == "notnull":
        return c.isNotNull()
    raise ValueError(f"unknown filter op {op!r}")


def _sql_filter(col: str, op: str, value, typ: str) -> str:
    if op == "in":
        return f"{col} IN ({', '.join(_sql_literal(v, typ) for v in value)})"
    if op == "like":
        return f"{col} LIKE {_sql_literal(value, 'str')}"
    if op == "isnull":
        return f"{col} IS NULL"
    if op == "notnull":
        return f"{col} IS NOT NULL"
    return f"{col} {op} {_sql_literal(value, typ)}"


def _agg_alias(i: int) -> str:
    return f"agg{i}"


def spec_to_df(spark: SparkSession, sf_dir: str, spec: QuerySpec) -> DataFrame:
    """Render the spec as a DataFrame plan. Filters apply after the join,
    matching the SQL renderer's WHERE (post-join semantics — on a LEFT
    join a right-side predicate eliminates null-extended rows on both
    engines identically); Catalyst pushes the pushable ones down anyway."""
    df = load(spark, sf_dir, spec.table)
    if spec.join:
        other_table, base_key, other_key, how = spec.join
        other = load(spark, sf_dir, other_table)
        df = df.join(other, on=F.col(base_key) == F.col(other_key), how=how)
    for other_table, base_key, other_key, how in spec.chain:
        other = load(spark, sf_dir, other_table)
        df = df.join(other, on=F.col(base_key) == F.col(other_key), how=how)
    for col, op, value in spec.filters:
        df = df.filter(_spark_filter(col, op, value, _col_type(spec, col)))
    if spec.aggs:
        exprs = []
        for i, (fn, col) in enumerate(spec.aggs):
            a = _agg_alias(i)
            if fn == "count":
                exprs.append(F.count(F.lit(1)).alias(a))
            elif fn == "count_distinct":
                exprs.append(F.countDistinct(col).alias(a))
            elif fn == "sum":
                e = F.sum(col)
                if _col_type(spec, col) == "double":
                    e = F.round(e, 2)
                exprs.append(e.alias(a))
            elif fn == "min":
                exprs.append(F.min(col).alias(a))
            elif fn == "max":
                exprs.append(F.max(col).alias(a))
            else:
                raise ValueError(f"unknown agg fn {fn!r}")
        if spec.group_mode == "rollup" and spec.group_by:
            grouped = df.rollup(*spec.group_by)
        elif spec.group_mode == "cube" and spec.group_by:
            grouped = df.cube(*spec.group_by)
        else:
            grouped = df.groupBy(*spec.group_by) if spec.group_by else df.groupBy()
        if spec.having_min_count is not None:
            df = (
                grouped.agg(*exprs, F.count(F.lit(1)).alias("_hc"))
                .filter(F.col("_hc") >= spec.having_min_count)
                .drop("_hc")
            )
        else:
            df = grouped.agg(*exprs)
    else:
        cols = spec.select or sorted(spec.columns())
        df = df.select(*cols)
        if spec.distinct:
            df = df.distinct()
    return df


def spec_to_sql(spec: QuerySpec) -> str:
    """Render the SAME spec as DuckDB-runnable ANSI SQL (tables are
    pre-registered views named after the parquet files)."""
    frm = spec.table
    if spec.join:
        other_table, base_key, other_key, how = spec.join
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        frm = f"{spec.table} {kw} {other_table} ON {base_key} = {other_key}"
    for other_table, base_key, other_key, how in spec.chain:
        kw = "JOIN" if how == "inner" else "LEFT JOIN"
        frm = f"{frm} {kw} {other_table} ON {base_key} = {other_key}"
    where = " AND ".join(
        _sql_filter(col, op, value, _col_type(spec, col)) for col, op, value in spec.filters
    )
    if spec.aggs:
        parts = list(spec.group_by)
        for i, (fn, col) in enumerate(spec.aggs):
            a = _agg_alias(i)
            if fn == "count":
                parts.append(f"COUNT(*) AS {a}")
            elif fn == "count_distinct":
                parts.append(f"COUNT(DISTINCT {col}) AS {a}")
            elif fn == "sum":
                if _col_type(spec, col) == "double":
                    parts.append(f"ROUND(SUM({col}), 2) AS {a}")
                else:
                    parts.append(f"CAST(SUM({col}) AS BIGINT) AS {a}")
            elif fn == "min":
                parts.append(f"MIN({col}) AS {a}")
            elif fn == "max":
                parts.append(f"MAX({col}) AS {a}")
        sql = f"SELECT {', '.join(parts)} FROM {frm}"
        if where:
            sql += f" WHERE {where}"
        if spec.group_by:
            keys = ", ".join(spec.group_by)
            if spec.group_mode == "rollup":
                sql += f" GROUP BY ROLLUP ({keys})"
            elif spec.group_mode == "cube":
                sql += f" GROUP BY CUBE ({keys})"
            else:
                sql += f" GROUP BY {keys}"
        if spec.having_min_count is not None:
            sql += f" HAVING COUNT(*) >= {spec.having_min_count}"
        if spec.group_mode in ("rollup", "cube") and spec.group_by:
            # Cross-engine edge the fuzz surfaced: over an EMPTY input,
            # DuckDB/Postgres emit the () grouping set's grand-total row
            # (SQL standard), while Spark — DataFrame rollup/cube AND
            # GROUP BY ROLLUP in Spark SQL — returns zero rows. The engine
            # exposes Spark's semantics, so the oracle side gates rollup
            # output on input non-emptiness to be an exact twin; pinned by
            # test_rollup_empty_input_divergence_is_canonicalized.
            guard = f"SELECT 1 FROM {frm}" + (f" WHERE {where}" if where else "")
            sql = f"SELECT * FROM ({sql}) WHERE EXISTS ({guard})"
        return sql
    cols = spec.select or sorted(spec.columns())
    head = "SELECT DISTINCT" if spec.distinct else "SELECT"
    sql = f"{head} {', '.join(cols)} FROM {frm}"
    if where:
        sql += f" WHERE {where}"
    return sql


# table -> single-column unique PK (lineitem's PK is composite, so it sits
# out of the window surface where a unique ORDER BY key is required)
PRIMARY_KEYS: dict[str, str] = {
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}

SET_OPS = ("union_all", "union", "except", "intersect")
WINDOW_FNS = (
    "row_number", "rank", "lag", "sum_over", "count_over", "max_over",
    # frame/offset/bucket shapes: running sum over an explicit
    # unbounded-preceding..current-row frame, lead, and ntile(4) — all
    # deterministic because the ORDER BY key is the table's unique PK
    "running_sum", "lead", "ntile4",
)


@dataclass
class SetOpSpec:
    """Two filtered projections of one table combined by a set operation —
    same select list on both legs, so the schemas line up by construction."""

    table: str
    select: list
    filters_a: list = field(default_factory=list)
    filters_b: list = field(default_factory=list)
    op: str = "union_all"


def setop_to_df(spark: SparkSession, sf_dir: str, spec: SetOpSpec) -> DataFrame:
    base = load(spark, sf_dir, spec.table)
    legs = []
    for filters in (spec.filters_a, spec.filters_b):
        leg = base
        for col, op, value in filters:
            leg = leg.filter(_spark_filter(col, op, value, SCHEMA[spec.table][col]))
        legs.append(leg.select(*spec.select))
    a, b = legs
    if spec.op == "union_all":
        return a.unionByName(b)
    if spec.op == "union":
        return a.unionByName(b).distinct()
    if spec.op == "except":
        # Spark subtract == SQL EXCEPT (both DISTINCT semantics)
        return a.subtract(b)
    if spec.op == "intersect":
        return a.intersect(b)
    raise ValueError(f"unknown set op {spec.op!r}")


def setop_to_sql(spec: SetOpSpec) -> str:
    kw = {
        "union_all": "UNION ALL",
        "union": "UNION",
        "except": "EXCEPT",
        "intersect": "INTERSECT",
    }[spec.op]
    legs = []
    for filters in (spec.filters_a, spec.filters_b):
        where = " AND ".join(
            _sql_filter(col, op, value, SCHEMA[spec.table][col]) for col, op, value in filters
        )
        sql = f"SELECT {', '.join(spec.select)} FROM {spec.table}"
        if where:
            sql += f" WHERE {where}"
        legs.append(sql)
    return f" {kw} ".join(legs)


@dataclass
class WindowSpec:
    """One window function over a single table, ordered by the table's
    unique PK so every function has exactly one valid answer."""

    table: str
    partition_col: str
    fn: str  # WINDOW_FNS
    value_col: str | None = None  # lag/sum_over/max_over operand
    filters: list = field(default_factory=list)
    select: list = field(default_factory=list)


def window_to_df(spark: SparkSession, sf_dir: str, spec: WindowSpec) -> DataFrame:
    from pyspark.sql import Window

    df = load(spark, sf_dir, spec.table)
    for col, op, value in spec.filters:
        df = df.filter(_spark_filter(col, op, value, SCHEMA[spec.table][col]))
    pk = PRIMARY_KEYS[spec.table]
    ordered = Window.partitionBy(spec.partition_col).orderBy(pk)
    unordered = Window.partitionBy(spec.partition_col)
    typ = SCHEMA[spec.table].get(spec.value_col)
    if spec.fn == "row_number":
        w = F.row_number().over(ordered)
    elif spec.fn == "rank":
        w = F.rank().over(ordered)
    elif spec.fn == "lag":
        w = F.lag(spec.value_col).over(ordered)
    elif spec.fn == "sum_over":
        w = F.sum(spec.value_col).over(unordered)
        if typ == "double":
            w = F.round(w, 2)
    elif spec.fn == "running_sum":
        frame = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        w = F.sum(spec.value_col).over(frame)
        if typ == "double":
            w = F.round(w, 2)
    elif spec.fn == "lead":
        w = F.lead(spec.value_col).over(ordered)
    elif spec.fn == "ntile4":
        w = F.ntile(4).over(ordered)
    elif spec.fn == "count_over":
        w = F.count(F.lit(1)).over(unordered)
    elif spec.fn == "max_over":
        w = F.max(spec.value_col).over(unordered)
    else:
        raise ValueError(f"unknown window fn {spec.fn!r}")
    cols = spec.select or [pk, spec.partition_col]
    return df.select(*cols, w.alias("w"))


def window_to_sql(spec: WindowSpec) -> str:
    pk = PRIMARY_KEYS[spec.table]
    over_ordered = f"OVER (PARTITION BY {spec.partition_col} ORDER BY {pk})"
    over_unordered = f"OVER (PARTITION BY {spec.partition_col})"
    typ = SCHEMA[spec.table].get(spec.value_col)
    if spec.fn == "row_number":
        w = f"ROW_NUMBER() {over_ordered}"
    elif spec.fn == "rank":
        w = f"RANK() {over_ordered}"
    elif spec.fn == "lag":
        w = f"LAG({spec.value_col}) {over_ordered}"
    elif spec.fn == "sum_over":
        inner = f"SUM({spec.value_col}) {over_unordered}"
        if typ == "double":
            w = f"ROUND({inner}, 2)"
        else:
            w = f"CAST({inner} AS BIGINT)"
    elif spec.fn == "count_over":
        w = f"COUNT(*) {over_unordered}"
    elif spec.fn == "running_sum":
        frame = f"OVER (PARTITION BY {spec.partition_col} ORDER BY {pk} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        inner = f"SUM({spec.value_col}) {frame}"
        w = f"ROUND({inner}, 2)" if typ == "double" else f"CAST({inner} AS BIGINT)"
    elif spec.fn == "lead":
        w = f"LEAD({spec.value_col}) {over_ordered}"
    elif spec.fn == "ntile4":
        w = f"NTILE(4) {over_ordered}"
    elif spec.fn == "max_over":
        w = f"MAX({spec.value_col}) {over_unordered}"
    else:
        raise ValueError(f"unknown window fn {spec.fn!r}")
    cols = spec.select or [pk, spec.partition_col]
    where = " AND ".join(
        _sql_filter(col, op, value, SCHEMA[spec.table][col]) for col, op, value in spec.filters
    )
    sql = f"SELECT {', '.join(cols)}, {w} AS w FROM {spec.table}"
    if where:
        sql += f" WHERE {where}"
    return sql


# ---- scalar-expression surface (§2.9 differential fuzz) ----
#
# A tiny typed expression AST with the same twin-renderer discipline as
# QuerySpec. Node = (tag, *children); every node is "int"- or "str"-typed
# and both renderers agree on semantics by construction:
#
# - int leaves cast to 64-bit on BOTH engines (Spark int*int wraps int32
#   silently with ANSI off; DuckDB promotes — casting first removes the
#   divergence), and multiplication is restricted to a small-literal
#   operand so depth-3 trees stay far from 2^63.
# - % and integer division: both engines are C-style (sign of dividend)
#   for %, and // is rendered as FLOOR(a / b) on both (int division is
#   double division + floor on each side), so negatives agree.
# - string ops restrict to the 1-based/ASCII-identical core: upper, lower,
#   trim, reverse, substr, ||, replace, lpad, length.
# - CASE and COALESCE(NULLIF(...)) close the conditional surface; NULLIF
#   is the only null source (TPC-H columns are non-null), so null
#   propagation through every op gets exercised from a known seed.

SCALAR_INT_OPS = ("add", "sub", "mul_lit", "mod", "idiv", "strlen", "case_int")
SCALAR_STR_OPS = (
    "upper", "lower", "trim", "reverse", "substr", "concat", "replace",
    "lpad", "int2str", "case_str", "nullif_coalesce",
)


@dataclass
class ScalarSpec:
    """A projection of scalar-expression trees over one table."""

    table: str
    exprs: list  # [(alias, expr_node)]
    filters: list = field(default_factory=list)


def expr_to_spark(node):
    tag = node[0]
    if tag == "col_int":
        return F.col(node[1]).cast("long")
    if tag == "col_str":
        return F.col(node[1])
    if tag == "ilit":
        return F.lit(node[1]).cast("long")
    if tag == "slit":
        return F.lit(node[1])
    if tag == "add":
        return expr_to_spark(node[1]) + expr_to_spark(node[2])
    if tag == "sub":
        return expr_to_spark(node[1]) - expr_to_spark(node[2])
    if tag == "mul_lit":
        return expr_to_spark(node[1]) * F.lit(node[2]).cast("long")
    if tag == "mod":
        return expr_to_spark(node[1]) % F.lit(node[2]).cast("long")
    if tag == "idiv":
        return F.floor(expr_to_spark(node[1]) / F.lit(node[2]).cast("long")).cast("long")
    if tag == "strlen":
        return F.length(expr_to_spark(node[1])).cast("long")
    if tag == "upper":
        return F.upper(expr_to_spark(node[1]))
    if tag == "lower":
        return F.lower(expr_to_spark(node[1]))
    if tag == "trim":
        return F.trim(expr_to_spark(node[1]))
    if tag == "reverse":
        return F.reverse(expr_to_spark(node[1]))
    if tag == "substr":
        return F.substring(expr_to_spark(node[1]), node[2], node[3])
    if tag == "concat":
        return F.concat(expr_to_spark(node[1]), expr_to_spark(node[2]))
    if tag == "replace":
        return F.replace(expr_to_spark(node[1]), F.lit(node[2]), F.lit(node[3]))
    if tag == "lpad":
        return F.lpad(expr_to_spark(node[1]), node[2], node[3])
    if tag == "int2str":
        return expr_to_spark(node[1]).cast("string")
    if tag in ("case_int", "case_str"):
        _, (ccol, cop, cval, ctyp), then_n, else_n = node
        cond = _spark_filter(ccol, cop, cval, ctyp)
        return F.when(cond, expr_to_spark(then_n)).otherwise(expr_to_spark(else_n))
    if tag == "nullif_coalesce":
        return F.coalesce(F.nullif(expr_to_spark(node[1]), F.lit(node[2])), expr_to_spark(node[3]))
    raise ValueError(f"unknown expr tag {tag!r}")


def expr_to_sql(node) -> str:
    tag = node[0]
    if tag == "col_int":
        return f"CAST({node[1]} AS BIGINT)"
    if tag == "col_str":
        return node[1]
    if tag == "ilit":
        return f"CAST({node[1]} AS BIGINT)"
    if tag == "slit":
        return _sql_literal(node[1], "str")
    if tag == "add":
        return f"({expr_to_sql(node[1])} + {expr_to_sql(node[2])})"
    if tag == "sub":
        return f"({expr_to_sql(node[1])} - {expr_to_sql(node[2])})"
    if tag == "mul_lit":
        return f"({expr_to_sql(node[1])} * CAST({node[2]} AS BIGINT))"
    if tag == "mod":
        return f"({expr_to_sql(node[1])} % CAST({node[2]} AS BIGINT))"
    if tag == "idiv":
        return f"CAST(FLOOR({expr_to_sql(node[1])} / CAST({node[2]} AS BIGINT)) AS BIGINT)"
    if tag == "strlen":
        return f"CAST(length({expr_to_sql(node[1])}) AS BIGINT)"
    if tag in ("upper", "lower", "trim", "reverse"):
        return f"{tag}({expr_to_sql(node[1])})"
    if tag == "substr":
        return f"substr({expr_to_sql(node[1])}, {node[2]}, {node[3]})"
    if tag == "concat":
        return f"({expr_to_sql(node[1])} || {expr_to_sql(node[2])})"
    if tag == "replace":
        return f"replace({expr_to_sql(node[1])}, {_sql_literal(node[2], 'str')}, {_sql_literal(node[3], 'str')})"
    if tag == "lpad":
        return f"lpad({expr_to_sql(node[1])}, {node[2]}, {_sql_literal(node[3], 'str')})"
    if tag == "int2str":
        return f"CAST({expr_to_sql(node[1])} AS VARCHAR)"
    if tag in ("case_int", "case_str"):
        _, (ccol, cop, cval, ctyp), then_n, else_n = node
        cond = _sql_filter(ccol, cop, cval, ctyp)
        return f"(CASE WHEN {cond} THEN {expr_to_sql(then_n)} ELSE {expr_to_sql(else_n)} END)"
    if tag == "nullif_coalesce":
        return (
            f"COALESCE(NULLIF({expr_to_sql(node[1])}, {_sql_literal(node[2], 'str')}), "
            f"{expr_to_sql(node[3])})"
        )
    raise ValueError(f"unknown expr tag {tag!r}")


def scalar_to_df(spark: SparkSession, sf_dir: str, spec: ScalarSpec) -> DataFrame:
    df = load(spark, sf_dir, spec.table)
    for col, op, value in spec.filters:
        df = df.filter(_spark_filter(col, op, value, SCHEMA[spec.table][col]))
    return df.select(*(expr_to_spark(e).alias(a) for a, e in spec.exprs))


def scalar_to_sql(spec: ScalarSpec) -> str:
    parts = ", ".join(f"{expr_to_sql(e)} AS {a}" for a, e in spec.exprs)
    sql = f"SELECT {parts} FROM {spec.table}"
    where = " AND ".join(
        _sql_filter(col, op, value, SCHEMA[spec.table][col]) for col, op, value in spec.filters
    )
    if where:
        sql += f" WHERE {where}"
    return sql


# ---- semi/anti membership surface (P6/P8 differential fuzz) ----

# both FK directions: (base, probe, base_key, probe_key) — child→parent
# (every lineitem's order exists) and parent→child (customers with/without
# qualifying orders), the direction where anti joins do real work.
MEMBERSHIP_EDGES: list[tuple[str, str, str, str]] = [
    (b, o, bk, ok) for b, fks in FOREIGN_KEYS.items() for o, bk, ok in fks
] + [(o, b, ok, bk) for b, fks in FOREIGN_KEYS.items() for o, bk, ok in fks]


@dataclass
class MembershipSpec:
    """EXISTS / NOT EXISTS membership of base rows in a filtered probe
    table — rendered as a leftsemi/leftanti join in Spark (the engine's
    P6/P8 strategy, operators/joins.py) and a correlated [NOT] EXISTS in
    SQL."""

    table: str
    probe: str
    base_key: str
    probe_key: str
    anti: bool = False
    base_filters: list = field(default_factory=list)
    probe_filters: list = field(default_factory=list)
    select: list = field(default_factory=list)


def membership_to_df(spark: SparkSession, sf_dir: str, spec: MembershipSpec) -> DataFrame:
    base = load(spark, sf_dir, spec.table)
    for col, op, value in spec.base_filters:
        base = base.filter(_spark_filter(col, op, value, SCHEMA[spec.table][col]))
    probe = load(spark, sf_dir, spec.probe)
    for col, op, value in spec.probe_filters:
        probe = probe.filter(_spark_filter(col, op, value, SCHEMA[spec.probe][col]))
    how = "leftanti" if spec.anti else "leftsemi"
    joined = base.join(
        probe.select(spec.probe_key),
        on=F.col(spec.base_key) == F.col(spec.probe_key),
        how=how,
    )
    return joined.select(*(spec.select or sorted(SCHEMA[spec.table])))


def membership_to_sql(spec: MembershipSpec) -> str:
    probe_where = [f"{spec.probe_key} = {spec.base_key}"] + [
        _sql_filter(col, op, value, SCHEMA[spec.probe][col])
        for col, op, value in spec.probe_filters
    ]
    exists = f"EXISTS (SELECT 1 FROM {spec.probe} WHERE {' AND '.join(probe_where)})"
    if spec.anti:
        exists = "NOT " + exists
    where = [
        _sql_filter(col, op, value, SCHEMA[spec.table][col])
        for col, op, value in spec.base_filters
    ] + [exists]
    cols = spec.select or sorted(SCHEMA[spec.table])
    return f"SELECT {', '.join(cols)} FROM {spec.table} WHERE {' AND '.join(where)}"
