"""Compile a parsed :class:`Query` into a lazy Spark DataFrame plan.

Where the reference hand-schedules physical execution (left-deep SQLCursor
chain, weight-ranked join algorithm selection, per-frame task distribution —
``sql/SQLJoin.java:57-123``, ``sql/SQLJoinDispatcher.java:79-167``), we emit a
declarative DataFrame plan and let Catalyst/AQE pick join order and physical
strategy.  The one reference heuristic we keep on purpose: equi-join
conditions in a top-level AND tree become join ``on`` expressions; an OR at
the root disables join-condition extraction (everything becomes a post-join
filter), mirroring the reference's "OR disables optimized joins" rule
(``sql/NestedCondition.java:604,613``) — except Catalyst can usually still
rescue the plan.
"""

from __future__ import annotations

import functools

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import InvalidColumnDescription, InvalidCondition
from .ast import (
    ColumnRef,
    ConditionGroup,
    HavingCondition,
    JoinCondition,
    Query,
    SelectItem,
    SetQuery,
    SubqueryCondition,
    ValueCondition,
)

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_DATELIKE = (T.TimestampType, T.TimestampNTZType, T.DateType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


def _col(ref: ColumnRef) -> Column:
    return F.col(f"{ref.alias}.{ref.name}")


def _value_expr(vc: ValueCondition) -> Column:
    c = _col(vc.ref)
    if vc.op == "ISNULL":
        # IS [NOT] NULL extension — negation handled here directly (the
        # generic `~` path below would give three-valued-logic surprises)
        return c.isNotNull() if vc.negated else c.isNull()
    if vc.op == "BETWEEN":
        e = c.between(F.lit(vc.values[0]), F.lit(vc.values[1]))
        return ~e if vc.negated else e
    if vc.op == "IN":
        e = c.isin(*vc.values)
    elif vc.op == "LIKE":
        # substring-contains semantics, NOT SQL % patterns
        # (reference sql/NestedCondition.java:173-188: indexOf >= 0)
        e = c.contains(vc.values[0])
    elif vc.op == "=":
        e = c == F.lit(vc.values[0])
    elif vc.op == "<>":
        e = c != F.lit(vc.values[0])
    elif vc.op == "<":
        e = c < F.lit(vc.values[0])
    elif vc.op == ">":
        e = c > F.lit(vc.values[0])
    elif vc.op == "<=":
        e = c <= F.lit(vc.values[0])
    elif vc.op == ">=":
        e = c >= F.lit(vc.values[0])
    else:  # pragma: no cover
        raise InvalidCondition(vc.op)
    return ~e if vc.negated else e


def _join_expr(jc: JoinCondition) -> Column:
    l, r = _col(jc.left), _col(jc.right)
    return {
        "=": l == r, "<>": l != r, "<": l < r,
        ">": l > r, "<=": l <= r, ">=": l >= r,
    }[jc.op]


def _cond_expr(cond) -> Column:
    if isinstance(cond, ValueCondition):
        return _value_expr(cond)
    if isinstance(cond, JoinCondition):
        return _join_expr(cond)
    if isinstance(cond, ConditionGroup):
        exprs = [_cond_expr(ch) for ch in cond.children]
        op = (lambda a, b: a & b) if cond.connective in ("AND", None) else (lambda a, b: a | b)
        return functools.reduce(op, exprs)
    if isinstance(cond, SubqueryCondition):
        raise InvalidCondition(
            "IN [SELECT ...] is only supported as a top-level AND conjunct"
        )
    raise InvalidCondition(str(cond))


def _split_where(where):
    """Top-level AND conjuncts → (equi/theta join conds, subqueries, filters).

    Mirrors the reference's predicate-to-stage coordination
    (sql/NestedCondition.java:711-743) at the logical level; Catalyst does
    the physical placement.
    """
    joins: list[JoinCondition] = []
    subqueries: list[SubqueryCondition] = []
    filters: list = []
    if where is None:
        return joins, subqueries, filters
    conjuncts = (
        where.children
        if isinstance(where, ConditionGroup) and where.connective in ("AND", None)
        else [where]
    )
    for c in conjuncts:
        if isinstance(c, JoinCondition):
            joins.append(c)
        elif isinstance(c, SubqueryCondition):
            subqueries.append(c)
        else:
            filters.append(c)
    return joins, subqueries, filters


def _build_join(dfs: dict[str, DataFrame], order: list[str], joins: list[JoinCondition]) -> DataFrame:
    """Left-deep fold over the join graph: each step attaches every join
    condition whose aliases are now both available.  Catalyst re-orders as it
    sees fit; AQE fixes sizes at runtime."""
    remaining = list(joins)
    done = {order[0]}
    out = dfs[order[0]]
    pending = order[1:]
    while pending:
        # pick the next table connected to the joined set (reference joins
        # largest-first; we keep FROM order and let Catalyst/CBO reorder)
        pick = None
        for alias in pending:
            if any(
                (jc.left.alias == alias and jc.right.alias in done)
                or (jc.right.alias == alias and jc.left.alias in done)
                for jc in remaining
            ):
                pick = alias
                break
        if pick is None:
            pick = pending[0]  # disconnected → cross join
        conds = [
            jc for jc in remaining
            if {jc.left.alias, jc.right.alias} <= done | {pick}
        ]
        remaining = [jc for jc in remaining if jc not in conds]
        if conds:
            on = functools.reduce(lambda a, b: a & b, (_join_expr(jc) for jc in conds))
            out = out.join(dfs[pick], on, "inner")
        else:
            out = out.crossJoin(dfs[pick])
        done.add(pick)
        pending.remove(pick)
    for jc in remaining:  # both sides were already joined (cycle) → filter
        out = out.filter(_join_expr(jc))
    return out


_STRING_FN = {
    "UPPER": F.upper,
    "LOWER": F.lower,
    "LENGTH": F.length,
    "TRIM": F.trim,
}
_NUMERIC_FN = {
    "ABS": F.abs,
    "ROUND": lambda c: F.round(c, 0),
    "FLOOR": F.floor,
    "CEIL": F.ceil,
}
_DATEPART_FN = {
    "YEAR": F.year,
    "MONTH": F.month,
    "DAY": F.dayofmonth,
}


def _scalar_fn(name: str, c: Column, dtype: T.DataType, engine) -> Column:
    """Apply one scalar function to an already-resolved column. Shared by
    the plain-select path and the grouped path (scalar over a GROUP BY
    column runs post-aggregate — one evaluation per group, not per row).
    All JVM-side built-ins: the whole select list stays inside
    whole-stage codegen."""
    if name == "TO_NUMBER":
        return c.cast("double")
    if name == "TO_CHAR":
        if isinstance(dtype, _DATELIKE):
            return F.date_format(c, engine.date_format)
        return c.cast("string")
    if name == "TO_DATE":
        return F.to_timestamp(c, engine.date_format)
    if name in _STRING_FN:
        if not isinstance(dtype, T.StringType):
            raise InvalidColumnDescription(
                f"{name} requires a string column, got {dtype.simpleString()}"
            )
        return _STRING_FN[name](c)
    if name in _NUMERIC_FN:
        if not isinstance(dtype, T.NumericType):
            raise InvalidColumnDescription(
                f"{name} requires a numeric column, got {dtype.simpleString()}"
            )
        return _NUMERIC_FN[name](c)
    if name in _DATEPART_FN:
        if not isinstance(dtype, _DATELIKE):
            raise InvalidColumnDescription(
                f"{name} requires a date/timestamp column, got {dtype.simpleString()}"
            )
        return _DATEPART_FN[name](c)
    return c


def _scalar_expr(item: SelectItem, dtype: T.DataType, engine) -> Column:
    return _scalar_fn(item.scalar, _col(item.ref), dtype, engine)


def _agg_expr(item: SelectItem, dtype: T.DataType, engine) -> Column:
    c = _col(item.ref)
    strict = engine.strict_compat
    f = item.func
    if f == "COUNT":
        # COUNT(DISTINCT col) extension — plans as Spark's two-phase
        # distinct aggregate (partial distinct per partition, then final),
        # never a driver-side distinct
        return F.countDistinct(c) if item.distinct else F.count(c)
    if f == "SUM":
        if strict and isinstance(dtype, _FRACTIONAL):
            # reference SUM silently contributes 0 for float/double inputs
            # (sql/SQLGroupFunction.java:95-103)
            return F.lit(0).cast("long")
        if strict:
            return F.sum(c).cast("long")
        return F.sum(c)
    if f == "AVG" or (f == "LAST" and strict):
        # strict LAST == AVG: F_LAST/F_AVG constant collision in the
        # reference (sql/SQLGroupFunction.java:51-52)
        if strict:
            # integer division sum/cnt on longs (sql/SQLGroupFunction.java:71,81)
            return (F.sum(c).cast("double") / F.count(c)).cast("long")
        return F.avg(c)
    if f == "MIN":
        return F.min(c)
    if f == "MAX":
        return F.max(c)
    if f == "LAST":
        return F.last(c)
    if f in engine.group_functions:
        fn, rtype = engine.group_functions[f]

        # grouped-agg pandas UDF (Series → scalar): Spark runs it per group
        # with Arrow transfer — D14 custom group functions, real here. The
        # Series→float annotation is what makes pandas_udf infer the
        # GROUPED_AGG eval type (an unannotated callable plans as a scalar
        # UDF and Catalyst rejects it outside the GROUP BY).
        def _wrapped(v: pd.Series) -> float:
            return fn(v)

        udf = F.pandas_udf(_wrapped, rtype)
        return udf(c)
    raise InvalidCondition(f"unknown function {f}")  # pragma: no cover


def _dtype_of(dfs: dict[str, DataFrame], ref: ColumnRef) -> T.DataType:
    for f in dfs[ref.alias].schema.fields:
        if f.name == ref.name:
            return f.dataType
    raise KeyError(str(ref))  # pragma: no cover — parser validated


def compile_query(engine, q) -> DataFrame:
    """Batch compilation. Streaming queries reuse this via
    :mod:`interference_spark.streaming` with streaming sources."""
    if isinstance(q, SetQuery):
        return _compile_setop(engine, q)
    dfs = {t.alias: engine.table(t.name).alias(t.alias) for t in q.tables}
    return compile_on(engine, q, dfs)


def _compile_setop(engine, sq: SetQuery) -> DataFrame:
    """ANSI set semantics over positionally-matched operands (extension;
    SURVEY §2.7). Spark's union/intersect/subtract are all positional with
    result names from the left side — exactly the ANSI rule. Each dedup
    variant is one hash-aggregate shuffle; Catalyst plans INTERSECT/EXCEPT
    as left-semi/anti joins, which broadcast when a side is small."""
    out = compile_query(engine, sq.parts[0])
    for op, part in zip(sq.ops, sq.parts[1:]):
        df = compile_query(engine, part)
        if len(df.columns) != len(out.columns):
            raise InvalidColumnDescription(
                f"set operation column count mismatch: "
                f"{len(out.columns)} vs {len(df.columns)}"
            )
        if op == "UNION ALL":
            out = out.union(df)
        elif op == "UNION":
            out = out.union(df).distinct()
        elif op == "INTERSECT":
            out = out.intersect(df)
        else:  # EXCEPT
            out = out.subtract(df)
    return out


def compile_on(engine, q: Query, dfs: dict[str, DataFrame]) -> DataFrame:
    """Compile against caller-supplied source DataFrames (batch or
    streaming)."""
    joins, subqueries, filters = _split_where(q.where)
    if q.left_joins:
        # EXTENSION (SURVEY §2.3): FROM base LEFT|RIGHT|FULL JOIN t ON ...
        # chain. The parser guarantees a single base table, so the inner
        # fold is just the base scan; WHERE stays post-join (ANSI),
        # including any col = col conjuncts — pushing those into the join
        # would silently turn the outer join back into an inner one.
        out = dfs[q.tables[0].alias]
        for spec in q.left_joins:
            on = functools.reduce(
                lambda a, b: a & b, (_cond_expr(c) for c in spec.on)
            )
            out = out.join(dfs[spec.table.alias], on, spec.how)
        for jc in joins:
            out = out.filter(_join_expr(jc))
    else:
        out = _build_join(dfs, [t.alias for t in q.tables], joins)
    if filters:
        out = out.filter(functools.reduce(lambda a, b: a & b, map(_cond_expr, filters)))
    for sq in subqueries:
        sub = compile_query(engine, sq.query)
        sub_col = sub.columns[0]
        how = "left_anti" if sq.negated else "left_semi"
        out = out.join(sub, _col(sq.ref) == sub[sub_col], how)

    if q.window_by is not None:
        return _compile_window_by(q, out)

    agg_items = [i for i in q.items if i.is_agg]
    if agg_items:
        # Catalyst cannot mix grouped-agg pandas UDFs (custom D14 group
        # functions) with JVM aggregates in one Aggregate — when both are
        # present, the custom ones aggregate in a SECOND groupBy over the
        # same keys and join back (both sides key-collapsed, tiny join)
        pandas_items = [i for i in agg_items if i.func in engine.group_functions]
        jvm_items = [i for i in agg_items if i.func not in engine.group_functions]
        extra, hfilter = ([], None)
        if q.having is not None:
            extra, hfilter = _having_exprs(q, dfs, engine)
        split = bool(pandas_items) and bool(jvm_items or extra)
        aggs = [
            _agg_expr(i, _dtype_of(dfs, i.ref), engine).alias(i.out_name)
            for i in (jvm_items if split else agg_items)
        ]
        split_aggs = (
            [
                _agg_expr(i, _dtype_of(dfs, i.ref), engine).alias(i.out_name)
                for i in pandas_items
            ]
            if split
            else []
        )
        if q.group_by:
            # scalar group keys (GROUP BY year(e.ts)) are computed AS the
            # grouping expression, aliased to the matching select item's
            # output name — derived keys cost no pre-projection pass
            gset = {
                (getattr(g, "scalar", None), g.alias, g.name) for g in q.group_by
            }
            out_names = {
                (i.scalar, i.ref.alias, i.ref.name): i.out_name
                for i in q.items
                if not i.is_agg
            }
            # plain keys get UNIQUE internal aliases (__g0, __g1, …): two
            # tables can both carry a column named `key`, and grouping on
            # both would otherwise leave two output columns named `key` —
            # every later by-name reference then raises AMBIGUOUS_REFERENCE
            gcols = []
            gkey_name: dict[tuple, str] = {}
            for gi, g in enumerate(q.group_by):
                sc = getattr(g, "scalar", None)
                if sc:
                    name = out_names[(sc, g.alias, g.name)]
                    gcols.append(
                        _scalar_fn(
                            sc, _col(g.ref), _dtype_of(dfs, g.ref), engine
                        ).alias(name)
                    )
                else:
                    internal = f"__g{gi}"
                    gkey_name[(g.alias, g.name)] = internal
                    gcols.append(_col(g).alias(internal))
            grouped_src = out
            out = out.groupBy(*gcols).agg(*aggs, *extra)
            if split_aggs:
                keys = [
                    out_names[(getattr(g, "scalar", None), g.alias, g.name)]
                    if getattr(g, "scalar", None)
                    else gkey_name[(g.alias, g.name)]
                    for g in q.group_by
                ]
                other = grouped_src.groupBy(*gcols).agg(*split_aggs)
                # null-SAFE key equality: both sides emit a NULL-key group
                # row; a plain equi-join would drop it (NULL != NULL) while
                # the unsplit builtin path keeps it
                cond = functools.reduce(
                    lambda a, b: a & b,
                    [out[k].eqNullSafe(other[k]) for k in keys],
                )
                out = out.join(other, cond).drop(*[other[k] for k in keys])
            if hfilter is not None:
                # post-aggregate filter: runs AFTER partial+final agg, so
                # only one group row per key is ever tested (never raw rows)
                out = out.filter(hfilter)
            # project to select-list order / names (drops __h* helper aggs)
            sel = []
            for i in q.items:
                if i.is_agg:
                    sel.append(F.col(i.out_name))
                elif i.scalar and (i.scalar, i.ref.alias, i.ref.name) in gset:
                    # already computed as the grouping expression
                    sel.append(F.col(i.out_name))
                elif i.scalar:
                    # scalar over a PLAIN group key: apply post-aggregate
                    # (one evaluation per group, not per row)
                    sel.append(
                        _scalar_fn(
                            i.scalar,
                            F.col(gkey_name[(i.ref.alias, i.ref.name)]),
                            _dtype_of(dfs, i.ref),
                            engine,
                        ).alias(i.out_name)
                    )
                else:
                    sel.append(
                        F.col(gkey_name[(i.ref.alias, i.ref.name)]).alias(i.out_name)
                    )
            out = out.select(*sel)
        else:
            grouped_src = out
            out = out.agg(*aggs, *extra)
            if split_aggs:
                out = out.crossJoin(grouped_src.agg(*split_aggs))
            if hfilter is not None:
                out = out.filter(hfilter)
            if extra or split_aggs:
                out = out.select(*[F.col(i.out_name) for i in agg_items])
    else:
        out = out.select(*[
            (
                _scalar_expr(i, _dtype_of(dfs, i.ref), engine)
                if i.scalar
                else _col(i.ref)
            ).alias(i.out_name)
            for i in q.items
        ])

    if q.distinct:
        # reference parses DISTINCT but never executes it
        # (sql/SQLSelect.java:169-171 — documented divergence: we implement it)
        out = out.distinct()

    if q.order_by:
        # ascending only: the dialect has no ASC/DESC token
        names = []
        for o in q.order_by:
            match = next(
                i.out_name for i in q.items
                if not i.is_agg and i.ref.alias == o.alias and i.ref.name == o.name
            )
            names.append(match)
        out = out.orderBy(*[F.asc(n) for n in names])
    if q.limit is not None:
        # with ORDER BY Catalyst fuses this into TakeOrderedAndProject —
        # a per-partition top-k + driver merge, never a global sort
        out = out.limit(q.limit)
    return out


def _having_exprs(q: Query, dfs, engine):
    """HAVING support (extension; ast.HavingCondition): each leaf maps to a
    select-list aggregate when one matches (same func + column), else to a
    hidden ``__h<k>`` aggregate computed in the same single agg pass —
    HAVING never adds a second shuffle. Returns (extra_agg_cols, filter)."""
    leaves: list[HavingCondition] = []

    def walk(c):
        if isinstance(c, ConditionGroup):
            for ch in c.children:
                walk(ch)
        else:
            leaves.append(c)

    walk(q.having)
    names: dict[int, str] = {}
    extra = []
    for k, leaf in enumerate(leaves):
        match = next(
            (
                i for i in q.items
                if i.is_agg and i.func == leaf.func and not i.distinct
                and i.ref.alias == leaf.ref.alias and i.ref.name == leaf.ref.name
            ),
            None,
        )
        if match is not None:
            names[id(leaf)] = match.out_name
        else:
            name = f"__h{k}"
            item = SelectItem(ref=leaf.ref, func=leaf.func, out_name=name)
            extra.append(_agg_expr(item, _dtype_of(dfs, leaf.ref), engine).alias(name))
            names[id(leaf)] = name

    def expr(c) -> Column:
        if isinstance(c, ConditionGroup):
            parts = [expr(ch) for ch in c.children]
            op = (lambda a, b: a & b) if c.connective != "OR" else (lambda a, b: a | b)
            return functools.reduce(op, parts)
        col = F.col(names[id(c)])
        v = F.lit(c.values[0])
        return {
            "=": col == v, "<>": col != v, "<": col < v,
            ">": col > v, "<=": col <= v, ">=": col >= v,
        }[c.op]

    return extra, expr(q.having)


def _compile_window_by(q: Query, joined: DataFrame) -> DataFrame:
    """Batch semantics of WINDOW BY col INTERVAL = n (count-based sliding
    window, reference sql/SQLGroupContainer.java:120-158): order rows by the
    window column; from the n-th row on, emit each select-list aggregate over
    the last n rows.

    Executed by :mod:`interference_spark.plans.window_dist`: range-split by
    the window column, per-split parallel frames with n-1 boundary rows
    shipped to the next split — no single-task global window at scale (the
    reference runs these single-threaded on the master; we don't). The
    streaming analogue (streaming/windows.py) keeps a bounded ring buffer
    in state.
    """
    from ..plans.window_dist import sliding_count_window

    n = q.window_by.interval
    items = []
    proj = [_col(q.window_by.ref).alias("__w")]
    for k, i in enumerate(q.items):
        if not i.is_agg:
            raise InvalidCondition("WINDOW BY select list must be group functions")
        if i.distinct:
            raise InvalidCondition("DISTINCT aggregates are not valid in WINDOW BY")
        proj.append(_col(i.ref).alias(f"__a{k}"))
        items.append((i.func, f"__a{k}", i.out_name))
    return sliding_count_window(joined.select(*proj), "__w", items, n)
