"""Dialect parser: SQL text → :class:`~interference_spark.dialect.ast.Query`.

Language surface (reference ``sql/SQLSelect.java:154-401``):

    SELECT [STREAM] [DISTINCT] items FROM tbls [WHERE cond]
        [GROUP BY cols] [ORDER BY cols] [WINDOW BY col INTERVAL = n]
    PROCESS [STREAM] tbl WITHIN ProcessorName [WHERE cond]

* keywords case-insensitive, identifiers case-sensitive (manual: "All class
  and field names are case sensitive");
* select item may carry a space-separated output alias (``d.deptName dname``
  — reference ``sql/CList.java:71-78``); we additionally accept ``AS``;
* ``*`` allowed only for a single-table query (``sql/CList.java:59-67``);
* conditions: ``= <> < > <= >=``, ``[NOT] IN [v1, v2, …]`` (bracket lists —
  ``sql/ValueCondition.java:92-141``), ``[NOT] LIKE 'str'`` with
  substring-contains semantics (``sql/NestedCondition.java:173-188``),
  AND/OR nesting with one connective kind per parenthesis level
  (``sql/NestedCondition.java:366-438``);
* ``IN [SELECT …]`` subquery: a dead stub in the reference
  (``sql/ValueCondition.java:94-95``) — implemented for real here;
* ORDER BY is ascending-only (no ASC/DESC token exists in the reference);
* WINDOW BY is mutually exclusive with GROUP/ORDER BY
  (``sql/SQLSelect.java:227-251``).
"""

from __future__ import annotations

import re
from datetime import datetime

from pyspark.sql import types as T

from ..errors import (
    AmbiguousColumnName,
    InvalidColumnDescription,
    InvalidCondition,
    InvalidConditionValue,
    InvalidGroupByPart,
    InvalidGroupColumnSet,
    InvalidOrderByPart,
    InvalidSQLStatement,
    InvalidWindowByPart,
    MissingFromClause,
    MissingRightParenthesis,
    MissingTablesDescription,
    MissingWithinClause,
    TooManyNestedConditions,
    UnexpectedEndOfStatement,
)
from .ast import (
    FUNCS,
    SCALAR_FUNCS,
    ColumnRef,
    ConditionGroup,
    GroupExpr,
    HavingCondition,
    JoinCondition,
    LeftJoinSpec,
    Query,
    SelectItem,
    SetQuery,
    SubqueryCondition,
    TableRef,
    ValueCondition,
    WindowBy,
)

MAX_NESTING = 64  # reference: TooManyNestedConditions

# EXTENSION: LEFT/RIGHT/FULL [OUTER] JOIN in FROM (SURVEY §2.3 —
# reference is inner-comma-join only)
_LEFT_JOIN_RE = re.compile(r"\b(LEFT|RIGHT|FULL)\s+(?:OUTER\s+)?JOIN\b", re.I)
_ON_RE = re.compile(r"\bON\b", re.I)

# scan order is irrelevant; _CLAUSE_ORDER defines valid statement order:
# PROCESS tbl WITHIN p WHERE …; SELECT … FROM … WHERE … GROUP/ORDER/WINDOW BY
# (HAVING and LIMIT are extensions — the reference has neither: HAVING is a
# dead constant, LIMIT has no token at all; SURVEY §2.4/§2.6)
_CLAUSES = ["FROM", "WITHIN", "WHERE", "GROUP BY", "HAVING",
            "ORDER BY", "WINDOW BY", "LIMIT"]
_CLAUSE_ORDER = {c: i for i, c in enumerate(_CLAUSES)}

# set-operation keywords (extension — SURVEY §2.7: the reference has none);
# scanned at the top level of the whole statement, longest first
_SET_OPS = ["UNION ALL", "UNION", "INTERSECT", "EXCEPT"]

_NUM_RE = re.compile(r"^[+-]?\d+$")
_DEC_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def _java_to_strptime(fmt: str) -> str:
    """Translate the reference's Java SimpleDateFormat `dateformat` config
    (config/properties) into a strptime pattern for literal parsing."""
    out = fmt
    for j, p in (
        ("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("dd", "%d"),
        ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
    ):
        out = out.replace(j, p)
    return out


class SchemaResolver:
    """What the parser needs from the catalog: name → {col: DataType}."""

    def __init__(self, engine) -> None:
        self._engine = engine

    def columns(self, table_name: str) -> dict[str, T.DataType]:
        td = self._engine.catalog.get(table_name)
        schema = td.schema
        if schema is None:
            schema = self._engine.read_table(td).schema
            td.schema = schema  # cache
        return {f.name: f.dataType for f in schema.fields}


def _scan_clauses(sql: str) -> list[tuple[str, int, int]]:
    """Find top-level clause keywords outside quotes/brackets/parens.
    Returns [(clause, start_of_kw, end_of_kw)] in text order."""
    hits = []
    depth_p = depth_b = 0
    q: str | None = None
    i, n = 0, len(sql)
    up = sql.upper()
    while i < n:
        ch = sql[i]
        if q:
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth_p += 1
        elif ch == ")":
            depth_p -= 1
        elif ch == "[":
            depth_b += 1
        elif ch == "]":
            depth_b -= 1
        elif depth_p == 0 and depth_b == 0:
            for kw in _CLAUSES:
                k = kw.replace(" ", r"\s+")
                m = re.match(rf"{k}(?![A-Za-z0-9_])", up[i:])
                if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in "._")):
                    hits.append((kw, i, i + m.end()))
                    i += m.end()
                    break
            else:
                i += 1
                continue
            continue
        i += 1
    return hits


def _scan_setops(sql: str) -> list[tuple[str, int, int]]:
    """Find top-level set-operation keywords outside quotes/brackets/parens
    (same scan discipline as :func:`_scan_clauses`)."""
    hits = []
    depth_p = depth_b = 0
    q: str | None = None
    i, n = 0, len(sql)
    up = sql.upper()
    while i < n:
        ch = sql[i]
        if q:
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth_p += 1
        elif ch == ")":
            depth_p -= 1
        elif ch == "[":
            depth_b += 1
        elif ch == "]":
            depth_b -= 1
        elif depth_p == 0 and depth_b == 0:
            for kw in _SET_OPS:
                k = kw.replace(" ", r"\s+")
                m = re.match(rf"{k}(?![A-Za-z0-9_])", up[i:])
                if m and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] in "._")):
                    hits.append((kw, i, i + m.end()))
                    i += m.end()
                    break
            else:
                i += 1
                continue
            continue
        i += 1
    return hits


def _scan_top_matches(s: str, regex: re.Pattern) -> list[re.Match]:
    """Match ``regex`` at top level only — outside quotes, brackets and
    parens (same scan discipline as :func:`_scan_clauses` /
    :func:`_scan_setops`).  Used for join-keyword detection so a string
    literal containing e.g. ``'left join'`` or ``'on'`` inside an ON
    clause can never split the FROM span mid-literal."""
    hits: list[re.Match] = []
    depth_p = depth_b = 0
    q: str | None = None
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if q:
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth_p += 1
        elif ch == ")":
            depth_p -= 1
        elif ch == "[":
            depth_b += 1
        elif ch == "]":
            depth_b -= 1
        elif depth_p == 0 and depth_b == 0:
            m = regex.match(s, i)
            if m and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] in "._")):
                hits.append(m)
                i = m.end()
                continue
        i += 1
    return hits


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on `sep` outside quotes/brackets/parens."""
    parts, buf = [], []
    depth_p = depth_b = 0
    q: str | None = None
    for ch in s:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth_p += 1
        elif ch == ")":
            depth_p -= 1
        elif ch == "[":
            depth_b += 1
        elif ch == "]":
            depth_b -= 1
        elif ch == sep and depth_p == 0 and depth_b == 0:
            parts.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    parts.append("".join(buf))
    return parts


class Parser:
    def __init__(self, engine) -> None:
        self.engine = engine
        self.resolver = SchemaResolver(engine)
        self._date_fmt = _java_to_strptime(engine.date_format)

    # ------------------------------------------------------------------ API
    def parse(self, sql: str) -> Query | SetQuery:
        sql = sql.strip().rstrip(";").strip()
        if not sql:
            raise UnexpectedEndOfStatement("empty statement")
        up = sql.upper()
        if up.startswith("SELECT"):
            setops = _scan_setops(sql)
            if setops:
                return self._parse_set_chain(sql, setops)
            return self._parse_select(sql, kind="SELECT")
        if up.startswith("PROCESS"):
            return self._parse_select(sql, kind="PROCESS")
        raise InvalidSQLStatement(sql[:80])

    def _parse_set_chain(self, sql: str, hits: list[tuple[str, int, int]]) -> SetQuery:
        """UNION [ALL] / INTERSECT / EXCEPT over SELECT bodies (extension;
        SURVEY §2.7). Operands are plain batch SELECTs — STREAM, ORDER BY,
        WINDOW BY and LIMIT are rejected inside a set chain (order the
        combined result downstream instead). ANSI precedence: INTERSECT
        binds tighter than UNION/EXCEPT; same-level ops associate left."""
        bounds = [(None, 0, 0)] + hits + [(None, len(sql), len(sql))]
        segments, ops = [], []
        for idx in range(len(bounds) - 1):
            seg = sql[bounds[idx][2]: bounds[idx + 1][1]].strip()
            if not seg or not seg.upper().startswith("SELECT"):
                raise InvalidSQLStatement(
                    f"set operation operand must be a SELECT: {seg[:40]!r}"
                )
            segments.append(seg)
            if idx < len(hits):
                ops.append(hits[idx][0])
        parts = []
        for seg in segments:
            q = self._parse_select(seg, kind="SELECT")
            if q.stream:
                raise InvalidSQLStatement("STREAM not allowed in set operations")
            if q.order_by or q.window_by is not None or q.limit is not None:
                raise InvalidSQLStatement(
                    "ORDER BY / WINDOW BY / LIMIT not allowed inside a set "
                    "operation operand"
                )
            parts.append(q)
        # INTERSECT first (tighter binding), pairwise left-assoc collapse;
        # what remains is a UNION/EXCEPT chain (also left-assoc, in compiler)
        i = 0
        while i < len(ops):
            if ops[i] == "INTERSECT":
                parts[i] = SetQuery(
                    parts=[parts[i], parts.pop(i + 1)], ops=["INTERSECT"]
                )
                ops.pop(i)
            else:
                i += 1
        if not ops:
            return parts[0]
        return SetQuery(parts=parts, ops=ops)

    # ------------------------------------------------------------- clauses
    def _parse_select(self, sql: str, kind: str) -> Query:
        q = Query(kind=kind)
        body = sql[len(kind):]
        m = re.match(r"\s*STREAM(?![A-Za-z0-9_])", body, re.I)
        if m:
            q.stream = True
            body = body[m.end():]
        if kind == "SELECT":
            m = re.match(r"\s*DISTINCT(?![A-Za-z0-9_])", body, re.I)
            if m:
                q.distinct = True
                body = body[m.end():]

        hits = _scan_clauses(body)
        # clause-order validation (reference sql/SQLSelect.java:227-251)
        seen: list[str] = []
        for kw, _, _ in hits:
            if seen and _CLAUSE_ORDER[kw] <= _CLAUSE_ORDER[seen[-1]]:
                raise InvalidSQLStatement(f"clause {kw} out of order")
            if kw in seen:
                raise InvalidSQLStatement(f"duplicate clause {kw}")
            seen.append(kw)
        kw_set = set(seen)
        if "WINDOW BY" in kw_set and ({"GROUP BY", "ORDER BY", "HAVING"} & kw_set):
            raise InvalidWindowByPart("WINDOW BY is mutually exclusive with GROUP/ORDER BY")
        if kind == "SELECT" and "FROM" not in kw_set:
            raise MissingFromClause(sql[:80])
        if kind == "PROCESS" and "WITHIN" not in kw_set:
            raise MissingWithinClause(sql[:80])
        if kind == "SELECT" and "WITHIN" in kw_set:
            raise InvalidSQLStatement("WITHIN only valid in PROCESS")
        if kind == "PROCESS" and (kw_set - {"WITHIN", "WHERE"}):
            raise InvalidSQLStatement("PROCESS allows only WITHIN and WHERE")

        # slice clause bodies
        spans: dict[str, str] = {}
        bounds = hits + [("$", len(body), len(body))]
        head = body[: hits[0][1]] if hits else body
        for idx, (kw, _, kend) in enumerate(hits):
            spans[kw] = body[kend: bounds[idx + 1][1]].strip()

        # table list: FROM clause for SELECT; the statement head for PROCESS
        # (`PROCESS <table> [alias] WITHIN …` — reference
        # sql/SQLSelect.java:163-177 slices the table before WITHIN)
        tbl_src = spans.get("FROM", "") if kind == "SELECT" else head
        if not tbl_src.strip():
            raise MissingTablesDescription(sql[:80])
        lj_parts: list[tuple[TableRef, str, str]] = []
        if kind == "SELECT" and _scan_top_matches(tbl_src, _LEFT_JOIN_RE):
            q.tables, lj_parts = self._parse_from_left_joins(tbl_src)
        else:
            q.tables = self._parse_tables(tbl_src)
        if kind == "PROCESS" and len(q.tables) != 1:
            raise InvalidSQLStatement("PROCESS works on a single table")
        self._cols = {t.alias: self.resolver.columns(t.name) for t in q.tables}
        if lj_parts:
            if q.stream:
                raise InvalidSQLStatement(
                    "LEFT/RIGHT/FULL JOIN not supported on SELECT STREAM"
                )
            q.left_joins = [
                LeftJoinSpec(table=tref, on=self._parse_on(on_src), how=how)
                for tref, on_src, how in lj_parts
            ]
            # each ON may only reference tables already in scope (the
            # base and previously-joined tables plus its own) — caught
            # here as a typed error instead of a raw Catalyst failure
            allowed = {q.tables[0].alias}
            for spec in q.left_joins:
                allowed.add(spec.table.alias)
                for c in spec.on:
                    refs = (
                        [c.ref] if isinstance(c, ValueCondition)
                        else [c.left, c.right]
                    )
                    for r in refs:
                        if r.alias not in allowed:
                            raise InvalidSQLStatement(
                                f"ON condition references {r.alias!r} "
                                f"before it is joined"
                            )

        # select list
        if kind == "SELECT":
            items_src = head.strip()
            if not items_src:
                raise UnexpectedEndOfStatement("empty select list")
            self._parse_items(q, items_src)
        else:
            q.within = spans.get("WITHIN", "").strip()
            if not q.within:
                raise MissingWithinClause(sql[:80])
            q.star = True
            self._expand_star(q)

        if "WHERE" in spans:
            w = spans["WHERE"].strip()
            if not w:
                raise UnexpectedEndOfStatement("empty WHERE")
            q.where = self._parse_condition_group(w, depth=0)
        if "GROUP BY" in spans:
            q.group_by = [self._parse_group_key(c.strip())
                          for c in _split_top(spans["GROUP BY"])]
        if "HAVING" in spans:
            if q.stream:
                raise InvalidSQLStatement("HAVING not supported on SELECT STREAM")
            if not any(i.is_agg for i in q.items):
                raise InvalidSQLStatement(
                    "HAVING requires group functions in the select list"
                )
            h = spans["HAVING"].strip()
            if not h:
                raise UnexpectedEndOfStatement("empty HAVING")
            q.having = self._parse_having_group(h, depth=0)
        if "ORDER BY" in spans:
            q.order_by = []
            for c in _split_top(spans["ORDER BY"]):
                c = c.strip()
                # no ASC/DESC in the dialect (reference has no such token)
                if re.search(r"\s(ASC|DESC)$", c, re.I):
                    raise InvalidOrderByPart(c)
                q.order_by.append(self._resolve_ref(c, InvalidOrderByPart))
        if "WINDOW BY" in spans:
            q.window_by = self._parse_window_by(spans["WINDOW BY"])
        if "LIMIT" in spans:
            lim = spans["LIMIT"].strip()
            if not re.fullmatch(r"\d+", lim) or int(lim) <= 0:
                raise InvalidSQLStatement(f"LIMIT requires a positive integer: {lim!r}")
            if q.stream:
                raise InvalidSQLStatement("LIMIT not supported on SELECT STREAM")
            q.limit = int(lim)

        self._validate_group(q)
        return q

    def _parse_from_left_joins(
        self, src: str
    ) -> tuple[list[TableRef], list[tuple[TableRef, str, str]]]:
        """EXTENSION (SURVEY §2.3 — reference has inner comma-joins only):
        ``FROM base b LEFT|RIGHT|FULL [OUTER] JOIN t1 a ON cond [...]``.
        One base table, no comma mixing; every join needs an ON clause.
        Returns (all table refs, [(joined ref, raw ON text, how), ...]);
        ON text is parsed by the caller once column metadata is loaded.
        Join keywords are located with the quote/paren-aware scanner
        (:func:`_scan_top_matches`) so literals inside ON conditions can
        never be mistaken for JOIN/ON keywords."""
        joins = _scan_top_matches(src, _LEFT_JOIN_RE)
        base = src[: joins[0].start()]
        if len(_split_top(base)) != 1:
            raise InvalidSQLStatement(
                "comma joins cannot be mixed with LEFT/RIGHT/FULL JOIN"
            )
        tables = self._parse_tables(base)
        parts: list[tuple[TableRef, str, str]] = []
        for i, jm in enumerate(joins):
            direction = jm.group(1)
            how = direction.lower()  # left | right | full
            end = joins[i + 1].start() if i + 1 < len(joins) else len(src)
            seg = src[jm.end(): end]
            on_hits = _scan_top_matches(seg, _ON_RE)
            if not on_hits:
                raise InvalidSQLStatement(
                    f"{direction.upper()} JOIN requires an ON clause: "
                    f"{seg.strip()[:60]!r}"
                )
            om = on_hits[0]
            tsrc, on_src = seg[: om.start()], seg[om.end():]
            refs = self._parse_tables(tsrc)
            if len(refs) != 1:
                raise InvalidSQLStatement(
                    f"{direction.upper()} JOIN joins exactly one table: "
                    f"{tsrc.strip()!r}"
                )
            if not on_src.strip():
                raise UnexpectedEndOfStatement("empty ON condition")
            tables.extend(refs)
            parts.append((refs[0], on_src.strip(), how))
        aliases = [t.alias for t in tables]
        if len(set(aliases)) != len(aliases):
            raise InvalidSQLStatement("duplicate table alias")
        return tables, parts

    def _parse_on(self, src: str) -> list:
        """ON accepts a flat AND conjunction of simple conditions, at
        least one of them column = column (the join key); OR, nesting and
        subqueries are rejected — outer-join semantics under the
        reference's one-connective-per-level rule stay unambiguous."""
        cond = self._parse_condition_group(src, depth=0)
        if isinstance(cond, ConditionGroup):
            if cond.connective == "OR":
                raise InvalidSQLStatement("OR is not allowed in an outer-join ON")
            children = list(cond.children)
        else:
            children = [cond]
        for c in children:
            if isinstance(c, (ConditionGroup, SubqueryCondition)):
                raise InvalidSQLStatement(
                    "outer-join ON supports a flat AND of simple conditions"
                )
        # at least one EQUALITY key: a theta-only ON (a.x < b.y) would
        # plan a broadcast-nested-loop outer join, which the docstring
        # and error message both promise to reject
        if not any(
            isinstance(c, JoinCondition) and c.op == "=" for c in children
        ):
            raise InvalidSQLStatement(
                "outer-join ON requires a column = column condition"
            )
        return children

    def _parse_tables(self, src: str) -> list[TableRef]:
        out = []
        for part in _split_top(src):
            toks = part.strip().split()
            if not toks:
                raise MissingTablesDescription(src)
            name = toks[0]
            alias = toks[1] if len(toks) > 1 else name.rsplit(".", 1)[-1]
            if len(toks) > 2:
                raise InvalidSQLStatement(f"bad table ref: {part.strip()!r}")
            # existence check now (reference resolves classes at parse time)
            self.engine.catalog.get(name)
            out.append(TableRef(name=name, alias=alias))
        aliases = [t.alias for t in out]
        if len(set(aliases)) != len(aliases):
            raise InvalidSQLStatement("duplicate table alias")
        return out

    # ------------------------------------------------------- select items
    def _parse_items(self, q: Query, src: str) -> None:
        parts = [p.strip() for p in _split_top(src)]
        if parts == ["*"]:
            if len(q.tables) != 1:
                # reference throws InternalException for multi-table *;
                # surfaced as InvalidColumnDescription in our taxonomy
                raise InvalidColumnDescription("* requires a single table")
            q.star = True
            self._expand_star(q)
            return
        for p in parts:
            if not p:
                raise InvalidColumnDescription("empty select item")
            q.items.append(self._parse_item(p))

    def _expand_star(self, q: Query) -> None:
        t = q.tables[0]
        for col in self._cols[t.alias]:
            q.items.append(SelectItem(ref=ColumnRef(t.alias, col), out_name=col))

    def _parse_item(self, p: str) -> SelectItem:
        # optional output alias: "expr alias" or "expr AS alias"
        m = re.match(r"^(.*?)\s+(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)$", p, re.S | re.I)
        expr, out = (m.group(1).strip(), m.group(2)) if m and (
            "(" not in m.group(2) and "." not in m.group(2)
        ) else (p, None)
        # keyword false-positive: "sum(x)" has no alias; regex above only
        # fires when a bare identifier trails the expression.
        fm = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)$", expr, re.S)
        if fm:
            fname = fm.group(1).upper()
            inner = fm.group(2).strip()
            # COUNT(DISTINCT col) extension (the reference has no DISTINCT
            # inside aggregates); other aggregates reject the modifier
            dm = re.match(r"^DISTINCT\s+(.*)$", inner, re.S | re.I)
            distinct = bool(dm) and (
                fname in FUNCS or fname in self.engine.group_functions
            )
            if distinct:
                if fname != "COUNT":
                    # covers custom group functions too — without this the
                    # un-stripped 'DISTINCT col' falls through to a baffling
                    # "bad column reference" error
                    raise InvalidColumnDescription(
                        f"DISTINCT is supported only in COUNT(...), not {fname}"
                    )
                inner = dm.group(1).strip()
            ref = self._resolve_ref(inner, InvalidColumnDescription)
            if fname in FUNCS or fname in self.engine.group_functions:
                # default alias: func name + inner with '.' stripped
                # (reference sql/CList.java:93-95,175-179); registered
                # custom group functions (D14) parse exactly like built-ins
                return SelectItem(ref=ref, func=fname, distinct=distinct,
                                  out_name=out or f"{fname.lower()}{ref.alias}{ref.name}")
            if fname in SCALAR_FUNCS:
                return SelectItem(ref=ref, scalar=fname,
                                  out_name=out or f"{fname.lower()}{ref.alias}{ref.name}")
            raise InvalidColumnDescription(f"unknown function {fname}")
        ref = self._resolve_ref(expr, InvalidColumnDescription)
        return SelectItem(ref=ref, out_name=out or ref.default_out)

    def _resolve_ref(self, token: str, err) -> ColumnRef:
        token = token.strip()
        if not token or not re.match(r"^[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)?$", token):
            raise err(f"bad column reference {token!r}")
        if "." in token:
            alias, col = token.split(".", 1)
            cols = self._cols.get(alias)
            if cols is None or col not in cols:
                raise err(f"unknown column {token!r}")
            return ColumnRef(alias, col)
        # bare column: must be unique across tables
        # (reference sql/CList.java:117-133 → AmbiguousColumnName)
        owners = [a for a, cols in self._cols.items() if token in cols]
        if len(owners) > 1:
            raise AmbiguousColumnName(token)
        if not owners:
            raise err(f"unknown column {token!r}")
        return ColumnRef(owners[0], token)

    def _ref_type(self, ref: ColumnRef) -> T.DataType:
        return self._cols[ref.alias][ref.name]

    # --------------------------------------------------------- conditions
    def _parse_condition_group(self, src: str, depth: int):
        if depth > MAX_NESTING:
            raise TooManyNestedConditions(str(depth))
        terms, connective = self._split_terms(src)
        children = []
        for t in terms:
            t = t.strip()
            if not t:
                raise InvalidCondition("empty condition term")
            if t.startswith("("):
                if not t.endswith(")"):
                    raise MissingRightParenthesis(t)
                children.append(self._parse_condition_group(t[1:-1], depth + 1))
            else:
                children.append(self._parse_simple(t))
        if len(children) == 1 and connective is None:
            return children[0]
        return ConditionGroup(connective=connective, children=children)

    def _split_terms(self, src: str) -> tuple[list[str], str | None]:
        """Split top level on AND/OR; mixed kinds at one level →
        InvalidCondition (reference sql/NestedCondition.java:50-54).
        BETWEEN-aware: the AND that closes a ``x BETWEEN a AND b`` leaf is
        part of the leaf, not a connective (a BETWEEN inside parentheses is
        handled by the recursive parse of that group — the keyword scan
        only runs at depth 0 of each invocation)."""
        terms, buf = [], []
        connective: str | None = None
        between_pending = False
        depth_p = depth_b = 0
        q: str | None = None
        i, n = 0, len(src)
        up = src.upper()

        def _kw_at(kw: str, i: int) -> bool:
            return (
                up.startswith(kw, i)
                and (i == 0 or not (up[i - 1].isalnum() or up[i - 1] == "_"))
                and (
                    i + len(kw) >= n
                    or not (up[i + len(kw)].isalnum() or up[i + len(kw)] == "_")
                )
            )

        while i < n:
            ch = src[i]
            if q:
                buf.append(ch)
                if ch == q:
                    q = None
                i += 1
                continue
            if ch in "'\"":
                q = ch
            elif ch == "(":
                depth_p += 1
            elif ch == ")":
                depth_p -= 1
                if depth_p < 0:
                    raise MissingRightParenthesis(src)
            elif ch == "[":
                depth_b += 1
            elif ch == "]":
                depth_b -= 1
            if depth_p == 0 and depth_b == 0 and q is None:
                if _kw_at("BETWEEN", i):
                    between_pending = True
                    buf.append(src[i : i + 7])
                    i += 7
                    continue
                if between_pending and _kw_at("AND", i):
                    # the BETWEEN's own AND — keep it inside the leaf
                    between_pending = False
                    buf.append(src[i : i + 3])
                    i += 3
                    continue
                for kw in ("AND", "OR"):
                    if _kw_at(kw, i):
                        # NOT IN / NOT LIKE contain no AND/OR; safe
                        if connective is None:
                            connective = kw
                        elif connective != kw:
                            raise InvalidCondition("mixed AND/OR at one nesting level")
                        terms.append("".join(buf))
                        buf = []
                        i += len(kw)
                        break
                else:
                    buf.append(ch)
                    i += 1
                    continue
                continue
            buf.append(ch)
            i += 1
        if depth_p != 0:
            raise MissingRightParenthesis(src)
        terms.append("".join(buf))
        return terms, connective

    _SIMPLE_RE = re.compile(
        r"^\s*(?P<lhs>[A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)?)\s*"
        r"(?P<op>>=|<=|<>|!=|=|<|>|\s+NOT\s+IN\b|\s+IN\b|\s+NOT\s+LIKE\b|\s+LIKE\b)"
        r"\s*(?P<rhs>.+)$",
        re.S | re.I,
    )

    _NULL_RE = re.compile(
        r"^\s*(?P<lhs>[A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)?)\s+IS\s+"
        r"(?P<neg>NOT\s+)?NULL\s*$",
        re.S | re.I,
    )

    _BETWEEN_RE = re.compile(
        r"^\s*(?P<lhs>[A-Za-z_][\w$]*(?:\.[A-Za-z_][\w$]*)?)\s+"
        r"(?P<neg>NOT\s+)?BETWEEN\s+(?P<lo>.+?)\s+AND\s+(?P<hi>.+?)\s*$",
        re.S | re.I,
    )

    def _parse_simple(self, src: str):
        # IS [NOT] NULL — EXTENSION: the reference grammar has no NULL
        # token at all (sql/ValueCondition.java parses only typed
        # literals), yet nullable boxed columns exist in its type system —
        # null rows were simply unreachable by predicate there.
        nm = self._NULL_RE.match(src)
        if nm:
            ref = self._resolve_ref(nm.group("lhs"), InvalidCondition)
            return ValueCondition(
                ref=ref, op="ISNULL", values=[], negated=bool(nm.group("neg"))
            )
        # [NOT] BETWEEN lo AND hi — EXTENSION (pure sugar over >= AND <=;
        # the reference has no BETWEEN token). Ordering semantics → same
        # string-column rejection as < / >.
        bm = self._BETWEEN_RE.match(src)
        if bm:
            ref = self._resolve_ref(bm.group("lhs"), InvalidCondition)
            btype = self._ref_type(ref)
            if isinstance(btype, T.StringType):
                raise InvalidCondition(
                    f"ordering comparison on string column: {src!r}"
                )
            lo = self._parse_literal(bm.group("lo").strip(), btype, src)
            hi = self._parse_literal(bm.group("hi").strip(), btype, src)
            return ValueCondition(
                ref=ref, op="BETWEEN", values=[lo, hi],
                negated=bool(bm.group("neg")),
            )
        m = self._SIMPLE_RE.match(src)
        if not m:
            raise InvalidCondition(src)
        lhs = self._resolve_ref(m.group("lhs"), InvalidCondition)
        op = re.sub(r"\s+", " ", m.group("op").strip().upper())
        if op == "!=":
            op = "<>"
        rhs = m.group("rhs").strip()
        ltype = self._ref_type(lhs)

        if op in ("IN", "NOT IN"):
            if not (rhs.startswith("[") and rhs.endswith("]")):
                raise InvalidCondition(f"IN expects a [list]: {src!r}")
            inner = rhs[1:-1].strip()
            if inner.upper().startswith("SELECT"):
                sub = Parser(self.engine).parse(inner)
                # a set-operation subquery parses to SetQuery (no .items) —
                # supported when every leaf branch selects one column; the
                # bare len(sub.items) probe would escape the SQLException
                # taxonomy with an AttributeError

                def _leaves(x):
                    ps = getattr(x, "parts", None)
                    if ps is None:
                        return [x]
                    out = []
                    for p in ps:
                        out.extend(_leaves(p))
                    return out

                if any(len(b.items) != 1 for b in _leaves(sub)):
                    raise InvalidCondition("IN subquery must select one column")
                return SubqueryCondition(ref=lhs, query=sub, negated=op.startswith("NOT"))
            vals = [self._parse_literal(v.strip(), ltype, src) for v in _split_top(inner)]
            if not vals:
                raise InvalidConditionValue(f"empty IN list: {src!r}")
            return ValueCondition(ref=lhs, op="IN", values=vals, negated=op.startswith("NOT"))

        if op in ("LIKE", "NOT LIKE"):
            if not isinstance(ltype, T.StringType):
                raise InvalidConditionValue(f"LIKE requires a string column: {src!r}")
            v = self._parse_literal(rhs, ltype, src)
            return ValueCondition(ref=lhs, op="LIKE", values=[v], negated=op.startswith("NOT"))

        # comparison: rhs is a column ref or a literal
        # (classification — reference sql/NestedCondition.java:513-537)
        if re.match(r"^[A-Za-z_][\w$]*(\.[A-Za-z_][\w$]*)?$", rhs) and not self._is_bare_literal(rhs, ltype):
            try:
                rref = self._resolve_ref(rhs, InvalidCondition)
            except InvalidCondition:
                raise InvalidConditionValue(f"cannot resolve {rhs!r} in {src!r}")
            self._check_join_types(lhs, rref, src)
            return JoinCondition(left=lhs, op=op, right=rref)
        v = self._parse_literal(rhs, ltype, src)
        if op in ("<", ">", "<=", ">=") and isinstance(ltype, (T.StringType,)):
            # reference supports < > only for numerics; = <> also for
            # string/date (sql/NestedCondition.java:147-355). We relax to
            # allow string ordering? No — keep parity: reject.
            raise InvalidCondition(f"ordering comparison on string column: {src!r}")
        return ValueCondition(ref=lhs, op=op, values=[v])

    def _is_bare_literal(self, rhs: str, ltype: T.DataType) -> bool:
        if _NUM_RE.match(rhs) or _DEC_RE.match(rhs):
            return True
        if isinstance(ltype, T.BooleanType) and rhs.upper() in ("TRUE", "FALSE"):
            return True
        return False

    def _check_join_types(self, a: ColumnRef, b: ColumnRef, src: str) -> None:
        """Type-compatibility matrix (reference core/Types.java:52-65):
        string↔string, date↔date, {int,long}↔{int,long},
        {float,double}↔{float,double}."""
        ta, tb = self._ref_type(a), self._ref_type(b)
        for fam in (
            (T.StringType,),
            (T.TimestampType, T.TimestampNTZType, T.DateType),
            _INT_TYPES,
            _FLT_TYPES,
            (T.BooleanType,),
            (T.BinaryType,),
        ):
            if isinstance(ta, fam) and isinstance(tb, fam):
                return
        raise InvalidConditionValue(f"incompatible join column types in {src!r}")

    def _parse_literal(self, raw: str, ltype: T.DataType, ctx: str):
        """Typed literal parsing (reference sql/ValueCondition.java:51-169)."""
        raw = raw.strip()
        quoted = len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in "'\""
        text = raw[1:-1] if quoted else raw
        if isinstance(ltype, T.StringType):
            if not quoted:
                raise InvalidConditionValue(f"string literal must be quoted: {ctx!r}")
            return text
        if isinstance(ltype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
            for fmt in (self._date_fmt, "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
                try:
                    dt = datetime.strptime(text, fmt)
                    return dt.date() if isinstance(ltype, T.DateType) else dt
                except ValueError:
                    continue
            raise InvalidConditionValue(f"cannot parse date literal {raw!r} in {ctx!r}")
        if isinstance(ltype, T.BooleanType):
            if text.upper() in ("TRUE", "FALSE"):
                return text.upper() == "TRUE"
            raise InvalidConditionValue(f"bad boolean literal {raw!r} in {ctx!r}")
        if isinstance(ltype, _INT_TYPES):
            if quoted or not _NUM_RE.match(text):
                # decimals only for float/double cols (ValueCondition.java)
                raise InvalidConditionValue(f"bad integer literal {raw!r} in {ctx!r}")
            return int(text)
        if isinstance(ltype, _FLT_TYPES):
            if quoted or not _DEC_RE.match(text):
                raise InvalidConditionValue(f"bad numeric literal {raw!r} in {ctx!r}")
            return float(text)
        raise InvalidConditionValue(f"unsupported literal type {ltype} in {ctx!r}")

    # ----------------------------------------------------------- WINDOW BY
    def _parse_window_by(self, src: str) -> WindowBy:
        m = re.match(r"^(.*?)\s+INTERVAL\s*=\s*(\S+)\s*$", src.strip(), re.S | re.I)
        if not m:
            raise InvalidWindowByPart(src)
        ref = self._resolve_ref(m.group(1).strip(), InvalidWindowByPart)
        try:
            interval = int(m.group(2))
        except ValueError:
            raise InvalidWindowByPart(src)
        if interval <= 0:
            raise InvalidWindowByPart(src)
        return WindowBy(ref=ref, interval=interval)

    # -------------------------------------------------------------- HAVING
    _HAVING_RE = re.compile(
        r"^\s*(?P<func>[A-Za-z_]+)\s*\((?P<inner>[^()]*)\)\s*"
        r"(?P<op>>=|<=|<>|!=|=|<|>)\s*(?P<rhs>.+)$",
        re.S,
    )

    def _parse_having_group(self, src: str, depth: int):
        """HAVING condition tree (extension; see ast.HavingCondition): the
        WHERE grammar's nesting rules, with leaves ``FUNC(col) op literal``."""
        if depth > MAX_NESTING:
            raise TooManyNestedConditions(str(depth))
        terms, connective = self._split_terms(src)
        children = []
        for t in terms:
            t = t.strip()
            if not t:
                raise InvalidCondition("empty HAVING term")
            if t.startswith("("):
                if not t.endswith(")"):
                    raise MissingRightParenthesis(t)
                children.append(self._parse_having_group(t[1:-1], depth + 1))
            else:
                children.append(self._parse_having_simple(t))
        if len(children) == 1 and connective is None:
            return children[0]
        return ConditionGroup(connective=connective, children=children)

    def _parse_having_simple(self, src: str) -> HavingCondition:
        m = self._HAVING_RE.match(src)
        if not m:
            raise InvalidCondition(f"HAVING expects FUNC(col) op literal: {src!r}")
        func = m.group("func").upper()
        if func not in FUNCS:
            raise InvalidCondition(f"unknown group function in HAVING: {src!r}")
        ref = self._resolve_ref(m.group("inner"), InvalidCondition)
        op = m.group("op")
        if op == "!=":
            op = "<>"
        # literal typed by the aggregate's RESULT type, not the column's
        ctype = self._ref_type(ref)
        if func == "COUNT":
            ltype: T.DataType = T.LongType()
        elif func == "SUM":
            ltype = T.LongType() if isinstance(ctype, _INT_TYPES) else T.DoubleType()
        elif func in ("AVG", "LAST"):
            ltype = T.DoubleType()
        else:  # MIN / MAX keep the column type
            ltype = ctype
        v = self._parse_literal(m.group("rhs").strip(), ltype, src)
        if op in ("<", ">", "<=", ">=") and isinstance(ltype, T.StringType):
            raise InvalidCondition(f"ordering comparison on string aggregate: {src!r}")
        return HavingCondition(func=func, ref=ref, op=op, values=[v])

    def _parse_group_key(self, token: str):
        """One GROUP BY key: a plain column ref, or (EXTENSION)
        ``SCALAR_FUNC(col)`` — e.g. ``GROUP BY year(e.ts)``. Group
        functions are rejected (the reference's grammar has neither)."""
        fm = re.match(r"^([A-Za-z_]+)\s*\((.*)\)$", token, re.S)
        if fm:
            fname = fm.group(1).upper()
            if fname in FUNCS:
                raise InvalidGroupByPart(f"group function in GROUP BY: {token!r}")
            if fname not in SCALAR_FUNCS:
                raise InvalidGroupByPart(f"unknown function in GROUP BY: {token!r}")
            ref = self._resolve_ref(fm.group(2).strip(), InvalidGroupColumnSet)
            return GroupExpr(scalar=fname, ref=ref)
        return self._resolve_ref(token, InvalidGroupColumnSet)

    # ------------------------------------------------------ group validate
    def _validate_group(self, q: Query) -> None:
        """Reference sql/SQLSelect.java:347-376: with group functions
        present, every bare select column must be listed in GROUP BY and
        every GROUP BY column must appear in the select list. A scalar
        select item may match either the identical scalar group key or a
        plain group key on its column (scalar-over-group-col)."""
        if q.kind != "SELECT":
            return
        funcs = [i for i in q.items if i.is_agg]
        bare = [i for i in q.items if not i.is_agg]
        if q.window_by is not None:
            if not funcs:
                raise InvalidWindowByPart("WINDOW BY requires group functions")
            return
        if q.group_by:
            if not funcs:
                raise InvalidGroupColumnSet("GROUP BY without group functions")
            gset = {
                (getattr(g, "scalar", None), g.alias, g.name) for g in q.group_by
            }
            consumed = set()
            for b in bare:
                exact = (b.scalar, b.ref.alias, b.ref.name)
                plain = (None, b.ref.alias, b.ref.name)
                if exact in gset:
                    consumed.add(exact)
                elif plain in gset:
                    consumed.add(plain)
                else:
                    raise InvalidGroupColumnSet(
                        "GROUP BY columns must match bare select columns"
                    )
            if consumed != gset:
                raise InvalidGroupColumnSet(
                    "GROUP BY columns must match bare select columns"
                )
        elif funcs and bare:
            raise InvalidGroupColumnSet("bare columns require GROUP BY")
        if q.order_by:
            # ORDER BY columns must be result columns: the reference sorts by
            # inserting results into an IOT keyed on the order columns
            # (sql/SQLJoin.java:244-258), so non-result columns cannot sort.
            if funcs or q.group_by:
                allowed = {(g.alias, g.name) for g in q.group_by}
            else:
                allowed = {(b.ref.alias, b.ref.name) for b in bare}
            for o in q.order_by:
                if (o.alias, o.name) not in allowed:
                    raise InvalidOrderByPart(str(o))


def parse(engine, sql: str) -> Query:
    return Parser(engine).parse(sql)
