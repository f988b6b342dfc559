"""IR for the dialect.

Replaces the reference's flag-based IR — (List<SQLTable>, CList,
NestedCondition), reference ``sql/SQLSelect.java`` — with small dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

# group functions, reference sql/SQLGroupFunction.java:47-52
FUNCS = ("COUNT", "SUM", "MIN", "MAX", "AVG", "LAST")
# scalar conversions recognized by the reference tokenizer but never
# evaluated there (sql/SQLColumn.java:81-84,177-186 — dead F_TO_* constants);
# we implement them for real. Everything after TO_DATE is an EXTENSION —
# the reference has no other scalar functions at all (SURVEY §2.8).
SCALAR_FUNCS = (
    "TO_NUMBER", "TO_CHAR", "TO_DATE",
    # string
    "UPPER", "LOWER", "LENGTH", "TRIM",
    # numeric
    "ABS", "ROUND", "FLOOR", "CEIL",
    # date parts
    "YEAR", "MONTH", "DAY",
)


@dataclass(frozen=True)
class ColumnRef:
    alias: str  # table alias (resolved)
    name: str   # column name (case-sensitive)

    @property
    def default_out(self) -> str:
        # "d.deptName" -> "ddeptName", reference sql/CList.java:175-179
        return f"{self.alias}{self.name}"

    def __str__(self) -> str:
        return f"{self.alias}.{self.name}"


@dataclass
class SelectItem:
    ref: ColumnRef
    func: Optional[str] = None          # COUNT/SUM/MIN/MAX/AVG/LAST
    scalar: Optional[str] = None        # TO_NUMBER/TO_CHAR/TO_DATE
    out_name: str = ""                  # result column name
    distinct: bool = False              # COUNT(DISTINCT col) extension

    @property
    def is_agg(self) -> bool:
        return self.func is not None


@dataclass(frozen=True)
class GroupExpr:
    """``SCALAR_FUNC(col)`` as a GROUP BY key (EXTENSION — the reference
    groups only on plain columns). Exposes ``alias``/``name`` so code that
    treats group keys as ColumnRefs keeps working."""

    scalar: str
    ref: ColumnRef

    @property
    def alias(self) -> str:
        return self.ref.alias

    @property
    def name(self) -> str:
        return self.ref.name


@dataclass
class TableRef:
    name: str
    alias: str


@dataclass
class ValueCondition:
    """column <op> literal(s) — reference sql/ValueCondition.java."""

    ref: ColumnRef
    op: str                    # '=' '<>' '<' '>' '<=' '>=' 'IN' 'LIKE'
    values: list = field(default_factory=list)
    negated: bool = False      # NOT IN / NOT LIKE


@dataclass
class SubqueryCondition:
    """column IN [SELECT ...] — parsed-but-dead in the reference
    (sql/ValueCondition.java:94-95); implemented here as a semi-join."""

    ref: ColumnRef
    query: "Query"
    negated: bool = False


@dataclass
class JoinCondition:
    """column <op> column — reference sql/JoinCondition.java."""

    left: ColumnRef
    op: str
    right: ColumnRef


@dataclass
class ConditionGroup:
    """One nesting level; a single connective kind per level (mixed AND+OR
    at one level is InvalidCondition — reference sql/NestedCondition.java:366-438)."""

    connective: Optional[str]  # 'AND' | 'OR' | None (single child)
    children: list = field(default_factory=list)


Condition = Union[ValueCondition, JoinCondition, SubqueryCondition, ConditionGroup]


@dataclass
class HavingCondition:
    """One HAVING leaf: ``FUNC(col) op literal`` — an EXTENSION: the
    reference defines an (unused) HAVING constant but no grammar or
    execution (``sql/SQLSelect.java:52``; SURVEY §2.4 'Absent')."""

    func: str                  # COUNT | SUM | AVG | MIN | MAX | LAST
    ref: "ColumnRef" = None
    op: str = "="              # = <> < > <= >=
    values: list = field(default_factory=list)


@dataclass
class WindowBy:
    """WINDOW BY col INTERVAL = n — count-based sliding window
    (reference sql/SQLGroupContainer.java:120-158)."""

    ref: ColumnRef
    interval: int


@dataclass
class LeftJoinSpec:
    """EXTENSION: ``LEFT|RIGHT|FULL [OUTER] JOIN t alias ON cond
    [AND cond ...]`` — the reference dialect has inner comma-joins only
    (SURVEY §2.3: 'Absent: range/as-of/interval joins, semi/anti,
    outer'). ``on`` is the flattened AND-conjunction; OR and subqueries
    are rejected at parse. ``how`` is the Spark join type
    (left/right/full)."""

    table: "TableRef" = None
    on: list = field(default_factory=list)
    how: str = "left"


@dataclass
class Query:
    kind: str = "SELECT"               # SELECT | PROCESS
    stream: bool = False
    distinct: bool = False
    star: bool = False
    items: list[SelectItem] = field(default_factory=list)
    tables: list[TableRef] = field(default_factory=list)
    where: Optional[Condition] = None
    group_by: list[ColumnRef] = field(default_factory=list)
    order_by: list[ColumnRef] = field(default_factory=list)
    window_by: Optional[WindowBy] = None
    within: Optional[str] = None       # PROCESS ... WITHIN <processor>
    limit: Optional[int] = None        # EXTENSION: the reference has no
    #                                    LIMIT token (SURVEY §2.6)
    having: Optional[object] = None    # EXTENSION: HavingCondition tree
    #                                    (reference's HAVING is a dead
    #                                    constant — SURVEY §2.4)
    left_joins: list = field(default_factory=list)  # EXTENSION: LeftJoinSpec
    #                                    chain (reference has inner joins
    #                                    only — SURVEY §2.3)


@dataclass
class SetQuery:
    """UNION [ALL] / INTERSECT / EXCEPT chain — an EXTENSION: the reference
    has no set operations at all (SURVEY §2.7; grep over sql/ confirms).
    ANSI semantics: positional column matching, result names from the first
    operand, INTERSECT binds tighter than UNION/EXCEPT, UNION/INTERSECT/
    EXCEPT deduplicate, UNION ALL keeps duplicates."""

    parts: list = field(default_factory=list)   # Query | SetQuery
    ops: list[str] = field(default_factory=list)  # len(parts) - 1

    # class-level flags so Session.execute dispatch treats a set chain
    # exactly like a batch SELECT
    kind: str = "SELECT"
    stream: bool = False
