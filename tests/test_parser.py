"""Parser + validation-error taxonomy tests (FIXTURES.md §A queries 1-6)."""

import pytest

from interference_spark import errors
from interference_spark.dialect import parse
from interference_spark.dialect.ast import (
    ConditionGroup,
    JoinCondition,
    SubqueryCondition,
    ValueCondition,
)


def test_milestone1_join_parse(engine):
    q = parse(
        engine,
        "select d.deptName, e.empName from Dept d, Emp e where d.deptId = e.deptId",
    )
    assert [t.alias for t in q.tables] == ["d", "e"]
    assert [i.out_name for i in q.items] == ["ddeptName", "eempName"]
    assert isinstance(q.where, JoinCondition)
    assert q.where.op == "="


def test_fully_qualified_table_names(engine):
    q = parse(
        engine,
        "select d.deptName from su.interference.test.entity.Dept d",
    )
    assert q.tables[0].alias == "d"


def test_empty_group_by_malformed(engine):
    with pytest.raises(errors.SQLException):
        parse(engine, "select sum(e.salary), count(e.empId) from Emp e group by")


def test_agg_aliases(engine):
    q = parse(
        engine,
        "select count(e.empId), sum(e.salary) cnt2, d.deptName from Dept d, Emp e "
        "where d.deptId = e.deptId group by d.deptName",
    )
    assert q.items[0].out_name == "counteempId"
    assert q.items[1].out_name == "cnt2"
    assert q.items[2].out_name == "ddeptName"


def test_in_list_and_typed_literals(engine):
    q = parse(
        engine,
        "select e.empName from Emp e where e.salary >= 1000.5 and e.deptId in [1, 2, 3]",
    )
    g = q.where
    assert isinstance(g, ConditionGroup) and g.connective == "AND"
    vc_sal, vc_in = g.children
    assert isinstance(vc_sal, ValueCondition) and vc_sal.values == [1000.5]
    assert isinstance(vc_in, ValueCondition) and vc_in.op == "IN"
    assert vc_in.values == [1, 2, 3]


def test_like_is_contains(engine):
    q = parse(engine, "select e.empName from Emp e where e.descript like 'abc'")
    assert q.where.op == "LIKE"
    assert q.where.values == ["abc"]


def test_not_in_not_like(engine):
    q = parse(
        engine,
        "select e.empName from Emp e where e.deptId not in [1] or e.descript not like 'x'",
    )
    a, b = q.where.children
    assert a.negated and b.negated


def test_in_subquery(engine):
    q = parse(
        engine,
        "select e.empName from Emp e where e.deptId in [select d.deptId from Dept d]",
    )
    assert isinstance(q.where, SubqueryCondition)


def test_star_single_table(engine):
    q = parse(engine, "select * from Emp e")
    assert q.star and len(q.items) == 6


def test_order_and_group_asc_only(engine):
    q = parse(engine, "select e.deptId, e.empName from Emp e order by e.deptId, e.empName")
    assert [o.name for o in q.order_by] == ["deptId", "empName"]
    with pytest.raises(errors.InvalidOrderByPart):
        parse(engine, "select e.deptId from Emp e order by e.deptId desc")


def test_window_by(engine):
    q = parse(
        engine,
        "select count(e.empId), sum(e.salary) from Emp e window by e.empId interval = 100",
    )
    assert q.window_by.interval == 100
    assert q.window_by.ref.name == "empId"


def test_process_parse(engine):
    q = parse(engine, "process Emp e within MyProcessor where e.deptId = 1")
    assert q.kind == "PROCESS" and q.within == "MyProcessor"
    assert isinstance(q.where, ValueCondition)


# ---- error taxonomy ------------------------------------------------------

def test_missing_from(engine):
    with pytest.raises(errors.MissingFromClause):
        parse(engine, "select e.empName")


def test_missing_within(engine):
    with pytest.raises(errors.MissingWithinClause):
        parse(engine, "process Emp e where e.deptId = 1")


def test_star_multi_table_error(engine):
    with pytest.raises(errors.InvalidColumnDescription):
        parse(engine, "select * from Dept d, Emp e where d.deptId = e.deptId")


def test_ambiguous_bare_column(engine):
    with pytest.raises(errors.AmbiguousColumnName):
        parse(engine, "select deptId from Dept d, Emp e where d.deptId = e.deptId")


def test_bare_column_single_owner_ok(engine):
    q = parse(engine, "select empName from Dept d, Emp e where d.deptId = e.deptId")
    assert q.items[0].ref.alias == "e"


def test_mixed_and_or_one_level(engine):
    with pytest.raises(errors.InvalidCondition):
        parse(
            engine,
            "select e.empName from Emp e where e.deptId = 1 and e.deptId = 2 or e.deptId = 3",
        )


def test_nested_and_or_ok(engine):
    q = parse(
        engine,
        "select e.empName from Emp e where e.salary > 1000 and (e.deptId = 1 or e.deptId = 2)",
    )
    g = q.where
    assert g.connective == "AND"
    assert isinstance(g.children[1], ConditionGroup)
    assert g.children[1].connective == "OR"


def test_bad_literal_type(engine):
    with pytest.raises(errors.InvalidConditionValue):
        parse(engine, "select e.empName from Emp e where e.deptId = 1.5")
    with pytest.raises(errors.InvalidConditionValue):
        parse(engine, "select e.empName from Emp e where e.empName = 5")
    with pytest.raises(errors.InvalidConditionValue):
        parse(engine, "select e.empName from Emp e where e.deptId = 'x'")


def test_unquoted_string_literal(engine):
    with pytest.raises(errors.InvalidConditionValue):
        parse(engine, "select e.empName from Emp e where e.empName = bogus_name_xx")


def test_group_validation(engine):
    with pytest.raises(errors.InvalidGroupColumnSet):
        parse(engine, "select count(e.empId), e.deptId from Emp e")
    with pytest.raises(errors.InvalidGroupColumnSet):
        parse(engine, "select count(e.empId), e.deptId from Emp e group by e.empName")
    with pytest.raises(errors.InvalidGroupColumnSet):
        parse(engine, "select e.deptId from Emp e group by e.deptId")


def test_window_exclusive_with_group_order(engine):
    with pytest.raises(errors.InvalidWindowByPart):
        parse(
            engine,
            "select count(e.empId) from Emp e group by e.deptId window by e.empId interval = 5",
        )


def test_missing_paren(engine):
    with pytest.raises(errors.MissingRightParenthesis):
        parse(engine, "select e.empName from Emp e where (e.deptId = 1 or e.deptId = 2")


def test_clause_order(engine):
    with pytest.raises(errors.InvalidSQLStatement):
        parse(engine, "select e.empName from Emp e order by e.empName where e.deptId = 1")


def test_unknown_table(engine):
    with pytest.raises(errors.TableNotRegistered):
        parse(engine, "select x.a from NotThere x")


def test_invalid_statement(engine):
    with pytest.raises(errors.InvalidSQLStatement):
        parse(engine, "UPDATE Emp SET x = 1")


def test_date_literal(engine):
    q = parse(engine, "select e.empName from Emp e where e.hireDate = '03.01.2020'")
    import datetime

    assert q.where.values == [datetime.datetime(2020, 1, 3)]


# ------------------------- extensions: LIMIT + set operations (no reference
# equivalent — SURVEY §2.6/§2.7; implemented for real with typed validation)

def test_limit_parse(engine):
    q = parse(engine, "select e.empName from Emp e order by e.empName limit 7")
    assert q.limit == 7


def test_limit_validation(engine):
    for bad in (
        "select e.empName from Emp e limit 0",
        "select e.empName from Emp e limit -3",
        "select e.empName from Emp e limit x",
        "select stream e.empName from Emp e limit 3",
    ):
        with pytest.raises(errors.InvalidSQLStatement):
            parse(engine, bad)


def test_setop_parse_shapes(engine):
    from interference_spark.dialect.ast import SetQuery

    q = parse(
        engine,
        "select e.empName from Emp e union select d.deptName from Dept d",
    )
    assert isinstance(q, SetQuery) and q.ops == ["UNION"]
    # INTERSECT binds tighter: a UNION b INTERSECT c → a ∪ (b ∩ c)
    q2 = parse(
        engine,
        "select e.empName from Emp e union select d.deptName from Dept d "
        "intersect select d.deptName from Dept d",
    )
    assert q2.ops == ["UNION"]
    assert isinstance(q2.parts[1], SetQuery)
    assert q2.parts[1].ops == ["INTERSECT"]


def test_setop_validation(engine):
    for bad in (
        # ORDER BY inside an operand
        "select e.empName from Emp e order by e.empName "
        "union select d.deptName from Dept d",
        # STREAM operand
        "select stream e.empName from Emp e union select d.deptName from Dept d",
        # non-SELECT operand
        "select e.empName from Emp e union process Emp within P",
    ):
        with pytest.raises(errors.InvalidSQLStatement):
            parse(engine, bad)


def test_setop_in_bracket_list_not_split(engine):
    # IN [ ... ] brackets shield keywords from the set-op scan
    q = parse(engine, "select e.empName from Emp e where e.empName in ['UNION', 'x']")
    assert not hasattr(q, "ops")


def test_having_parse(engine):
    from interference_spark.dialect.ast import HavingCondition

    q = parse(
        engine,
        "select count(e.empId) c, e.deptId from Emp e group by e.deptId "
        "having sum(e.salary) >= 100 and count(e.empId) <> 2",
    )
    assert q.having.connective == "AND"
    leaves = q.having.children
    assert all(isinstance(h, HavingCondition) for h in leaves)
    assert leaves[0].func == "SUM" and leaves[0].op == ">="
    assert leaves[1].func == "COUNT" and leaves[1].values == [2]


def test_having_validation(engine):
    for bad, err in (
        # no aggregates in select list
        ("select e.empName from Emp e having count(e.empId) > 1",
         errors.InvalidSQLStatement),
        # bare column leaf
        ("select count(e.empId) c from Emp e having e.empId > 1",
         errors.InvalidCondition),
        # HAVING before GROUP BY violates clause order
        ("select count(e.empId) c, e.deptId from Emp e "
         "having count(e.empId) > 1 group by e.deptId",
         errors.InvalidSQLStatement),
    ):
        with pytest.raises(err):
            parse(engine, bad)


def test_scalar_funcs_parse(engine):
    q = parse(
        engine,
        "select upper(e.empName) u, length(e.empName) n, abs(e.salary) a "
        "from Emp e",
    )
    assert [i.scalar for i in q.items] == ["UPPER", "LENGTH", "ABS"]
    assert [i.out_name for i in q.items] == ["u", "n", "a"]
    # default out name: funcname + alias + col (reference sql/CList.java:93-95)
    q2 = parse(engine, "select upper(e.empName) from Emp e")
    assert q2.items[0].out_name == "uppereempName"


def test_scalar_funcs_type_errors(engine, session):
    # type mismatches surface as the reference's typed error at compile
    for bad in (
        "select upper(e.salary) u from Emp e",      # UPPER on double
        "select abs(e.empName) a from Emp e",       # ABS on string
        "select year(e.empName) y from Emp e",      # YEAR on string
    ):
        with pytest.raises(errors.InvalidColumnDescription):
            session.execute(bad).collect()


def test_scalar_group_keys(engine, session):
    from interference_spark.dialect.ast import GroupExpr

    q = parse(
        engine,
        "select year(e.hireDate) y, count(e.empId) c from Emp e "
        "group by year(e.hireDate)",
    )
    assert isinstance(q.group_by[0], GroupExpr)
    assert q.group_by[0].scalar == "YEAR"
    # executes: one row per distinct year
    rows = session.execute(
        "select year(e.hireDate) y, count(e.empId) c from Emp e "
        "group by year(e.hireDate)"
    ).collect()
    assert rows and all(r["y"] is None or r["y"] >= 1900 for r in rows)
    # scalar select over a PLAIN group key is allowed (post-agg evaluation)
    rows2 = session.execute(
        "select upper(e.empName) u, count(e.empId) c from Emp e "
        "group by e.empName"
    ).collect()
    assert rows2 and all(r["u"] is None or r["u"] == r["u"].upper() for r in rows2)


def test_scalar_group_key_validation(engine):
    for bad, err in (
        # group function as a group key
        ("select count(e.empId) c, e.deptId from Emp e group by sum(e.deptId)",
         errors.InvalidGroupByPart),
        # unknown function as a group key
        ("select count(e.empId) c from Emp e group by frobnicate(e.deptId)",
         errors.InvalidGroupByPart),
        # select bare col != scalar group key
        ("select e.hireDate, count(e.empId) c from Emp e "
         "group by year(e.hireDate)",
         errors.InvalidGroupColumnSet),
        # scalar select item whose column is not grouped at all
        ("select year(e.hireDate) y, count(e.empId) c from Emp e "
         "group by e.deptId",
         errors.InvalidGroupColumnSet),
    ):
        with pytest.raises(err):
            parse(engine, bad)


def test_is_null_extension(engine, session):
    from interference_spark.dialect.ast import ValueCondition

    q = parse(engine, "select e.empId from Emp e where e.empName is null")
    leaf = q.where
    while hasattr(leaf, "children"):
        leaf = leaf.children[0]
    assert isinstance(leaf, ValueCondition) and leaf.op == "ISNULL"
    null_ids = {r["eempId"] for r in session.execute(
        "select e.empId from Emp e where e.empName is null").collect()}
    not_null_ids = {r["eempId"] for r in session.execute(
        "select e.empId from Emp e where e.empName is not null").collect()}
    all_ids = {r["eempId"] for r in session.execute(
        "select e.empId from Emp e").collect()}
    # the two partitions are disjoint and cover the table (no 3VL holes)
    assert null_ids and not_null_ids
    assert null_ids | not_null_ids == all_ids
    assert not (null_ids & not_null_ids)
    # composes with other conditions
    rows = session.execute(
        "select e.empId from Emp e "
        "where e.empName is not null and e.empId > 0").collect()
    assert {r["eempId"] for r in rows} <= not_null_ids


def test_between_extension(engine, session):
    from interference_spark.dialect.ast import ValueCondition

    q = parse(
        engine,
        "select e.empId from Emp e where e.salary between 1000.0 and 3000.0",
    )
    assert isinstance(q.where, ValueCondition)
    assert q.where.op == "BETWEEN" and q.where.values == [1000.0, 3000.0]
    # the BETWEEN's own AND does not split; surrounding ANDs still do
    q2 = parse(
        engine,
        "select e.empId from Emp e where e.deptId = 1 "
        "and e.salary between 1000.0 and 3000.0 and e.empId > 0",
    )
    assert len(q2.where.children) == 3
    # NOT BETWEEN + equivalence with the expanded form
    rows_b = {r["eempId"] for r in session.execute(
        "select e.empId from Emp e where e.salary between 1000.0 and 3000.0"
    ).collect()}
    rows_x = {r["eempId"] for r in session.execute(
        "select e.empId from Emp e where e.salary >= 1000.0 and e.salary <= 3000.0"
    ).collect()}
    assert rows_b == rows_x
    rows_nb = {r["eempId"] for r in session.execute(
        "select e.empId from Emp e where e.salary not between 1000.0 and 3000.0"
    ).collect()}
    assert rows_b & rows_nb == set()
    # string columns: ordering comparison rejected (same rule as < / >)
    with pytest.raises(errors.InvalidCondition):
        parse(engine, "select e.empId from Emp e where e.empName between 'a' and 'b'")


def test_count_distinct_extension(engine):
    from interference_spark.dialect import parse
    from interference_spark.errors import InvalidColumnDescription

    q = parse(engine, "select count(distinct o.o_custkey) dc from orders o")
    item = q.items[0]
    assert item.func == "COUNT" and item.distinct and item.out_name == "dc"
    # DISTINCT inside any other aggregate is rejected
    import pytest as _pytest

    with _pytest.raises(InvalidColumnDescription):
        parse(engine, "select sum(distinct o.o_totalprice) s from orders o")


def test_count_distinct_stream_rejected(engine):
    from interference_spark.errors import InvalidCondition

    td = engine.register_table(
        "cds", "id long, k string", id_col="id", nocheck=True
    )
    try:
        s = engine.session()
        import pytest as _pytest

        with _pytest.raises(InvalidCondition):
            s.execute("select stream count(distinct c.k) dk from cds c")
    finally:
        engine.drop_table("cds")
