"""End-to-end batch execution of the dialect (FIXTURES.md §A semantics),
cross-checked against DuckDB where the semantics are SQL-expressible."""

import duckdb
import pytest


def _key(row):
    return tuple((v is None, v) for v in row)


def _rows(df):
    return sorted((tuple(r) for r in df.collect()), key=_key)


def _duck(engine, sql_duck, tables):
    con = duckdb.connect()
    for name in tables:
        pdf = engine.table(name).toPandas()
        con.register(name, pdf)
    return sorted((tuple(r) for r in con.execute(sql_duck).fetchall()), key=_key)


def test_milestone1_join(session, engine):
    df = session.execute(
        "select d.deptName, e.empName from Dept d, Emp e where d.deptId = e.deptId"
    )
    assert df.columns == ["ddeptName", "eempName"]
    got = _rows(df)
    want = _duck(
        engine,
        "select d.deptName, e.empName from Dept d, Emp e where d.deptId = e.deptId",
        ["Dept", "Emp"],
    )
    assert got == want
    assert len(got) == 8  # null-dept emp drops out of the inner join


def test_equijoin_plan_is_not_cartesian(session):
    df = session.execute(
        "select d.deptName, e.empName from Dept d, Emp e where d.deptId = e.deptId"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_typed_predicates_and_in(session, engine):
    sql = "select e.empName from Emp e where e.salary >= 1000.5 and e.deptId in [1, 2]"
    got = _rows(session.execute(sql))
    want = _duck(
        engine,
        "select empName from Emp where salary >= 1000.5 and deptId in (1, 2)",
        ["Emp"],
    )
    assert got == want and len(got) > 0


def test_like_contains_semantics(session, engine):
    got = _rows(session.execute("select e.empName from Emp e where e.descript like 'abc'"))
    # contains, not SQL LIKE: every non-null descript contains "abc"
    want = _duck(
        engine, "select empName from Emp where descript like '%abc%'", ["Emp"]
    )
    assert got == want and len(got) == 8


def test_or_nesting(session, engine):
    sql = (
        "select e.empName from Emp e "
        "where e.salary > 1000 and (e.deptId = 1 or e.deptId = 2)"
    )
    got = _rows(session.execute(sql))
    want = _duck(
        engine,
        "select empName from Emp where salary > 1000 and (deptId = 1 or deptId = 2)",
        ["Emp"],
    )
    assert got == want


def test_group_by_with_aggs(session, engine):
    sql = (
        "select count(e.empId), sum(e.salary) sumsal, avg(e.empId) avgid, "
        "min(e.empId) minid, max(e.empId) maxid, d.deptName "
        "from Dept d, Emp e where d.deptId = e.deptId group by d.deptName"
    )
    df = session.execute(sql)
    assert df.columns == ["counteempId", "sumsal", "avgid", "minid", "maxid", "ddeptName"]
    got = _rows(df)
    want = _duck(
        engine,
        "select count(e.empId), sum(e.salary), avg(e.empId), min(e.empId), "
        "max(e.empId), d.deptName from Dept d, Emp e "
        "where d.deptId = e.deptId group by d.deptName",
        ["Dept", "Emp"],
    )
    assert got == want


def test_grand_total(session, engine):
    df = session.execute("select count(e.empId), max(e.salary) from Emp e")
    got = _rows(df)
    want = _duck(engine, "select count(empId), max(salary) from Emp", ["Emp"])
    assert got == want and len(got) == 1


def test_order_by_ascending(session, engine):
    df = session.execute(
        "select e.deptId, e.empName from Emp e order by e.deptId, e.empName"
    )
    got = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.register("Emp", engine.table("Emp").toPandas())
    want = [
        tuple(r)
        for r in con.execute(
            "select deptId, empName from Emp order by deptId asc nulls first, "
            "empName asc nulls first"
        ).fetchall()
    ]
    assert got == want


def test_distinct(session, engine):
    got = _rows(session.execute("select distinct e.deptId from Emp e"))
    want = _duck(engine, "select distinct deptId from Emp", ["Emp"])
    assert got == want


def test_select_star_entity(session):
    df = session.execute("select * from Dept d")
    assert df.columns == ["deptId", "deptName"]
    assert df.count() == 3


def test_in_subquery_semijoin(session, engine):
    got = _rows(
        session.execute(
            "select e.empName from Emp e where e.deptId in [select d.deptId from Dept d]"
        )
    )
    want = _duck(
        engine,
        "select empName from Emp where deptId in (select deptId from Dept)",
        ["Dept", "Emp"],
    )
    assert got == want


def test_window_by_batch(session, engine):
    df = session.execute(
        "select count(e.empId), sum(e.empId) s from Emp e window by e.empId interval = 3"
    )
    got = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.register("Emp", engine.table("Emp").toPandas())
    want = [
        tuple(r)
        for r in con.execute(
            """
            select cnt, s from (
              select count(empId) over w cnt, sum(empId) over w s,
                     row_number() over (order by empId) rn
              from Emp
              window w as (order by empId rows between 2 preceding and current row)
            ) where rn >= 3 order by rn
            """
        ).fetchall()
    ]
    assert got == want


def test_theta_join(session, engine):
    got = _rows(
        session.execute(
            "select d.deptName, e.empName from Dept d, Emp e where d.deptId < e.deptId"
        )
    )
    want = _duck(
        engine,
        "select d.deptName, e.empName from Dept d, Emp e where d.deptId < e.deptId",
        ["Dept", "Emp"],
    )
    assert got == want


def test_three_way_join(session, engine):
    # self-join flavored 3-way to exercise the join-graph builder
    sql = (
        "select d.deptName, e.empName, f.empName fname from Dept d, Emp e, Emp f "
        "where d.deptId = e.deptId and e.empId = f.empId"
    )
    got = _rows(session.execute(sql))
    want = _duck(
        engine,
        "select d.deptName, e.empName, f.empName from Dept d, Emp e, Emp f "
        "where d.deptId = e.deptId and e.empId = f.empId",
        ["Dept", "Emp"],
    )
    assert got == want


def test_strict_compat_aggregates(spark, engine, tmp_path):
    from interference_spark import Engine

    eng = Engine(spark=spark, warehouse=str(tmp_path / "w"), strict_compat=True)
    eng.catalog = engine.catalog  # share tables
    s = eng.session()
    df = s.execute(
        "select sum(e.salary) fsum, sum(e.empId) isum, avg(e.empId) iavg from Emp e"
    )
    row = df.first()
    assert row["fsum"] == 0          # SUM skips float/double inputs
    assert row["isum"] == sum([1, 2, 3, 4, 5, 6, 7, 8, 99])
    assert row["iavg"] == row["isum"] // 9  # integer division


def test_custom_group_function_matrix(spark, engine):
    """D14 custom group functions: alone, mixed with built-ins (split
    aggregation), under HAVING, grand total, unknown-name rejection, and
    batch-only enforcement on SELECT STREAM."""
    import pytest as _pytest

    from interference_spark import errors
    from pyspark.sql import functions as F

    def median(v):
        return float(v.median())

    def vrange(v):
        return float(v.max() - v.min())

    engine.register_group_function("MEDIAN", median, "double")
    engine.register_group_function("VRANGE", vrange, "double")
    s = engine.session()

    got = {
        r["eevent_type"]: (r["m"], r["vr"], r["c"])
        for r in s.execute(
            "select e.event_type, median(e.value) m, vrange(e.value) vr, "
            "count(e.event_id) c from events e group by e.event_type"
        ).collect()
    }
    want_df = (
        engine.table("events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("m"),
            (F.max("value") - F.min("value")).alias("vr"),
            F.count("event_id").alias("c"),
        )
    )
    want = {r["event_type"]: (r["m"], r["vr"], r["c"]) for r in want_df.collect()}
    assert set(got) == set(want)
    for k in got:
        assert got[k][2] == want[k][2]
        assert abs(got[k][0] - want[k][0]) < 1e-9
        assert got[k][1] == want[k][1]

    # HAVING with a custom select aggregate (extras stay JVM-side)
    hv = s.execute(
        "select e.event_type, vrange(e.value) vr from events e "
        "group by e.event_type having count(e.event_id) > 0"
    ).collect()
    assert {r["eevent_type"] for r in hv} == set(want)

    # grand total (no GROUP BY) mixing custom + builtin
    gt = s.execute(
        "select vrange(e.value) vr, count(e.event_id) c from events e"
    ).collect()[0]
    assert gt["c"] == sum(w[2] for w in want.values())

    with _pytest.raises(errors.InvalidColumnDescription):
        s.execute("select nosuch(e.value) x from events e")

    engine.register_table(
        "GfStream", "id long, v double", id_col="id", nocheck=True
    )
    try:
        with _pytest.raises(errors.InvalidParameter):
            s.execute("select stream median(t.v) m, t.id from GfStream t group by t.id")
    finally:
        engine.drop_table("GfStream")


def test_custom_group_function_keeps_null_key_group(spark, engine):
    """The mixed custom+builtin split aggregation must not drop the
    NULL-key group (plain equi-join would: NULL != NULL)."""
    from pyspark.sql import functions as F

    from interference_spark import errors
    import pytest as _pytest

    def vrange(v):
        return float(v.max() - v.min())

    engine.register_group_function("VRANGE2", vrange, "double")
    engine.register_table("NullG", "id long, tag string, v double", id_col="id")
    s = engine.session()
    try:
        s.persist("NullG", [
            {"id": 1, "tag": "a", "v": 1.0},
            {"id": 2, "tag": "a", "v": 5.0},
            {"id": 3, "tag": None, "v": 2.0},
            {"id": 4, "tag": None, "v": 10.0},
        ])
        s.commit()
        got = {
            r["ttag"]: (r["vr"], r["c"])
            for r in s.execute(
                "select t.tag, vrange2(t.v) vr, count(t.id) c "
                "from NullG t group by t.tag"
            ).collect()
        }
        assert got == {"a": (4.0, 2), None: (8.0, 2)}
        # clear DISTINCT rejection for custom functions too
        with _pytest.raises(errors.InvalidColumnDescription, match="DISTINCT"):
            s.execute("select vrange2(distinct t.v) x from NullG t group by t.tag")
    finally:
        engine.drop_table("NullG")


def test_group_by_same_named_columns_from_two_tables(spark, engine):
    """Grouping on same-named columns of two joined tables must not raise
    AMBIGUOUS_REFERENCE (group keys get unique internal aliases)."""
    engine.register_table("GA", "id long, key string, v long", id_col="id")
    engine.register_table("GB", "id long, key string, w long", id_col="id")
    s = engine.session()
    try:
        s.persist("GA", [{"id": 1, "key": "x", "v": 1}, {"id": 2, "key": "y", "v": 2}])
        s.persist("GB", [{"id": 1, "key": "x", "w": 10}, {"id": 2, "key": "y", "w": 20}])
        s.commit()
        rows = s.execute(
            "select a.key ak, b.key bk, count(a.id) c from GA a, GB b "
            "where a.key = b.key group by a.key, b.key"
        ).collect()
        got = {(r["ak"], r["bk"]): r["c"] for r in rows}
        assert got == {("x", "x"): 1, ("y", "y"): 1}
    finally:
        engine.drop_table("GA")
        engine.drop_table("GB")


def test_left_join_extension(session, engine):
    """LEFT [OUTER] JOIN extension: null-preserving outer semantics with a
    join-time value condition, DuckDB-cross-checked; grammar errors raise
    the typed taxonomy."""
    import pytest as _pytest

    from interference_spark import errors

    df = session.execute(
        "select d.deptName, e.empName from Dept d left join Emp e "
        "on d.deptId = e.deptId and e.salary > 2000.0"
    )
    assert df.columns == ["ddeptName", "eempName"]
    got = _rows(df)
    want = _duck(
        engine,
        "select d.deptName, e.empName from Dept d left join Emp e "
        "on d.deptId = e.deptId and e.salary > 2000.0",
        ["Dept", "Emp"],
    )
    assert got == want
    # at least one dept has no emp over 2000 -> null-extended row survives
    assert any(r[1] is None for r in got)

    # LEFT OUTER JOIN spelling parses identically
    df2 = session.execute(
        "select d.deptName, e.empName from Dept d left outer join Emp e "
        "on d.deptId = e.deptId and e.salary > 2000.0"
    )
    assert _rows(df2) == got

    for bad, exc in [
        ("select d.deptName from Dept d left join Emp e on e.salary > 1.0",
         errors.InvalidSQLStatement),          # no join key in ON
        ("select d.deptName from Dept d, Emp x left join Emp e on d.deptId = e.deptId",
         errors.InvalidSQLStatement),          # comma mixing
        ("select d.deptName from Dept d left join Emp e",
         errors.InvalidSQLStatement),          # missing ON
        ("select d.deptName from Dept d left join Emp e "
         "on d.deptId = e.deptId or e.salary > 1.0",
         errors.InvalidSQLStatement),          # OR in ON
        ("select stream e.empName from Emp e left join Dept d "
         "on e.deptId = d.deptId",
         errors.InvalidSQLStatement),          # streaming
    ]:
        with _pytest.raises(exc):
            session.execute(bad)


def test_right_and_full_join_extension(session, engine):
    """RIGHT and FULL [OUTER] JOIN directions share the LEFT JOIN grammar;
    null extension lands on the correct side(s)."""
    got_r = _rows(session.execute(
        "select e.empName, d.deptName from Emp e right join Dept d "
        "on e.deptId = d.deptId and e.salary > 2000.0"
    ))
    want_r = _duck(
        engine,
        "select e.empName, d.deptName from Emp e right join Dept d "
        "on e.deptId = d.deptId and e.salary > 2000.0",
        ["Dept", "Emp"],
    )
    assert got_r == want_r
    assert any(r[0] is None for r in got_r)      # dept kept, emp null side

    got_f = _rows(session.execute(
        "select e.empName, d.deptName from Emp e full outer join Dept d "
        "on e.deptId = d.deptId and e.salary > 2000.0"
    ))
    want_f = _duck(
        engine,
        "select e.empName, d.deptName from Emp e full outer join Dept d "
        "on e.deptId = d.deptId and e.salary > 2000.0",
        ["Dept", "Emp"],
    )
    assert got_f == want_f
    assert any(r[0] is None for r in got_f) and any(r[1] is None for r in got_f)


def test_outer_join_on_forward_reference_rejected(session):
    import pytest as _pytest

    from interference_spark import errors

    with _pytest.raises(errors.InvalidSQLStatement):
        session.execute(
            "select d.deptName from Dept d "
            "left join Emp e on d.deptId = f.deptId "
            "left join Emp f on d.deptId = f.deptId"
        )


def test_outer_join_keywords_inside_literals(session, engine):
    """Join keywords inside string literals must not split the FROM span:
    the scanner is quote-aware (round-4 advice — the old regex split was
    quote-blind and a literal containing 'left join' or 'on' broke the
    table parse)."""
    sql = (
        "select d.deptName, e.empName from Dept d left join Emp e "
        "on d.deptId = e.deptId and e.empName <> 'a LEFT JOIN b ON x FULL'"
    )
    got = _rows(session.execute(sql))
    want = _duck(engine, sql, ["Dept", "Emp"])
    assert got == want


def test_outer_join_on_requires_equality_key(session):
    """A theta-only ON (no column = column equality) is rejected — it
    would otherwise plan a broadcast-nested-loop outer join, which the
    grammar promises not to produce (round-4 advice)."""
    import pytest as _pytest

    from interference_spark import errors

    with _pytest.raises(errors.InvalidSQLStatement):
        session.execute(
            "select d.deptName from Dept d left join Emp e "
            "on d.deptId < e.deptId"
        )
    with _pytest.raises(errors.InvalidSQLStatement):
        session.execute(
            "select d.deptName from Dept d left join Emp e "
            "on d.deptId <> e.deptId and e.salary > 1.0"
        )
