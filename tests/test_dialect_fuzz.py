"""Property-based dialect fuzzing: random WHERE-condition trees compiled by
the dialect (parser → compiler → Catalyst) must return exactly the rows
DuckDB returns for the translated ANSI predicate.

Covers the predicate surface of SURVEY §2.2 (P4, P5, P7, P8, P10) beyond the
hand-written fixtures: arbitrary nesting (one connective kind per level, as
the reference requires), typed literals, IN lists, contains-LIKE.
"""

import os
import sys

import duckdb
import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# randomized DuckDB-oracle sweep: slow lane with the entry oracles
pytestmark = pytest.mark.oracle

SF_DIR = "/root/testdata/sf0.001"

# (dialect rendering, duckdb rendering) per leaf predicate; literals drawn
# from real column values so matches actually occur
NUM_COLS = ["o_orderkey", "o_custkey", "o_totalprice"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
NUM_OPS = ["=", "<>", "<", ">", "<=", ">="]
STR_OPS = ["=", "<>"]

_vals = {}


def _col_vals(duck, col):
    if col not in _vals:
        _vals[col] = [
            r[0]
            for r in duck.execute(
                f"SELECT DISTINCT {col} FROM orders ORDER BY {col} LIMIT 20"
            ).fetchall()
        ]
    return _vals[col]


class _DuckOracle:
    """DuckDB connection proxy that survives DuckDB-internal crashes.

    DuckDB 1.0.0 has an optimizer bug: an OR of structurally identical
    AND branches mixing ``<>`` with BETWEEN over a parquet scan raises
    InternalException ("Attempted to dereference unique_ptr that is
    NULL!") and invalidates the whole database, so every later query on
    the connection dies too (reproduced on a bare connection with no
    Spark in the process — the bug is in the ORACLE, not the engine
    under test).  A crashing example proves nothing about the dialect,
    so: reconnect and discard the example via ``assume(False)``.
    """

    def __init__(self):
        self._connect()

    def _connect(self):
        self._con = duckdb.connect()
        for t in ("orders", "customer", "nation"):
            self._con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )

    def execute(self, sql):
        try:
            return self._con.execute(sql)
        except (duckdb.InternalException, duckdb.FatalException):
            try:
                self._con.close()
            except Exception:  # noqa: BLE001 — already invalidated
                pass
            self._connect()
            assume(False)  # oracle crashed; this example decides nothing


@pytest.fixture(scope="module")
def duck():
    return _DuckOracle()


@pytest.fixture(scope="module")
def engine(spark):
    from interference_spark import Engine

    e = Engine(spark=spark)
    e.register_sf_dir(SF_DIR)
    return e


def _fmt_num(v):
    return repr(float(v)) if isinstance(v, float) else repr(int(v))


@st.composite
def leaf(draw):
    kind = draw(st.sampled_from(["num", "str", "in", "like", "between"]))
    if kind == "num":
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(NUM_OPS))
        return ("cmp", col, op)
    if kind == "str":
        col = draw(st.sampled_from(STR_COLS))
        op = draw(st.sampled_from(STR_OPS))
        return ("cmp", col, op)
    if kind == "in":
        col = draw(st.sampled_from(NUM_COLS[:2] + STR_COLS))
        k = draw(st.integers(min_value=1, max_value=3))
        return ("in", col, k)
    if kind == "between":
        col = draw(st.sampled_from(NUM_COLS))
        return ("between", col, None)
    col = draw(st.sampled_from(STR_COLS))
    return ("like", col, None)


cond_tree = st.recursive(
    leaf(),
    lambda children: st.tuples(
        st.sampled_from(["AND", "OR"]),
        st.lists(children, min_size=2, max_size=3),
    ),
    max_leaves=6,
)


def _render(node, duck, draw_val):
    """→ (dialect_sql, duckdb_sql)."""
    if isinstance(node, tuple) and node[0] in ("AND", "OR"):
        op, kids = node
        parts = [_render(k, duck, draw_val) for k in kids]
        d = "(" + f" {op.lower()} ".join(p[0] for p in parts) + ")"
        s = "(" + f" {op} ".join(p[1] for p in parts) + ")"
        return d, s
    kind, col, extra = node
    vals = _col_vals(duck, col)
    if kind == "cmp":
        v = draw_val(vals)
        if isinstance(v, str):
            return f"o.{col} {extra} '{v}'", f"{col} {extra} '{v}'"
        return f"o.{col} {extra} {_fmt_num(v)}", f"{col} {extra} {_fmt_num(v)}"
    if kind == "in":
        vs = [draw_val(vals) for _ in range(extra)]
        if isinstance(vs[0], str):
            dial = ", ".join(f"'{v}'" for v in vs)
            return f"o.{col} in [{dial}]", f"{col} IN ({dial})"
        dial = ", ".join(_fmt_num(v) for v in vs)
        return f"o.{col} in [{dial}]", f"{col} IN ({dial})"
    if kind == "between":
        a, b = sorted([draw_val(vals), draw_val(vals)])
        return (
            f"o.{col} between {_fmt_num(a)} and {_fmt_num(b)}",
            f"{col} BETWEEN {_fmt_num(a)} AND {_fmt_num(b)}",
        )
    # contains-LIKE: substring of a real value
    v = str(draw_val(vals))
    sub = v[: max(1, len(v) // 2)]
    return (
        f"o.{col} like '{sub}'",
        f"position('{sub}' IN {col}) > 0",
    )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tree=cond_tree, data=st.data())
def test_random_condition_tree_matches_duckdb(tree, data, duck, engine):
    draw_val = lambda vals: data.draw(st.sampled_from(vals))
    dial, ansi = _render(tree, duck, draw_val)
    got = {
        r.oo_orderkey
        for r in engine.session()
        .execute(f"select o.o_orderkey from orders o where {dial}")
        .collect()
    }
    want = {
        r[0]
        for r in duck.execute(
            f"SELECT o_orderkey FROM orders WHERE {ansi}"
        ).fetchall()
    }
    assert got == want, f"dialect: {dial!r}"


VALID = "select o.o_orderkey from orders o where o.o_totalprice > 1000.0 group by o.o_orderkey order by o.o_orderkey"


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_mutated_sql_raises_typed_errors_only(data, engine):
    """Any mutation of a valid statement either parses (and compiles to a
    DataFrame) or raises a typed SQLException from the reference's error
    taxonomy — never an arbitrary crash (reference sqlexception/*.java)."""
    from interference_spark.errors import SQLException, StorageException

    s = VALID
    for _ in range(data.draw(st.integers(min_value=1, max_value=4))):
        kind = data.draw(st.sampled_from(["del", "dup", "swap", "insert"]))
        i = data.draw(st.integers(min_value=0, max_value=max(0, len(s) - 2)))
        if kind == "del":
            s = s[:i] + s[i + data.draw(st.integers(min_value=1, max_value=8)):]
        elif kind == "dup":
            s = s[:i] + s[i:i + 6] + s[i:]
        elif kind == "swap":
            j = data.draw(st.integers(min_value=0, max_value=max(0, len(s) - 1)))
            ls = list(s)
            ls[i], ls[j] = ls[j], ls[i]
            s = "".join(ls)
        else:
            s = s[:i] + data.draw(st.sampled_from([",", "(", ")", "'", " where ", "*"])) + s[i:]
    try:
        engine.session().execute(s)
    except (SQLException, StorageException):
        pass  # typed, expected


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_grouped_aggregate_matches_duckdb(data, duck, engine):
    """Random GROUP BY aggregates over integral-valued columns (exact in
    IEEE double under any summation order) must match DuckDB."""
    aggs = data.draw(
        st.lists(
            st.tuples(
                st.sampled_from(["COUNT", "SUM", "MIN", "MAX"]),
                st.sampled_from(["o_orderkey", "o_custkey"]),
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    gcol = data.draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    sel_d = ", ".join(
        f"{f.lower()}(o.{c}) a{i}" for i, (f, c) in enumerate(aggs)
    )
    sel_s = ", ".join(f"{f}({c}) AS a{i}" for i, (f, c) in enumerate(aggs))
    got = {
        tuple(r)
        for r in engine.session()
        .execute(f"select {sel_d}, o.{gcol} from orders o group by o.{gcol}")
        .collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"SELECT {sel_s}, {gcol} FROM orders GROUP BY {gcol}"
        ).fetchall()
    }
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_having_matches_duckdb(data, duck, engine):
    """Random HAVING trees over integral aggregates (extension) must keep
    exactly the groups DuckDB keeps."""
    gcol = data.draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    n_leaves = data.draw(st.integers(min_value=1, max_value=2))
    conn = data.draw(st.sampled_from([" and ", " or "]))
    leaves = []
    for _ in range(n_leaves):
        f = data.draw(st.sampled_from(["COUNT", "SUM", "MIN", "MAX"]))
        c = data.draw(st.sampled_from(["o_orderkey", "o_custkey"]))
        op = data.draw(st.sampled_from(["=", "<>", "<", ">", "<=", ">="]))
        v = data.draw(st.integers(min_value=0, max_value=10_000_000))
        leaves.append((f, c, op, v))
    h_d = conn.join(f"{f.lower()}(o.{c}) {op} {v}" for f, c, op, v in leaves)
    h_s = conn.upper().join(f"{f}({c}) {op} {v}" for f, c, op, v in leaves)
    got = {
        tuple(r)
        for r in engine.session().execute(
            f"select count(o.o_orderkey) a0, o.{gcol} from orders o "
            f"group by o.{gcol} having {h_d}"
        ).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"SELECT COUNT(o_orderkey) AS a0, {gcol} FROM orders "
            f"GROUP BY {gcol} HAVING {h_s}"
        ).fetchall()
    }
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_setop_matches_duckdb(data, duck, engine):
    """Random two-operand set operations (extension) must match DuckDB as
    MULTISETS (UNION ALL keeps duplicates; the rest deduplicate)."""
    from collections import Counter

    op = data.draw(st.sampled_from(["union", "union all", "intersect", "except"]))
    ca = data.draw(st.sampled_from(STR_COLS))
    cb = data.draw(st.sampled_from(STR_COLS))
    ta = data.draw(st.integers(min_value=0, max_value=600_000))
    tb = data.draw(st.integers(min_value=0, max_value=600_000))
    got = Counter(
        r[0]
        for r in engine.session().execute(
            f"select o.{ca} from orders o where o.o_totalprice >= {ta}.0 "
            f"{op} select o.{cb} from orders o where o.o_totalprice < {tb}.0"
        ).collect()
    )
    want = Counter(
        r[0]
        for r in duck.execute(
            f"SELECT {ca} AS x FROM orders WHERE o_totalprice >= {ta} "
            f"{op.upper()} SELECT {cb} AS x FROM orders WHERE o_totalprice < {tb}"
        ).fetchall()
    )
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_limit_matches_duckdb(data, duck, engine):
    """ORDER BY unique-key LIMIT k (extension) is a deterministic top-k —
    identical row set in both engines."""
    k = data.draw(st.integers(min_value=1, max_value=50))
    t = data.draw(st.integers(min_value=0, max_value=400_000))
    got = [
        r[0]
        for r in engine.session().execute(
            f"select o.o_orderkey from orders o where o.o_totalprice >= {t}.0 "
            f"order by o.o_orderkey limit {k}"
        ).collect()
    ]
    want = [
        r[0]
        for r in duck.execute(
            f"SELECT o_orderkey FROM orders WHERE o_totalprice >= {t} "
            f"ORDER BY o_orderkey LIMIT {k}"
        ).fetchall()
    ]
    assert got == want


# dialect scalar fn → (applicable cols, duckdb rendering). ROUND excluded:
# Spark HALF_UP vs DuckDB half-even differ on ties. TO_CHAR excluded:
# engine-specific double formatting.
SCALAR_FNS = {
    "upper": (STR_COLS, "upper({c})"),
    "lower": (STR_COLS, "lower({c})"),
    "trim": (STR_COLS, "trim({c})"),
    "length": (STR_COLS, "length({c})"),
    "abs": (NUM_COLS, "abs({c})"),
    "floor": (["o_totalprice"], "floor({c})"),
    "ceil": (["o_totalprice"], "ceil({c})"),
    "year": (["o_orderdate"], "year({c})"),
    "month": (["o_orderdate"], "month({c})"),
    "day": (["o_orderdate"], "day({c})"),
}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_scalar_funcs_match_duckdb(data, duck, engine):
    """Random scalar-function select lists (extension) — including scalar
    GROUP BY keys — must match DuckDB as multisets. int/float equality is
    Python-numeric (5 == 5.0), which absorbs BIGINT-vs-INT width diffs."""
    from collections import Counter

    fns = data.draw(
        st.lists(st.sampled_from(sorted(SCALAR_FNS)), min_size=1, max_size=3)
    )
    items_d, items_s = [], []
    for i, fn in enumerate(fns):
        cols, duck_tpl = SCALAR_FNS[fn]
        c = data.draw(st.sampled_from(cols))
        items_d.append(f"{fn}(o.{c}) a{i}")
        items_s.append(duck_tpl.format(c=c) + f" AS a{i}")
    t = data.draw(st.integers(min_value=0, max_value=400_000))
    grouped = data.draw(st.booleans())
    if grouped:
        # one scalar group key + count, dialect vs ANSI
        fn = data.draw(st.sampled_from(["year", "month"]))
        got = Counter(
            tuple(r)
            for r in engine.session().execute(
                f"select {fn}(o.o_orderdate) g0, count(o.o_orderkey) c0 "
                f"from orders o where o.o_totalprice >= {t}.0 "
                f"group by {fn}(o.o_orderdate)"
            ).collect()
        )
        want = Counter(
            tuple(r)
            for r in duck.execute(
                f"SELECT {fn}(o_orderdate) AS g0, COUNT(o_orderkey) AS c0 "
                f"FROM orders WHERE o_totalprice >= {t} "
                f"GROUP BY {fn}(o_orderdate)"
            ).fetchall()
        )
    else:
        got = Counter(
            tuple(r)
            for r in engine.session().execute(
                f"select {', '.join(items_d)} from orders o "
                f"where o.o_totalprice >= {t}.0"
            ).collect()
        )
        want = Counter(
            tuple(r)
            for r in duck.execute(
                f"SELECT {', '.join(items_s)} FROM orders WHERE o_totalprice >= {t}"
            ).fetchall()
        )
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_count_distinct_matches_duckdb(data, duck, engine):
    """COUNT(DISTINCT col) extension under random group keys and random
    WHERE literals must match DuckDB exactly."""
    gcol = data.draw(st.sampled_from(["o_orderstatus", "o_orderpriority"]))
    dcol = data.draw(st.sampled_from(["o_custkey", "o_orderkey", "o_orderstatus"]))
    t = data.draw(st.integers(min_value=0, max_value=600_000))
    got = {
        tuple(r)
        for r in engine.session().execute(
            f"select o.{gcol}, count(distinct o.{dcol}) dc, "
            f"count(o.o_orderkey) c from orders o "
            f"where o.o_totalprice >= {t}.0 group by o.{gcol}"
        ).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"SELECT {gcol} AS g, COUNT(DISTINCT {dcol}) AS dc, "
            f"COUNT(o_orderkey) AS c FROM orders "
            f"WHERE o_totalprice >= {t} GROUP BY {gcol}"
        ).fetchall()
    }
    assert got == want


# ---------------------------------------------------------------- GROUP BY
AGG_FNS = ["COUNT", "SUM", "MIN", "MAX", "AVG"]
GROUP_COLS = ["o_orderstatus", "o_orderpriority", "o_custkey"]
AGG_COLS = ["o_orderkey", "o_totalprice"]


def _agg_sql(fn, col):
    if fn == "COUNT":
        return f"count({col})"
    if fn == "AVG":
        return f"avg({col})"
    return f"{fn.lower()}({col})"


@given(
    gcol=st.sampled_from(GROUP_COLS),
    aggs=st.lists(
        st.tuples(st.sampled_from(AGG_FNS), st.sampled_from(AGG_COLS)),
        min_size=1, max_size=3, unique=True,
    ),
    having=st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
)
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzz_group_by_aggregates(engine, duck, gcol, aggs, having):
    """Random GROUP BY + aggregate sets (+ optional HAVING count(pk) > n)
    must match DuckDB exactly — values, not just row counts. AVG compares
    with a tolerance (sum-order float division); others exactly."""
    sel = ", ".join(
        f"{fn.lower()}(o.{col}) a{i}" for i, (fn, col) in enumerate(aggs)
    )
    d_sel = ", ".join(
        f"{_agg_sql(fn, col)} AS a{i}" for i, (fn, col) in enumerate(aggs)
    )
    hv = f" having count(o.o_orderkey) > {having}" if having is not None else ""
    d_hv = f" HAVING count(o_orderkey) > {having}" if having is not None else ""
    q = f"select o.{gcol} g, {sel} from orders o group by o.{gcol}{hv}"
    dq = f"SELECT {gcol} AS g, {d_sel} FROM orders GROUP BY {gcol}{d_hv}"
    s = engine.session()
    got = {r[0]: tuple(r)[1:] for r in s.execute(q).collect()}
    want = {r[0]: tuple(r)[1:] for r in duck.execute(dq).fetchall()}
    assert set(got) == set(want)
    for k in got:
        for i, ((fn, _c), g, w) in enumerate(zip(aggs, got[k], want[k])):
            if fn == "AVG":
                assert g == pytest.approx(w, rel=1e-9), (k, i)
            else:
                assert g == w or g == pytest.approx(w, rel=1e-12), (k, i)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_multiway_join_matches_duckdb(data, duck, engine):
    """Random 2-3 way joins through the dialect (comma-FROM + WHERE join
    conditions, SURVEY §2.3 J1-J8): equi-join chains with optional theta
    condition and random value predicates must match DuckDB row for row,
    including the alias-concatenated output names."""
    three_way = data.draw(st.booleans())
    theta = data.draw(st.booleans())
    vc_num = data.draw(st.sampled_from([None] + NUM_COLS))
    conds_d = ["o.o_custkey = c.c_custkey"]
    conds_a = ["o.o_custkey = c.c_custkey"]
    tables_d = "orders o, customer c"
    proj_d = "o.o_orderkey, c.c_name"
    proj_a = "o.o_orderkey AS oo_orderkey, c.c_name AS cc_name"
    if three_way:
        tables_d += ", nation n"
        conds_d.append("c.c_nationkey = n.n_nationkey")
        conds_a.append("c.c_nationkey = n.n_nationkey")
        proj_d += ", n.n_name"
        proj_a += ", n.n_name AS nn_name"
    if theta:
        # non-equi join condition → nested-loops path (reference J8)
        conds_d.append("o.o_custkey < c.c_custkey")
        conds_a.append("o.o_custkey < c.c_custkey")
    if vc_num is not None:
        v = data.draw(st.sampled_from(_col_vals(duck, vc_num)))
        conds_d.append(f"o.{vc_num} >= {_fmt_num(v)}")
        conds_a.append(f"o.{vc_num} >= {_fmt_num(v)}")
    dial = (
        f"select {proj_d} from {tables_d} where "
        + " and ".join(conds_d)
    )
    ansi = (
        f"SELECT {proj_a} FROM {tables_d} WHERE "
        + " AND ".join(conds_a)
    )
    sdf = engine.session().execute(dial)
    got = sorted(tuple(r) for r in sdf.collect())
    want = sorted(tuple(r) for r in duck.execute(ansi).fetchall())
    dcols = [d[0] for d in duck.execute(ansi).description]
    assert sdf.columns == dcols, f"output naming diverged: {sdf.columns}"
    assert got == want, f"dialect: {dial!r}"


# ---------------------------------------------------------------- outer joins
_CUST_NUM = ["c_custkey", "c_nationkey", "c_acctbal"]
_ORD_NUM = ["o_custkey", "o_totalprice"]


def _join_val_cond(duck, data):
    """One simple ON value-condition '<alias>.<col> <op> <num>' rendered
    for the dialect and for DuckDB."""
    alias, col = data.draw(
        st.sampled_from(
            [("o", c) for c in _ORD_NUM] + [("c", c) for c in _CUST_NUM]
        )
    )
    table = "orders" if alias == "o" else "customer"
    vals = [
        r[0]
        for r in duck.execute(
            f"SELECT DISTINCT {col} FROM {table} ORDER BY {col} LIMIT 20"
        ).fetchall()
    ]
    op = data.draw(st.sampled_from(NUM_OPS))
    v = _fmt_num(data.draw(st.sampled_from(vals)))
    return f"{alias}.{col} {op} {v}", f"{alias}.{col} {op} {v}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_random_outer_joins_match_duckdb(data, duck, engine):
    """LEFT/RIGHT/FULL [OUTER] JOIN with a random flat AND of ON
    value-conditions must return exactly DuckDB's rows (incl. the
    null-extended side)."""
    how = data.draw(st.sampled_from(["left", "right", "full"]))
    outer = data.draw(st.sampled_from(["", " outer"]))
    n_conds = data.draw(st.integers(min_value=0, max_value=2))
    conds = [_join_val_cond(duck, data) for _ in range(n_conds)]
    on_dial = " and ".join(
        ["o.o_custkey = c.c_custkey"] + [c[0] for c in conds]
    )
    on_ansi = " AND ".join(
        ["o.o_custkey = c.c_custkey"] + [c[1] for c in conds]
    )
    dial = (
        f"select o.o_orderkey, c.c_custkey from orders o "
        f"{how}{outer} join customer c on {on_dial}"
    )
    ansi = (
        f"SELECT o.o_orderkey, c.c_custkey FROM orders o "
        f"{how.upper()} JOIN customer c ON {on_ansi}"
    )
    got = sorted(
        ((r.oo_orderkey, r.cc_custkey) for r in engine.session().execute(dial).collect()),
        key=str,
    )
    want = sorted(((r[0], r[1]) for r in duck.execute(ansi).fetchall()), key=str)
    assert got == want, f"dialect: {dial!r}"


@settings(
    max_examples=1,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(probe=st.just(None))
def test_duck_oracle_survives_internal_crash(probe, duck):
    """The known DuckDB 1.0.0 optimizer crash (OR of twin AND branches
    with <> + BETWEEN over a parquet scan) must not take the shared
    oracle connection down with it: the proxy reconnects and the next
    query works.  If a future DuckDB fixes the bug, the crashing query
    simply succeeds and this still passes."""
    from hypothesis.errors import UnsatisfiedAssumption

    crash = (
        "SELECT o_orderkey FROM orders WHERE "
        "(o_orderstatus <> 'F' AND o_custkey BETWEEN 0 AND 0) OR "
        "(o_orderstatus <> 'F' AND o_custkey BETWEEN 0 AND 0)"
    )
    try:
        duck.execute(crash).fetchall()
    except UnsatisfiedAssumption:
        pass  # expected on DuckDB 1.0.0: example discarded, DB rebuilt
    assert duck.execute("SELECT count(*) FROM orders").fetchall()[0][0] > 0
