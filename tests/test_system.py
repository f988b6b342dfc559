"""System statements (reference sql/SQLSystem.java:45-170, dispatched from
sql/SQLStatementFactory.java:55-72) through Session.execute."""

import pytest

from interference_spark import Engine
from interference_spark.errors import InvalidSQLStatement
from interference_spark.session import SystemResult


@pytest.fixture()
def session(spark, tmp_path):
    e = Engine(spark=spark, warehouse=str(tmp_path / "wh"))
    e.register_table("t", "id long, v string", id_col="id")
    return e.session()


def test_commit_statement_flushes_staged(session):
    session.persist("t", {"id": 1, "v": "a"})
    r = session.execute("COMMIT")
    assert isinstance(r, SystemResult) and r.message == "committed"
    assert session.engine.table("t").count() == 1


def test_rollback_statement_discards(session):
    session.persist("t", {"id": 2, "v": "b"})
    r = session.execute("rollback;")
    assert r.message == "rolled back"
    assert session.engine.table("t").count() == 0


def test_check_storage_reports(session):
    r = session.execute("ALTER SYSTEM CHECK STORAGE")
    assert "ok" in r.message and "1 tables" in r.message


def test_drop_storage_drops_managed_only(session):
    session.persist("t", {"id": 1, "v": "a"})
    session.commit()
    session.execute("ALTER SYSTEM DROP STORAGE")
    assert "t" not in session.engine.catalog


def test_connect_and_logout(session):
    assert session.execute("CONNECT admin/secret").message == "connected"
    with pytest.raises(InvalidSQLStatement):
        session.execute("CONNECT adminonly")
    assert session.execute("ALTER SESSION LOGOUT").message == "session closed"


def test_lifecycle_noops(session):
    for stmt in ("STARTUP INSTANCE", "FREEZE", "ALTER SYSTEM INIT STORAGE"):
        assert "no-op" in session.execute(stmt).message


def test_non_system_still_parses(session):
    session.persist("t", {"id": 3, "v": "c"})
    session.commit()
    assert session.execute("select t.v from t t where t.id = 3").count() == 1


def test_content_queue_drains_in_id_order(session):
    for i in (3, 1, 2):
        session.persist("t", {"id": i, "v": f"v{i}"})
    session.commit()
    ids = [r.id for r in session.content_queue("t")]
    assert ids == [1, 2, 3]


def test_explain_statement(session):
    """EXPLAIN (extension): formatted Catalyst physical plan for batch SQL;
    streams/PROCESS rejected."""
    import pytest

    from interference_spark import errors

    session.persist("t", {"id": 1, "v": "a"})
    session.commit()
    plan = session.execute("explain select t.id, t.v from t t where t.id = 1")
    assert isinstance(plan, str)
    assert "Physical Plan" in plan and "Scan parquet" in plan
    with pytest.raises(errors.InvalidParameter):
        session.execute("explain select stream t.v from t t")


def test_catalog_survives_engine_restart(spark, tmp_path):
    """Managed table definitions (schema, @Id, @NoCheck, @Threshold) are
    durable: a NEW Engine over the same warehouse sees every registered
    table and its data — the reference's persistent system catalog."""
    from interference_spark import Engine

    wh = str(tmp_path / "wh")
    e1 = Engine(spark=spark, warehouse=wh)
    e1.register_table(
        "durable_t", "id long, v string", id_col="id", threshold=1000
    )
    s = e1.session()
    s.persist("durable_t", [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    s.commit()

    e2 = Engine(spark=spark, warehouse=wh)  # fresh engine, same warehouse
    td = e2.catalog.get("durable_t")
    assert td.managed and td.id_col == "id" and td.threshold == 1000
    assert {(r.id, r.v) for r in e2.table("durable_t").collect()} == {
        (1, "a"), (2, "b"),
    }
    # upsert through the restarted engine still works by @Id
    s2 = e2.session()
    s2.persist("durable_t", {"id": 2, "v": "B"})
    s2.commit()
    assert {(r.id, r.v) for r in e2.table("durable_t").collect()} == {
        (1, "a"), (2, "B"),
    }


def test_reregister_same_schema_idempotent_different_raises(spark, tmp_path):
    from interference_spark import Engine, errors

    e = Engine(spark=spark, warehouse=str(tmp_path / "wh2"))
    td1 = e.register_table("rr_t", "id long, v string", id_col="id")
    td2 = e.register_table("rr_t", "id long, v string", id_col="id")  # no-op
    assert td2 is td1
    with pytest.raises(errors.InvalidTableDescription):
        e.register_table("rr_t", "id long, v string, extra long", id_col="id")
    e.drop_table("rr_t")
    e.register_table("rr_t", "id long, v string, extra long", id_col="id")
    assert len(e.catalog.get("rr_t").require_schema().fields) == 3


def test_describe_table_statement(session):
    session.persist("t", {"id": 1, "v": "x"})
    session.commit()
    msg = session.execute("DESCRIBE TABLE t").message
    assert "id bigint" in msg and "v string" in msg
    assert "managed" in msg and "1 parts" in msg and "id_col=id" in msg
