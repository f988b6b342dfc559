"""External source formats (SURVEY §2.1 S11): the reference reads only its
own frame files; on Spark csv/json/orc register as first-class tables and
join with parquet through the dialect."""

import os

import pytest

from interference_spark import Engine


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sources")
    e = Engine(spark=spark)
    e.register_sf_dir("/root/testdata/sf0.001")

    spark.createDataFrame(
        [(0, "AFRICA-X"), (1, "AMERICA-X"), (2, "ASIA-X"), (3, "EUROPE-X"), (4, "MIDEAST-X")],
        "rkey int, label string",
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(
        str(tmp / "labels_csv")
    )
    e.register_external(
        "region_labels",
        str(tmp / "labels_csv"),
        format="csv",
        schema="rkey int, label string",
        header=True,
    )

    spark.createDataFrame(
        [(0, 10.0), (1, 20.0)], "rkey int, weight double"
    ).coalesce(1).write.mode("overwrite").json(str(tmp / "weights_json"))
    e.register_external(
        "region_weights",
        str(tmp / "weights_json"),
        format="json",
        schema="rkey int, weight double",
    )

    spark.createDataFrame(
        [(0, "o"), (1, "o2")], "rkey int, note string"
    ).coalesce(1).write.mode("overwrite").orc(str(tmp / "notes_orc"))
    e.register_external(
        "region_notes", str(tmp / "notes_orc"), format="orc"
    )
    return e


def test_csv_reads_with_schema(eng):
    rows = eng.table("region_labels").collect()
    assert len(rows) == 5
    assert {r.label for r in rows} >= {"ASIA-X", "EUROPE-X"}


def test_csv_joins_parquet_via_dialect(eng):
    s = eng.session()
    df = s.execute(
        "select r.r_name, l.label from region r, region_labels l "
        "where r.r_regionkey = l.rkey"
    )
    rows = df.collect()
    assert len(rows) == 5
    assert set(df.columns) == {"rr_name", "llabel"}


def test_json_source(eng):
    got = {(r.rkey, r.weight) for r in eng.table("region_weights").collect()}
    assert got == {(0, 10.0), (1, 20.0)}


def test_orc_source_infers_schema(eng):
    assert eng.table("region_notes").count() == 2


def test_external_partitioned_dir_prunes_in_dialect(spark, engine, tmp_path):
    """register_external over a write_time_partitioned layout: the dialect
    query's WHERE on the partition column becomes a PartitionFilter."""
    import re
    import uuid

    from pyspark.sql import functions as F

    from interference_spark.inventory import engine_for
    from interference_spark.pipeline.partitioning import write_time_partitioned

    ev = engine_for(spark, "/root/testdata/sf0.001").table("events")
    path = str(tmp_path / "ev_days")
    write_time_partitioned(ev, path, "ts", granularity="day")

    name = f"EvDays{uuid.uuid4().hex[:8]}"
    engine.register_external(
        name, path, format="parquet",
        schema="event_id long, ts timestamp, user_id long, event_type string, "
               "value double, props string, __bucket date",
    )
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    df = engine.session().execute(
        f"select e.event_id, e.user_id from {name} e "
        f"where e.__bucket = '10.01.2024'"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]\n]*)\]", plan)
    assert m and "__bucket" in m.group(1), plan
    want = ev.filter(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-11")
    ).count()
    assert df.count() == want


def test_external_table_handle_is_cached_managed_is_not(spark, tmp_path):
    """r11 optimization: external (immutable) tables return the SAME
    DataFrame handle per TableDef — per-call file listing + parquet
    schema inference was measured at 120-240 ms and is pure waste on
    read-only sources.  Managed tables must keep re-listing their parts
    (DML changes them between reads), and re-registering a name must
    invalidate the cached handle."""
    import uuid

    from interference_spark.inventory import engine_for

    e = engine_for(spark, "/root/testdata/sf0.001")
    assert e.table("lineitem") is e.table("lineitem")

    # managed: new rows must be visible through a fresh read
    from interference_spark.dml import store

    name = f"CacheProbe{uuid.uuid4().hex[:8]}"
    td = e.register_table(name, "id long, v long", id_col="id", nocheck=True)
    store.append_rows(td, [{"id": 1, "v": 10}])
    assert e.table(name).count() == 1
    store.append_rows(td, [{"id": 2, "v": 20}])
    assert e.table(name).count() == 2

    # re-registration installs a fresh TableDef -> fresh handle
    import shutil

    src = "/root/testdata/sf0.001/region.parquet"
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    shutil.copy(src, p1)
    shutil.copy(src, p2)
    ename = f"CacheExt{uuid.uuid4().hex[:8]}"
    e.register_external(ename, p1, format="parquet")
    h1 = e.table(ename)
    e.register_external(ename, p2, format="parquet")
    assert e.table(ename) is not h1
