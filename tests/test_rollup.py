"""Incremental materialized rollups (dml/rollup.py): correctness of the
partial-aggregate merge, the O(new files) incremental path, the rebuild
fallback on deletes/rewrites, the commit protocol, and warehouse restart.
"""

import os

import pytest

from interference_spark import Engine
from interference_spark.dml import store
from interference_spark.errors import InvalidParameter


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark=spark, warehouse=str(tmp_path / "wh"))


def _mk_table(eng, name="meas"):
    td = eng.register_table(
        name, "id long, grp string, v long", id_col="id", nocheck=True
    )
    return td


AGGS = {
    "cnt": ("count", None),
    "v_sum": ("sum", "v"),
    "v_min": ("min", "v"),
    "v_max": ("max", "v"),
}


def _as_dict(df):
    return {
        r["grp"]: (r["cnt"], r["v_sum"], r["v_min"], r["v_max"])
        for r in df.collect()
    }


def _full_agg(eng, table):
    from pyspark.sql import functions as F

    return _as_dict(
        eng.table(table)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
    )


def test_create_and_incremental_refresh(eng):
    td = _mk_table(eng)
    store.append_rows(td, [{"id": i, "grp": "ab"[i % 2], "v": i} for i in range(100)])
    st = eng.create_rollup("r1", "meas", ["grp"], AGGS)
    assert st["mode"] == "initial"
    assert _as_dict(eng.rollup("r1")) == _full_agg(eng, "meas")

    # two more appended part files → refresh reads ONLY those two
    store.append_rows(td, [{"id": 100 + i, "grp": "b", "v": -5} for i in range(10)])
    store.append_rows(td, [{"id": 200 + i, "grp": "c", "v": 7} for i in range(3)])
    st = eng.refresh_rollup("r1")
    assert st == {"mode": "incremental", "files_read": 2}
    assert _as_dict(eng.rollup("r1")) == _full_agg(eng, "meas")

    # nothing new → noop, state unchanged
    assert eng.refresh_rollup("r1") == {"mode": "noop", "files_read": 0}
    assert _as_dict(eng.rollup("r1")) == _full_agg(eng, "meas")


def test_untouched_parts_not_read_on_refresh(eng, spark):
    """The incremental path must not even OPEN already-applied part files:
    corrupt them on disk and refresh must still succeed."""
    td = _mk_table(eng)
    store.append_rows(td, [{"id": i, "grp": "a", "v": i} for i in range(10)])
    eng.create_rollup("r1", "meas", ["grp"], AGGS)
    for p in store._parts(td):
        with open(p, "wb") as fh:
            fh.write(b"not parquet anymore")
    store.append_rows(td, [{"id": 100, "grp": "a", "v": 5}])
    st = eng.refresh_rollup("r1")
    assert st == {"mode": "incremental", "files_read": 1}
    got = _as_dict(eng.rollup("r1"))
    assert got == {"a": (11, 50, 0, 9)}


def test_delete_triggers_rebuild(eng):
    td = _mk_table(eng)
    store.append_rows(td, [{"id": i, "grp": "a", "v": i} for i in range(10)])
    eng.create_rollup("r1", "meas", ["grp"], AGGS)
    # tombstone the max row: min/max cannot be decremented → full rebuild
    store.add_tombstone_ids(td, [9])
    st = eng.refresh_rollup("r1")
    assert st["mode"] == "rebuild"
    assert _as_dict(eng.rollup("r1")) == {"a": (9, 36, 0, 8)} == _full_agg(eng, "meas")


def test_upsert_rewrite_triggers_rebuild(eng, spark):
    td = eng.register_table("meas", "id long, grp string, v long", id_col="id")
    store.append_rows(td, [{"id": i, "grp": "a", "v": i} for i in range(10)])
    eng.create_rollup("r1", "meas", ["grp"], AGGS)
    # upsert rewrites the part containing id 3 → applied file vanishes
    s = eng.session()
    s.persist("meas", {"id": 3, "grp": "a", "v": 1000})
    s.commit()
    st = eng.refresh_rollup("r1")
    assert st["mode"] == "rebuild"
    assert _as_dict(eng.rollup("r1")) == _full_agg(eng, "meas")


def test_reappended_dead_id_filtered_from_delta(eng):
    """Delta rows carrying an id that is already tombstoned must not be
    double-counted (read_managed would hide them; so must the delta)."""
    td = _mk_table(eng)
    store.append_rows(td, [{"id": i, "grp": "a", "v": i} for i in range(5)])
    store.add_tombstone_ids(td, [4])
    eng.create_rollup("r1", "meas", ["grp"], AGGS)
    assert _as_dict(eng.rollup("r1")) == {"a": (4, 6, 0, 3)}
    # tombstone set unchanged; new part re-appends the dead id
    store.append_rows(td, [{"id": 4, "grp": "a", "v": 100}, {"id": 10, "grp": "a", "v": 2}])
    st = eng.refresh_rollup("r1")
    assert st["mode"] == "incremental"
    assert _as_dict(eng.rollup("r1")) == _full_agg(eng, "meas") == {"a": (5, 8, 0, 3)}


def test_sql_expression_aggs(eng):
    td = _mk_table(eng)
    store.append_rows(td, [{"id": i, "grp": "a", "v": i} for i in range(4)])
    eng.create_rollup(
        "rx", "meas", ["grp"], {"v2_sum": ("sum", "v * 2"), "cnt": ("count", None)}
    )
    rows = {r["grp"]: (r["v2_sum"], r["cnt"]) for r in eng.rollup("rx").collect()}
    assert rows == {"a": (12, 4)}


def test_survives_engine_restart(eng, spark, tmp_path):
    td = _mk_table(eng)
    store.append_rows(td, [{"id": 1, "grp": "a", "v": 3}])
    eng.create_rollup("r1", "meas", ["grp"], AGGS)
    eng2 = Engine(spark=spark, warehouse=eng.warehouse)
    store.append_rows(eng2.catalog.get("meas"), [{"id": 2, "grp": "a", "v": 5}])
    assert eng2.refresh_rollup("r1")["mode"] == "incremental"
    assert _as_dict(eng2.rollup("r1")) == {"a": (2, 8, 3, 5)}
    # exactly one state dir remains after the commit protocol
    rdir = os.path.join(eng.warehouse, "_rollup_r1")
    states = [d for d in os.listdir(rdir) if d.startswith("state-")]
    assert len(states) == 1


def test_validation_errors(eng, spark):
    _mk_table(eng)
    with pytest.raises(InvalidParameter):
        eng.create_rollup("bad", "meas", ["grp"], {"x": ("median", "v")})
    eng.register_parquet("ext", "/root/testdata/sf0.001/nation.parquet")
    with pytest.raises(InvalidParameter):
        eng.create_rollup("bad2", "ext", ["n_name"], AGGS)
    with pytest.raises(InvalidParameter):
        eng.refresh_rollup("never_created")
    eng.create_rollup("dup", "meas", ["grp"], AGGS)
    with pytest.raises(InvalidParameter):
        eng.create_rollup("dup", "meas", ["grp"], AGGS)


def test_kmv_distinct_sketch_merges_exactly(eng, spark):
    """KMV mergeability: min-k(distinct(A ∪ B)) == merge(min-k(A), min-k(B))
    — the incrementally maintained sketch must equal the sketch of the full
    data, and the estimate is exact below k."""
    from pyspark.sql import functions as F

    from interference_spark.dml import rollup, store
    from interference_spark.pipeline.sketch import kmv_hash

    td = eng.register_table(
        "km", "id long, grp string, u long", id_col="id", nocheck=True
    )
    # two halves with overlapping users; 'a' has 30 distinct (< k=16? no —
    # use k=16 so group 'a' (30 users) estimates, 'b' (8 users) is exact
    store.append_rows(
        td, [{"id": i, "grp": "a", "u": i % 30} for i in range(60)]
        + [{"id": 100 + i, "grp": "b", "u": i % 8} for i in range(20)]
    )
    eng.create_rollup(
        "rk", "km", ["grp"],
        {"cnt": ("count", None), "uk": ("kmv", "u", 16)},
    )
    store.append_rows(
        td, [{"id": 200 + i, "grp": "a", "u": 15 + (i % 30)} for i in range(40)]
    )
    assert eng.refresh_rollup("rk")["mode"] == "incremental"

    # reference sketch computed from the FULL table in one shot
    full = (
        eng.table("km")
        .select("grp", kmv_hash(F.col("u")).alias("hv"))
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("hv")
    want = {
        r["grp"]: r["arr"]
        for r in full.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 16")
        .groupBy("grp")
        .agg(F.sort_array(F.collect_list("hv")).alias("arr"))
        .collect()
    }
    got = {r["grp"]: list(r["uk"]) for r in eng.rollup("rk").collect()}
    assert got == {g: list(a) for g, a in want.items()}

    # estimate: exact below k ('b' has 8 < 16 distinct users)
    est = {
        r["grp"]: r["est"]
        for r in eng.rollup("rk")
        .select("grp", rollup.kmv_estimate("uk", 16).alias("est"))
        .collect()
    }
    assert est["b"] == 8.0
    assert est["a"] > 16  # 45 true distinct; KMV estimate is in the ballpark
    assert 20 < est["a"] < 90


def test_cms_sketch_merges_additively(eng, spark):
    """CMS mergeability: the incrementally maintained counter table equals
    the from-scratch sketch of the full data (cell-wise), and estimates
    upper-bound true frequencies."""
    from pyspark.sql import functions as F

    from interference_spark.dml import rollup, store

    td = eng.register_table(
        "cm", "id long, grp string, u long", id_col="id", nocheck=True
    )
    store.append_rows(
        td,
        [{"id": i, "grp": "a", "u": i % 7} for i in range(70)]
        + [{"id": 100 + i, "grp": "b", "u": 3} for i in range(5)],
    )
    eng.create_rollup(
        "rc", "cm", ["grp"], {"cm_u": ("cms", "u", 32, 4), "cnt": ("count", None)}
    )
    store.append_rows(td, [{"id": 200 + i, "grp": "a", "u": 3} for i in range(30)])
    assert eng.refresh_rollup("rc")["mode"] == "incremental"

    # reference: from-scratch per-key sketch over the full table
    from interference_spark.pipeline.sketch import _cms_probes

    full = (
        eng.table("cm")
        .select("grp", F.explode(_cms_probes(F.col("u"), 32, 4)).alias("p"))
        .groupBy("grp", (F.col("p.d") * 32 + F.col("p.b")).alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    want = {}
    for r in full.collect():
        want.setdefault(r["grp"], [0] * 128)[r["cell"]] = r["cnt"]
    got = {r["grp"]: list(r["cm_u"]) for r in eng.rollup("rc").collect()}
    assert got == want

    # estimates: u=3 appears 40x in 'a' (10 + 30 incremental), 5x in 'b';
    # CMS only over-counts, and with 70+30 rows in 32 buckets the exact
    # value is the common case
    est = {
        r["grp"]: r["e"]
        for r in eng.rollup("rc")
        .select("grp", rollup.cms_estimate("cm_u", F.lit(3), 32, 4).alias("e"))
        .collect()
    }
    assert est["a"] >= 40 and est["b"] >= 5
    # sanity: estimate for a never-seen value in 'b' is bounded by its
    # total row count (5)
    est99 = {
        r["grp"]: r["e"]
        for r in eng.rollup("rc")
        .select("grp", rollup.cms_estimate("cm_u", F.lit(99), 32, 4).alias("e"))
        .collect()
    }
    assert 0 <= est99["b"] <= 5


def test_hist_sketch_merges_additively(eng, spark):
    """Histogram mergeability: the incrementally maintained bin array must
    equal the histogram of the full data, and hist_quantile over the state
    must equal the from-scratch estimate."""
    from pyspark.sql import functions as F

    from interference_spark.dml import rollup, store
    from interference_spark.pipeline.sketch import hist_bin, hist_group_quantiles

    td = eng.register_table(
        "hm", "id long, grp string, v double", id_col="id", nocheck=True
    )
    store.append_rows(
        td,
        [{"id": i, "grp": "a", "v": float((i * 37) % 100)} for i in range(80)]
        + [{"id": 200 + i, "grp": "b", "v": float(i)} for i in range(20)],
    )
    eng.create_rollup(
        "rh", "hm", ["grp"],
        {"cnt": ("count", None), "vh": ("hist", "v", 0.0, 100.0, 32)},
    )
    store.append_rows(
        td, [{"id": 400 + i, "grp": "a", "v": float((i * 11) % 100)} for i in range(40)]
    )
    assert eng.refresh_rollup("rh")["mode"] == "incremental"

    # stored bin arrays == from-scratch histogram of the full table
    full = (
        eng.table("hm")
        .groupBy("grp", hist_bin(F.col("v"), 0.0, 100.0, 32).alias("bin"))
        .count()
        .collect()
    )
    want = {}
    for r in full:
        want.setdefault(r["grp"], [0] * 32)[r["bin"]] += r["count"]
    got = {r["grp"]: list(r["vh"]) for r in eng.rollup("rh").collect()}
    assert got == want

    # read-time quantiles == from-scratch hist_group_quantiles
    scratch = {
        r["grp"]: (r["q_5"], r["q_9"])
        for r in hist_group_quantiles(
            eng.table("hm"), ("grp",), "v", (0.5, 0.9), 0.0, 100.0, 32
        ).collect()
    }
    via_state = {
        r["grp"]: (r["p50"], r["p90"])
        for r in eng.rollup("rh")
        .select(
            "grp",
            rollup.hist_quantile("vh", 0.5, 0.0, 100.0, 32).alias("p50"),
            rollup.hist_quantile("vh", 0.9, 0.0, 100.0, 32).alias("p90"),
        )
        .collect()
    }
    assert via_state == scratch
