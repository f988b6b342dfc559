import os

import pytest

from interference_spark import Engine, build_spark

SF_DIR = os.environ.get("IFS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = build_spark(
        app_name="ifs-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def engine(spark, tmp_path_factory):
    eng = Engine(spark=spark, warehouse=str(tmp_path_factory.mktemp("warehouse")))
    eng.register_sf_dir(SF_DIR)
    _register_fixture_entities(eng)
    return eng


@pytest.fixture()
def session(engine):
    s = engine.session()
    yield s
    s.close()


def _register_fixture_entities(eng: Engine) -> None:
    """FIXTURES.md family A: dept / emp / event cookbook entities."""
    import datetime as dt

    dept = eng.register_table(
        "Dept", "deptId int, deptName string", id_col="deptId"
    )
    emp = eng.register_table(
        "Emp",
        "empId long, deptId int, empName string, salary double, "
        "hireDate timestamp, descript string",
        id_col="empId",
    )
    from interference_spark.dml import store

    store.append_rows(
        dept,
        [
            {"deptId": 1, "deptName": "Engineering"},
            {"deptId": 2, "deptName": "Sales"},
            {"deptId": 3, "deptName": "Support"},
        ],
    )
    names = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi"]
    rows = []
    for i, nm in enumerate(names, start=1):
        rows.append(
            {
                "empId": i,
                "deptId": (i % 3) + 1,
                "empName": nm,
                "salary": 900.0 + i * 50.25,
                "hireDate": dt.datetime(2020, 1, i, 9, 0, 0),
                "descript": f"likes abc{i % 2} and xyz",
            }
        )
    rows.append(
        {
            "empId": 99,
            "deptId": None,
            "empName": None,
            "salary": None,
            "hireDate": None,
            "descript": None,
        }
    )
    store.append_rows(emp, rows)
