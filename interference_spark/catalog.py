"""Table registry.

The reference registers JPA-annotated Java classes and derives schema by
reflection (reference: ``persistent/Session.java:181-277``); annotations like
``@Id``, ``@NoCheck``, ``@Threshold`` drive persist/index behaviour
(``core/NoCheck.java``, ``core/Threshold.java``).  Here a table is a named
entry mapping to either

* an **external** parquet path (read-only — the driver's testdata), or
* a **managed** table directory under the engine warehouse (writable via
  :mod:`interference_spark.dml.store`).

Schema is an explicit Spark ``StructType`` (or DDL string) instead of class
reflection; the annotation surface survives as plain keyword metadata.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import types as T

from .errors import InvalidTableDescription, TableNotRegistered


def _as_struct(schema: T.StructType | str | None) -> T.StructType | None:
    if schema is None or isinstance(schema, T.StructType):
        return schema
    parsed = T._parse_datatype_string(schema)
    if not isinstance(parsed, T.StructType):
        raise InvalidTableDescription(f"schema DDL must describe a struct: {schema!r}")
    return parsed


@dataclass
class TableDef:
    """One registered table.

    ``id_col`` ≈ ``@Id`` (upsert key for ``persist``/``find``);
    ``nocheck`` ≈ ``@NoCheck`` (blind append, skip upsert lookup);
    ``threshold`` ≈ ``@Threshold(n)`` (ring buffer retention);
    ``indexes`` ≈ ``@Table(indexes=...)`` — kept as metadata only: Catalyst
    filter pushdown / partition pruning replaces physical index tables
    (reference ``core/IndexFrame.java``).
    """

    name: str
    path: str
    schema: T.StructType | None = None
    managed: bool = False
    id_col: str | None = None
    nocheck: bool = False
    threshold: int | None = None
    indexes: tuple[str, ...] = ()
    partition_cols: tuple[str, ...] = ()
    meta: dict = field(default_factory=dict)

    def require_schema(self) -> T.StructType:
        if self.schema is None:
            raise InvalidTableDescription(f"table {self.name!r} has no schema")
        return self.schema


class Catalog:
    """Name → :class:`TableDef`. Case-sensitive, like the reference
    ("All class and field names are case sensitive" — manual).

    MANAGED table definitions are durable: they persist to
    ``_catalog.json`` in the warehouse on every registration change, and a
    new Engine over the same warehouse reloads them — the analogue of the
    reference's persistent system catalog (its table registry survives
    instance restart; ``persistent/Session.java:181-277`` registration is
    once-per-storage, not once-per-process)."""

    _FILE = "_catalog.json"

    def __init__(self) -> None:
        self._tables: dict[str, TableDef] = {}
        self._warehouse: str | None = None

    def attach_warehouse(self, warehouse: str) -> None:
        """Bind the durable store and reload previously registered managed
        tables (skipping any whose data directory has vanished)."""
        import json

        self._warehouse = warehouse
        fp = os.path.join(warehouse, self._FILE)
        if not os.path.exists(fp):
            return
        with open(fp) as f:
            entries = json.load(f)
        for e in entries:
            if e["name"] in self._tables or not os.path.isdir(e["path"]):
                continue
            schema = (
                T.StructType.fromJson(e["schema"]) if e.get("schema") else None
            )
            self._tables[e["name"]] = TableDef(
                name=e["name"],
                path=e["path"],
                schema=schema,
                managed=True,
                id_col=e.get("id_col"),
                nocheck=bool(e.get("nocheck")),
                threshold=e.get("threshold"),
                indexes=tuple(e.get("indexes", ())),
                partition_cols=tuple(e.get("partition_cols", ())),
            )

    def _save(self) -> None:
        import json

        if self._warehouse is None:
            return
        entries = [
            {
                "name": td.name,
                "path": td.path,
                "schema": td.schema.jsonValue() if td.schema else None,
                "id_col": td.id_col,
                "nocheck": td.nocheck,
                "threshold": td.threshold,
                "indexes": list(td.indexes),
                "partition_cols": list(td.partition_cols),
            }
            for td in self._tables.values()
            if td.managed
        ]
        fp = os.path.join(self._warehouse, self._FILE)
        tmp = fp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entries, f)
        os.replace(tmp, fp)  # atomic: readers never see a torn catalog

    def register(self, td: TableDef) -> TableDef:
        self._tables[td.name] = td
        if td.managed:
            self._save()
        return td

    def unregister(self, name: str) -> None:
        td = self._tables.pop(name, None)
        if td is not None and td.managed:
            self._save()

    def get(self, name: str) -> TableDef:
        # Accept fully-qualified reference-style names
        # ("su.interference.test.entity.Dept") by their last segment too.
        if name in self._tables:
            return self._tables[name]
        tail = name.rsplit(".", 1)[-1]
        if tail in self._tables:
            return self._tables[tail]
        raise TableNotRegistered(f"table {name!r} is not registered")

    def __contains__(self, name: str) -> bool:
        try:
            self.get(name)
            return True
        except TableNotRegistered:
            return False

    def names(self) -> list[str]:
        return sorted(self._tables)

    def register_sf_dir(self, sf_dir: str) -> None:
        """Register every ``<name>.parquet`` in a driver testdata dir.

        Parquet TIMESTAMP(NANOS) columns are illegal for Spark's reader;
        they're detected here (via the pyarrow footer) and converted to
        microsecond timestamps on read (Engine.read_table), with
        ``spark.sql.legacy.parquet.nanosAsLong`` exposing the raw int64.
        """
        import pyarrow.parquet as pq

        for fn in sorted(os.listdir(sf_dir)):
            if fn.endswith(".parquet"):
                name = fn[: -len(".parquet")]
                path = os.path.join(sf_dir, fn)
                nanos = []
                try:
                    asch = pq.read_schema(path)
                    nanos = [
                        f.name
                        for f in asch
                        if str(f.type).startswith("timestamp[ns")
                    ]
                except Exception:
                    pass
                meta = {"nanos_cols": nanos} if nanos else {}
                self.register(TableDef(name=name, path=path, meta=meta))
