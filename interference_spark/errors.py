"""SQL error taxonomy.

Mirrors the reference's typed SQL exceptions (reference:
``src/main/java/su/interference/sqlexception/*.java`` — 24 classes) so that
callers can catch the same validation surface.  Storage-level exceptions
(``su/interference/exception/*.java``) collapse to :class:`StorageException`
subclasses — most of them (frame headers, undo chunks) have no analogue in a
Spark/Parquet engine.
"""

from __future__ import annotations

__all__ = [
    "SQLException",
    "AmbiguousColumnName",
    "ConstraintViolation",
    "ForeignKeyViolation",
    "InvalidColumnDescription",
    "InvalidCondition",
    "InvalidConditionValue",
    "InvalidGroupByPart",
    "InvalidGroupColumnSet",
    "InvalidOrderByPart",
    "InvalidSQLStatement",
    "InvalidTableDescription",
    "InvalidWindowByPart",
    "MissingFromClause",
    "MissingRightParenthesis",
    "MissingTableInSerializableMode",
    "MissingTablesDescription",
    "MissingWithinClause",
    "NotNullViolation",
    "PrimaryKeyViolation",
    "TooManyNestedConditions",
    "UnableToLockTableForProcess",
    "UnexpectedEndOfStatement",
    "UniqueConstraintViolation",
    "StorageException",
    "InvalidParameter",
    "TableNotRegistered",
]


class SQLException(Exception):
    """Base of the SQL validation taxonomy (sqlexception/SQLException.java)."""


class AmbiguousColumnName(SQLException):
    pass


class ConstraintViolation(SQLException):
    pass


class ForeignKeyViolation(ConstraintViolation):
    pass


class InvalidColumnDescription(SQLException):
    pass


class InvalidCondition(SQLException):
    pass


class InvalidConditionValue(SQLException):
    pass


class InvalidGroupByPart(SQLException):
    pass


class InvalidGroupColumnSet(SQLException):
    pass


class InvalidOrderByPart(SQLException):
    pass


class InvalidSQLStatement(SQLException):
    pass


class InvalidTableDescription(SQLException):
    pass


class InvalidWindowByPart(SQLException):
    pass


class MissingFromClause(SQLException):
    pass


class MissingRightParenthesis(SQLException):
    pass


class MissingTableInSerializableMode(SQLException):
    pass


class MissingTablesDescription(SQLException):
    pass


class MissingWithinClause(SQLException):
    pass


class NotNullViolation(ConstraintViolation):
    pass


class PrimaryKeyViolation(ConstraintViolation):
    pass


class TooManyNestedConditions(SQLException):
    pass


class UnableToLockTableForProcess(SQLException):
    pass


class UnexpectedEndOfStatement(SQLException):
    pass


class UniqueConstraintViolation(ConstraintViolation):
    pass


class StorageException(Exception):
    """Base of storage-level errors (exception/InternalException.java et al.)."""


class InvalidParameter(StorageException):
    pass


class TableNotRegistered(StorageException):
    """No reference analogue (tables are JVM classes there); raised when a
    query names a table absent from the catalog."""


class SnapshotUnavailable(StorageException):
    """A table snapshot references part files that no longer exist (expired
    by vacuum after its pins were dropped) or an unknown snapshot id."""
