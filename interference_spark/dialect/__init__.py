"""Reference-SQL dialect: parser + DataFrame compiler.

The reference parses SQL by upper-cased positional clause slicing with no
grammar/AST (reference ``sql/SQLSelect.java:154-401``); we keep its *language*
(clauses, operators, validation errors, naming rules) but parse into a proper
IR (:mod:`.ast`) and compile to a lazy Spark DataFrame plan so Catalyst does
join selection, predicate pushdown, and column pruning.
"""

from .ast import Query
from .parser import parse
from .compiler import compile_query

__all__ = ["Query", "parse", "compile_query"]
