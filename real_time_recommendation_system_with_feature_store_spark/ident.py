"""Hostile-identifier safety.

``F.col("a.b")`` resolves ``a.b`` as struct-field access, ``a b``/``a'b``
parse fine as Column names but explode inside any ``F.expr``/f-string SQL
an operator builds. A 100 TB lake inherits column names from upstream
producers — dots (flattened JSON), spaces (CSV headers), quotes — so every
operator that receives *user-supplied* column names must resolve them
through backtick quoting, never raw ``F.col``/``F.expr`` interpolation.

Spark's quoting rule: wrap in backticks, double any literal backtick.
(Same rule the Scala ``quoteIdentifier`` helper applies,
sql/catalyst/.../util/package.scala — public Spark source.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for embedding in SQL/`F.expr` text."""
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str) -> Column:
    """Column reference that treats ``name`` as ONE identifier — dots and
    all — instead of a nested-field path."""
    return F.col(quote_ident(name))
