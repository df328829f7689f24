"""Shared helpers for operators that assemble SQL strings (the r18
single-parse program builds hot expression trees as one F.expr /
selectExpr parse each; identifiers and literals are interpolated into
those strings).

r18 ADVICE hardening: bare backtick wrapping (f"`{name}`") produced a
parse error or a WRONG REFERENCE for a column name containing a
backtick, where the Column API tolerated any name — `quote_ident`
escapes embedded backticks by doubling them. String literals embedded
in generated SQL (named_struct field names, the bucket interval) keep
validation instead of escaping: Spark's default parser treats
backslash escapes inside single-quoted literals, so rejecting quotes
and backslashes with a meaningful error beats emitting a literal whose
escaping rules depend on spark.sql.parser.escapedStringLiterals.
"""

from __future__ import annotations


def quote_ident(name: str) -> str:
    """Backtick-quote ``name`` for embedding in generated SQL; embedded
    backticks are doubled (the SQL identifier escape), so any column
    name the Column API accepts round-trips through the parsed form."""
    return "`" + str(name).replace("`", "``") + "`"


def validate_sql_literal(value: str, what: str) -> str:
    """Reject quote/backslash characters in a string that is about to
    be embedded as a single-quoted SQL literal — a meaningful error at
    the operator boundary instead of a confusing parse failure (or a
    silently different literal) deep inside the generated expression."""
    value = str(value)
    if "'" in value or "\\" in value:
        raise ValueError(
            f"{what} may not contain quotes or backslashes: {value!r}"
        )
    return value
