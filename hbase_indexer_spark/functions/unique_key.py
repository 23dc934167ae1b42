"""Document unique-key formatters.

Reproduces the reference's UniqueKeyFormatter family:

- string formatter: parts joined with '-'; ONLY the three-part KeyValue id
  escapes hyphens inside parts as ``\\-`` (the row-only id does not) —
  reference StringUniqueKeyFormatter.java:24-66 (hyphenEscapingFormatter is
  used solely by formatKeyValue/unformatKeyValue) and
  BaseUniqueKeyFormatter.java:51-88 (split regex ``(?<!\\\\)-``).
- hex formatter: each part hex-encoded (lowercase, as Java's Hex.encodeHexString)
  then joined with '-' — HexUniqueKeyFormatter.java:21-36.
- table-aware variants prepend the formatted table name —
  UniqueTableKeyFormatter use sites Indexer.java:269-274,312-317.

All are pure Catalyst expressions (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEPARATOR = "-"


def escape_part(col: Column) -> Column:
    """Escape '-' as '\\-' inside one id part (StringUniqueKeyFormatter.java:48-56)."""
    return F.regexp_replace(col, "-", r"\\-")


def unescape_part(col: Column) -> Column:
    return F.regexp_replace(col, r"\\-", "-")


def format_row_string(row: Column) -> Column:
    """Row-mode doc id: the rowkey string, unescaped (formatRow has no escaping)."""
    return row.cast("string")


def format_keyvalue_string(row: Column, family: Column, qualifier: Column) -> Column:
    """Column-mode doc id: 'row-family-qualifier' with hyphen-escaped parts."""
    return F.concat_ws(
        SEPARATOR, escape_part(row.cast("string")), escape_part(family.cast("string")),
        escape_part(qualifier.cast("string")),
    )


def _hex(col: Column) -> Column:
    return F.lower(F.hex(col.cast("string").cast("binary")))


def format_row_hex(row: Column) -> Column:
    return _hex(row)


def format_keyvalue_hex(row: Column, family: Column, qualifier: Column) -> Column:
    # hex parts can never contain '-', so no escaping needed (matches reference)
    return F.concat_ws(SEPARATOR, _hex(row), _hex(family), _hex(qualifier))


def with_table(table: Column, formatted: Column, hex_mode: bool = False) -> Column:
    """Table-aware id: formatted table name prepended (UniqueTableKeyFormatter)."""
    t = _hex(table) if hex_mode else escape_part(table.cast("string"))
    return F.concat_ws(SEPARATOR, t, formatted)


FORMATTERS = {
    "string": (format_row_string, format_keyvalue_string),
    "hex": (format_row_hex, format_keyvalue_hex),
}


def row_formatter(name: str):
    return FORMATTERS[name][0]


def keyvalue_formatter(name: str):
    return FORMATTERS[name][1]


# ---------------------------------------------------------------------------
# Unformat (the bidirectional half of the UniqueKeyFormatter contract:
# unformatRow/unformatKeyValue/unformatTable drive delete routing for
# multi-table indexers — UniqueKeyFormatter.java:1-77, use sites
# Indexer.java:367-379,439-443; split regex BaseUniqueKeyFormatter.java:31)
# ---------------------------------------------------------------------------

# the reference splits on '-' not preceded by a backslash: (?<!\)-
_SPLIT_PATTERN = r"(?<!\\)-"


def split_id(col: Column) -> Column:
    """Formatted id -> array of still-escaped parts."""
    return F.split(col, _SPLIT_PATTERN)


def unformat_keyvalue_string(col: Column) -> Column:
    """'row-family-qualifier' (escaped) -> struct(row, family, qualifier)."""
    parts = split_id(col)
    return F.struct(
        unescape_part(parts[0]).alias("row"),
        unescape_part(parts[1]).alias("family"),
        unescape_part(parts[2]).alias("qualifier"),
    )


def _unhex_str(col: Column) -> Column:
    return F.unhex(col).cast("string")


def unformat_row_hex(col: Column) -> Column:
    return _unhex_str(col)


def unformat_keyvalue_hex(col: Column) -> Column:
    parts = split_id(col)
    return F.struct(
        _unhex_str(parts[0]).alias("row"),
        _unhex_str(parts[1]).alias("family"),
        _unhex_str(parts[2]).alias("qualifier"),
    )


def unformat_table(col: Column, hex_mode: bool = False) -> Column:
    """Table-qualified id -> its table-name component (first part)."""
    first = split_id(col)[0]
    return _unhex_str(first) if hex_mode else unescape_part(first)
