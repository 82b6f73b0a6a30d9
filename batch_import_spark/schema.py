"""In-band header schema + type system of the reference, on Spark.

The reference declares schema in the first CSV row as
``name[:type[:indexName]]`` (AbstractLineData.java:39-58, split on
``:``); types are the ``Type`` enum (Type.java:5-182) and conversion is
fail-fast per cell (readme.md:41-42 "Conversion failure will result in
abort"). We map each reference type to a Spark type and build column
expressions that reproduce the conversion semantics:

- scalar numeric types: ANSI ``cast`` (throws on bad input = fail-fast;
  Spark 4 has ANSI on by default — we assert it rather than trust it);
- ``boolean``: Java ``Boolean.valueOf`` semantics (Type.java:20-25) —
  case-insensitive "true" → true, ANYTHING else → false, never fails;
- ``char``: first character (Type.java:62-67);
- ``label``: trim + split on ``\\s*,\\s*`` (Type.java:13-19), NOT a
  property;
- ``id``: long parse (Type.java:6-12), NOT a property;
- ``*_array``: split on a configurable separator (default ``,``,
  Config.java:24-25) then element-wise convert (Type.java:74-168).

Null/empty cells convert to SQL NULL and are *omitted* from the
property map (AbstractLineData.java:147, RowDataTest.java:19-45).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# reference Type enum names → Spark element types (Type.java:5-182)
_SCALAR_TYPES: dict[str, T.DataType] = {
    "id": T.LongType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "byte": T.ByteType(),
    "short": T.ShortType(),
    "char": T.StringType(),
    "string": T.StringType(),
}

_ARRAY_SUFFIX = "_array"

# labels are comma-split with surrounding whitespace trimmed (Type.java:16)
_LABEL_SPLIT_RE = r"\s*,\s*"


@dataclass(frozen=True)
class HeaderField:
    """One parsed header entry: ``name[:type[:indexName]]``.

    Mirrors LineData.Header (LineData.java:9-28). The reference is
    positional so duplicate names are legal (sample/rels.csv declares
    ``name:string:users`` twice); ``col_name`` is the unique DataFrame
    column name while ``name`` stays the declared property/key name.
    """

    column: int
    name: str
    type_name: str = "string"  # Type.java:170-171 default STRING
    index_name: str | None = None
    col_name: str = ""

    def __post_init__(self):
        if not self.col_name:
            object.__setattr__(self, "col_name", self.name)

    @property
    def is_id(self) -> bool:
        return self.type_name == "id"

    @property
    def is_label(self) -> bool:
        return self.type_name == "label"

    @property
    def is_property(self) -> bool:
        # Type.java: id.isProperty()=false, label.isProperty()=false
        return not (self.is_id or self.is_label)

    @property
    def is_indexed(self) -> bool:
        return self.index_name is not None

    def spark_type(self) -> T.DataType:
        return reference_type_to_spark(self.type_name)


def parse_header_field(raw: str, column: int) -> HeaderField:
    """Parse one ``name[:type[:indexName]]`` header token.

    Split on ``:`` (AbstractLineData.java:44); missing type defaults to
    string; a third part names the exact index the column feeds.
    """
    parts = raw.split(":")
    name = parts[0].strip()
    type_name = parts[1].strip().lower() if len(parts) > 1 and parts[1].strip() else "string"
    index_name = parts[2].strip() if len(parts) > 2 and parts[2].strip() else None
    if type_name not in _SCALAR_TYPES and type_name != "label" and not (
        type_name.endswith(_ARRAY_SUFFIX) and type_name[: -len(_ARRAY_SUFFIX)] in _SCALAR_TYPES
    ):
        raise ValueError(f"unknown reference type {type_name!r} in header field {raw!r}")
    return HeaderField(column=column, name=name, type_name=type_name, index_name=index_name)


def parse_header(fields: list[str]) -> list[HeaderField]:
    parsed = [parse_header_field(raw, i) for i, raw in enumerate(fields)]
    seen: dict[str, int] = {}
    out = []
    for h in parsed:
        n = seen.get(h.name, 0)
        seen[h.name] = n + 1
        col_name = h.name if n == 0 else f"{h.name}__{h.column}"
        out.append(
            HeaderField(
                column=h.column,
                name=h.name,
                type_name=h.type_name,
                index_name=h.index_name,
                col_name=col_name,
            )
        )
    return out


def reference_type_to_spark(type_name: str) -> T.DataType:
    if type_name == "label":
        return T.ArrayType(T.StringType())
    if type_name.endswith(_ARRAY_SUFFIX):
        elem = type_name[: -len(_ARRAY_SUFFIX)]
        return T.ArrayType(_SCALAR_TYPES[elem])
    return _SCALAR_TYPES[type_name]


def _convert_scalar(col: Column, type_name: str) -> Column:
    """Column expression reproducing Type.convert for one scalar cell."""
    if type_name == "string":
        return col  # identity bypass (Type.java:179)
    if type_name == "boolean":
        # Boolean.valueOf: case-insensitive 'true' → true, else false;
        # null stays null (empty cell = no property)
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(
            F.lower(col) == "true"
        )
    if type_name == "char":
        # value.charAt(0) (Type.java:62-67): Java THROWS on an empty
        # string (StringIndexOutOfBounds → import aborts); match that
        # fail-fast instead of silently yielding "". Null passes through
        # (empty cell = no property happens before conversion).
        return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
            F.when(
                F.length(col) >= 1, F.substring(col, 1, 1)
            ).otherwise(F.raise_error(F.lit("char conversion of empty string")))
        )
    # id/int/long/double/float/byte/short: ANSI cast = fail-fast parse
    return col.cast(_SCALAR_TYPES[type_name])


def convert_column(col: Column, type_name: str, array_separator: str = ",") -> Column:
    """Typed conversion expression for a raw string column.

    Arrays: split on the configured separator then convert each element
    (Type.java:74-168; custom separator tested ImporterTest.java:166-175).
    """
    if type_name == "label":
        return F.split(F.trim(col), _LABEL_SPLIT_RE)
    if type_name.endswith(_ARRAY_SUFFIX):
        elem = type_name[: -len(_ARRAY_SUFFIX)]
        import re as _re

        parts = F.split(col, _re.escape(array_separator))
        return F.transform(parts, lambda x: _convert_scalar(x, elem))
    return _convert_scalar(col, type_name)


def assert_ansi(spark) -> None:
    """Fail-fast conversion requires ANSI mode (SURVEY.md §4: Spark's
    legacy default silently nulls bad casts — a semantic divergence)."""
    if spark.conf.get("spark.sql.ansi.enabled", "false").lower() != "true":
        spark.conf.set("spark.sql.ansi.enabled", "true")
