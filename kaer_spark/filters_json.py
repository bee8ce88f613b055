"""Mongo filter documents over SCHEMALESS (JSON) metadata.

The reference stores metadata as raw BSON documents — any row can carry any
keys with any types (``/root/reference/db/db.go:44-47``: ``metadatas
[]bson.M``).  The typed-column compiler in :mod:`kaer_spark.filters` rejects
mixed-type fields at insert time (``FieldTypeConflict``); this module is the
escape hatch for truly ragged metadata: documents are stored as ONE JSON
string column (``_m_meta``) and filters compile against Spark's VARIANT
type (``parse_json`` + ``try_variant_get``), which — unlike
``get_json_object`` — distinguishes a MISSING key (SQL ``NULL``) from a
present JSON ``null`` (``is_variant_null``), exactly the distinction
Mongo's ``$exists`` / ``{field: null}`` semantics require.

Scale note (100 TB): VARIANT is Spark's columnar semi-structured encoding
(binary-encoded, Parquet-shreddable); parsing happens once per row inside
whole-stage codegen and the resulting predicate is an ordinary Catalyst
boolean — no Python UDF anywhere.  For hot keys, promote them to typed
columns (the typed compiler then gets parquet predicate pushdown); this
module is for the long tail where a schema cannot be declared up front.

Semantics (Mongo-faithful, per operator):

* missing key ≠ null value: ``$exists true`` matches present-null,
  ``$exists false`` matches only missing.
* ``$eq None`` matches missing OR present-null (Mongo: ``{k: null}``).
* numeric operands compare cross-type (``1`` matches ``1.0``) — both
  engines compare through DOUBLE.
* string/bool operands are type-guarded: ``$eq "1"`` does NOT match the
  number 1 (BSON equality is type-bracketed).
* ``$type`` takes Mongo alias names (``"string" "int" "long" "double"
  "bool" "null" "array" "object" "number"``); ``int``/``long``/``number``
  all match any JSON integer (JSON does not distinguish width).

Every compile has a DuckDB twin (``filter_json_to_sql``) over the SAME
JSON text via ``json_extract``/``json_type``, so schemaless queries are
oracle-checkable end to end.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from kaer_spark.filters import FilterError, _is_operator_doc

_COMPARISONS = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}

#: Mongo $type alias → predicate over Spark schema_of_variant() output.
#: schema_of_variant renders JSON ints as BIGINT, JSON decimals as
#: DECIMAL(p,s) or DOUBLE, strings as STRING, null as VOID,
#: arrays/objects as ARRAY<...> / OBJECT<...>.
_SPARK_TYPE_PRED = {
    "string": lambda t: t == "STRING",
    "bool": lambda t: t == "BOOLEAN",
    "null": lambda t: t == "VOID",
    "array": lambda t: t.startswith("ARRAY"),
    "object": lambda t: t.startswith("OBJECT") | t.startswith("STRUCT"),
    "int": lambda t: t == "BIGINT",
    "long": lambda t: t == "BIGINT",
    "double": lambda t: t.startswith("DECIMAL") | (t == "DOUBLE"),
    "number": lambda t: (t == "BIGINT") | t.startswith("DECIMAL") | (t == "DOUBLE"),
}

#: same aliases over DuckDB json_type() output ('BIGINT' 'UBIGINT' 'DOUBLE'
#: 'VARCHAR' 'BOOLEAN' 'NULL' 'ARRAY' 'OBJECT').
_DUCK_TYPE_SQL = {
    "string": "= 'VARCHAR'",
    "bool": "= 'BOOLEAN'",
    "null": "= 'NULL'",
    "array": "= 'ARRAY'",
    "object": "= 'OBJECT'",
    "int": "IN ('BIGINT', 'UBIGINT')",
    "long": "IN ('BIGINT', 'UBIGINT')",
    "double": "= 'DOUBLE'",
    "number": "IN ('BIGINT', 'UBIGINT', 'DOUBLE')",
}


def _path(field: str) -> str:
    # dot notation descends into nested objects, same as the typed compiler's
    # struct access; JSONPath is shared verbatim by Spark variant_get and
    # DuckDB json_extract.
    return "$." + field


def _vget(meta: Column, field: str) -> Column:
    """Variant value of ``field``: SQL NULL iff the key is MISSING."""
    return F.try_variant_get(meta, _path(field), "variant")


def _typed(meta: Column, field: str, sql_type: str) -> Column:
    """Field cast to a concrete type (NULL when missing, null, or uncastable)."""
    return F.try_variant_get(meta, _path(field), sql_type)


def _operand_cast(v: Any) -> tuple[str, str]:
    """(spark cast type, type-guard alias) for a literal operand.

    Every comparison is type-bracketed like BSON: a numeric operand
    matches any JSON number (int or float, via the DOUBLE cast) but never
    a numeric-looking STRING — the try-cast alone would let ``"3"`` match
    3.  bool must be checked before int: Python bool is an int subclass.
    """
    if isinstance(v, bool):
        return "boolean", "bool"
    if isinstance(v, (int, float)):
        return "double", "number"
    if isinstance(v, str):
        return "string", "string"
    raise FilterError(f"unsupported operand type {type(v).__name__} in schemaless filter")


def compile_filter_json(
    filt: Mapping[str, Any] | None, meta_col: str = "_m_meta"
) -> Column:
    """Compile a Mongo filter document against a JSON-string metadata column."""
    if not filt:
        return F.lit(True)
    if not isinstance(filt, Mapping):
        raise FilterError(f"filter must be a dict, got {type(filt).__name__}")
    meta = F.parse_json(F.col(meta_col))
    return _and_all([_clause(meta, k, v) for k, v in filt.items()])


def _and_all(cols: Sequence[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _or_all(cols: Sequence[Column]) -> Column:
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _nullsafe(pred: Column) -> Column:
    return F.coalesce(pred, F.lit(False))


def _clause(meta: Column, key: str, value: Any) -> Column:
    if key == "$and":
        return _and_all([_doc(meta, s) for s in _sublist(key, value)])
    if key == "$or":
        return _or_all([_doc(meta, s) for s in _sublist(key, value)])
    if key == "$nor":
        return ~_or_all([_nullsafe(_doc(meta, s)) for s in _sublist(key, value)])
    if key.startswith("$"):
        raise FilterError(f"unsupported top-level operator: {key}")
    if _is_operator_doc(value):
        return _and_all([_op(meta, key, op, v) for op, v in value.items()])
    return _eq(meta, key, value)


def _doc(meta: Column, filt: Mapping[str, Any]) -> Column:
    return _and_all([_clause(meta, k, v) for k, v in filt.items()])


def _sublist(key: str, value: Any) -> list[Mapping[str, Any]]:
    if not isinstance(value, (list, tuple)) or not value:
        raise FilterError(f"{key} takes a non-empty list of filter documents")
    return list(value)


def _guarded_cmp(meta: Column, field: str, v: Any, cmp) -> Column:
    cast, guard = _operand_cast(v)
    val = _typed(meta, field, cast)
    return _nullsafe(cmp(val) & _type_is(meta, field, guard))


def _eq(meta: Column, field: str, v: Any) -> Column:
    if v is None:
        # Mongo {k: null}: matches missing OR present-null
        raw = _vget(meta, field)
        return raw.isNull() | F.is_variant_null(raw)
    return _guarded_cmp(meta, field, v, lambda val: val == F.lit(v))


def _type_is(meta: Column, field: str, alias: str) -> Column:
    if alias not in _SPARK_TYPE_PRED:
        raise FilterError(f"unsupported $type alias {alias!r}")
    raw = _vget(meta, field)
    t = F.schema_of_variant(raw)
    # present-null renders as VOID; a MISSING field must match no alias
    # (not even "null" — Mongo $type never matches absent fields)
    return _nullsafe(raw.isNotNull() & _SPARK_TYPE_PRED[alias](t))


def _op(meta: Column, field: str, op: str, v: Any) -> Column:
    raw = _vget(meta, field)
    if op == "$eq":
        return _eq(meta, field, v)
    if op == "$ne":
        if v is None:
            return ~(raw.isNull() | F.is_variant_null(raw))
        # missing, null, other-typed, and differing values all "not equal"
        return ~_eq(meta, field, v)
    if op in _COMPARISONS:
        cmp = {
            "$gt": lambda c: c > F.lit(v),
            "$gte": lambda c: c >= F.lit(v),
            "$lt": lambda c: c < F.lit(v),
            "$lte": lambda c: c <= F.lit(v),
        }[op]
        return _guarded_cmp(meta, field, v, cmp)
    if op == "$in":
        if not isinstance(v, (list, tuple)):
            raise FilterError("$in takes a list")
        preds = [_eq(meta, field, x) for x in v]
        return _or_all(preds) if preds else F.lit(False)
    if op == "$nin":
        return ~_op(meta, field, "$in", v)
    if op == "$exists":
        return raw.isNotNull() if v else raw.isNull()
    if op == "$type":
        return _type_is(meta, field, str(v))
    if op == "$not":
        if not _is_operator_doc(v):
            raise FilterError("$not takes an operator document")
        inner = _and_all([_op(meta, field, o, x) for o, x in v.items()])
        return ~_nullsafe(inner)
    if op == "$regex":
        val = _typed(meta, field, "string")
        return _nullsafe(val.rlike(v) & _type_is(meta, field, "string"))
    if op == "$mod":
        if not isinstance(v, (list, tuple)) or len(v) != 2:
            raise FilterError("$mod takes [divisor, remainder]")
        val = _typed(meta, field, "bigint")
        return _nullsafe((val % F.lit(v[0])) == F.lit(v[1]))
    if op == "$size":
        arr = _typed(meta, field, "array<variant>")
        return _nullsafe(F.size(arr) == F.lit(int(v)))
    if op == "$all":
        if not isinstance(v, (list, tuple)):
            raise FilterError("$all takes a list")
        if not v:
            return F.lit(True)
        cast, _ = _operand_cast(v[0])
        arr = _typed(meta, field, f"array<{cast}>")
        return _nullsafe(
            _and_all([F.array_contains(arr, F.lit(x)) for x in v])
        )
    if op == "$elemMatch":
        if not _is_operator_doc(v):
            raise FilterError("$elemMatch takes an operator document")
        # element type from the first operand — per-element ops then reuse
        # the scalar comparison forms over a typed array
        first = next(iter(v.values()))
        cast, _ = _operand_cast(first if not isinstance(first, (list, tuple)) else first[0])
        arr = _typed(meta, field, f"array<{cast}>")

        def elem_pred(x: Column) -> Column:
            preds = []
            for o, operand in v.items():
                if o == "$eq":
                    preds.append(x == F.lit(operand))
                elif o in _COMPARISONS:
                    preds.append(
                        {
                            "$gt": x > F.lit(operand),
                            "$gte": x >= F.lit(operand),
                            "$lt": x < F.lit(operand),
                            "$lte": x <= F.lit(operand),
                        }[o]
                    )
                elif o == "$ne":
                    preds.append(x != F.lit(operand))
                else:
                    raise FilterError(f"$elemMatch does not support {o} in schemaless mode")
            return _and_all(preds)

        return _nullsafe(F.exists(arr, elem_pred))
    raise FilterError(f"unsupported operator {op} on field {field}")


# ---------------------------------------------------------------------------
# DuckDB oracle twin — same semantics over json_extract/json_type
# ---------------------------------------------------------------------------


def filter_json_to_sql(
    filt: Mapping[str, Any] | None, meta_col: str = "_m_meta"
) -> str:
    """Render the same filter as a DuckDB predicate over the JSON column.

    Independent re-implementation (not a stringification of the Spark
    plan).  DuckDB's ``json_extract`` CONFLATES missing and present-null
    (both SQL NULL); the two-argument ``json_type(doc, path)`` is the
    discriminator — ``'NULL'`` for a present JSON null, SQL NULL for a
    missing key — and carries the same information the variant path gets
    from ``try_variant_get``/``is_variant_null``.
    """
    if not filt:
        return "TRUE"
    return " AND ".join(_sql_clause(meta_col, k, v) for k, v in filt.items())


def _jx(meta_col: str, field: str) -> str:
    return f"json_extract({meta_col}, '{_path(field)}')"


def _jtype(meta_col: str, field: str) -> str:
    """'NULL' for present-null, SQL NULL for missing, else the JSON type."""
    return f"json_type({meta_col}, '{_path(field)}')"


def _sql_lit(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _duck_cast(meta_col: str, field: str, v: Any) -> tuple[str, str]:
    """(casted value expr, type-guard predicate)."""
    cast, guard = _operand_cast(v)
    duck = {"double": "DOUBLE", "string": "VARCHAR", "boolean": "BOOLEAN"}[cast]
    expr = f"TRY_CAST(json_extract_string({meta_col}, '{_path(field)}') AS {duck})"
    return expr, f"{_jtype(meta_col, field)} {_DUCK_TYPE_SQL[guard]}"


def _sql_clause(meta_col: str, key: str, value: Any) -> str:
    if key == "$and":
        return "(" + " AND ".join(filter_json_to_sql(s, meta_col) for s in value) + ")"
    if key == "$or":
        return "(" + " OR ".join(filter_json_to_sql(s, meta_col) for s in value) + ")"
    if key == "$nor":
        return (
            "(NOT ("
            + " OR ".join(
                f"COALESCE(({filter_json_to_sql(s, meta_col)}), FALSE)" for s in value
            )
            + "))"
        )
    if _is_operator_doc(value):
        return "(" + " AND ".join(_sql_op(meta_col, key, op, v) for op, v in value.items()) + ")"
    return _sql_eq(meta_col, key, value)


def _sql_eq(meta_col: str, field: str, v: Any) -> str:
    if v is None:
        jt = _jtype(meta_col, field)
        return f"({jt} IS NULL OR {jt} = 'NULL')"
    expr, guard = _duck_cast(meta_col, field, v)
    return f"(COALESCE(({expr} = {_sql_lit(v)}) AND ({guard}), FALSE))"


def _sql_type_is(meta_col: str, field: str, alias: str) -> str:
    if alias not in _DUCK_TYPE_SQL:
        raise FilterError(f"unsupported $type alias {alias!r}")
    return f"(COALESCE({_jtype(meta_col, field)} {_DUCK_TYPE_SQL[alias]}, FALSE))"


def _sql_op(meta_col: str, field: str, op: str, v: Any) -> str:
    jx = _jx(meta_col, field)
    if op == "$eq":
        return _sql_eq(meta_col, field, v)
    if op == "$ne":
        if v is None:
            jt = _jtype(meta_col, field)
            return f"(NOT ({jt} IS NULL OR {jt} = 'NULL'))"
        return f"(NOT {_sql_eq(meta_col, field, v)})"
    if op in _COMPARISONS:
        expr, guard = _duck_cast(meta_col, field, v)
        return (
            f"(COALESCE(({expr} {_COMPARISONS[op]} {_sql_lit(v)}) "
            f"AND ({guard}), FALSE))"
        )
    if op == "$in":
        preds = [_sql_eq(meta_col, field, x) for x in v]
        return "(" + " OR ".join(preds) + ")" if preds else "FALSE"
    if op == "$nin":
        return f"(NOT {_sql_op(meta_col, field, '$in', v)})"
    if op == "$exists":
        return f"({_jtype(meta_col, field)} IS {'NOT ' if v else ''}NULL)"
    if op == "$type":
        return _sql_type_is(meta_col, field, str(v))
    if op == "$not":
        inner = " AND ".join(_sql_op(meta_col, field, o, x) for o, x in v.items())
        return f"(NOT COALESCE(({inner}), FALSE))"
    if op == "$regex":
        expr, _ = _duck_cast(meta_col, field, "")
        return (
            f"(COALESCE(regexp_matches({expr}, {_sql_lit(v)}) "
            f"AND {_jtype(meta_col, field)} = 'VARCHAR', FALSE))"
        )
    if op == "$mod":
        expr = f"TRY_CAST(json_extract_string({meta_col}, '{_path(field)}') AS BIGINT)"
        return f"(COALESCE({expr} % {_sql_lit(v[0])} = {_sql_lit(v[1])}, FALSE))"
    if op == "$size":
        return (
            f"(COALESCE({_jtype(meta_col, field)} = 'ARRAY' "
            f"AND json_array_length({jx}) = {int(v)}, FALSE))"
        )
    if op == "$all":
        if not v:
            return "TRUE"
        cast, _ = _operand_cast(v[0])
        duck = {"double": "DOUBLE[]", "string": "VARCHAR[]", "boolean": "BOOLEAN[]"}[cast]
        arr = f"TRY_CAST({jx} AS {duck})"
        items = ", ".join(_sql_lit(x) for x in v)
        return f"(COALESCE(list_has_all({arr}, [{items}]), FALSE))"
    if op == "$elemMatch":
        first = next(iter(v.values()))
        cast, _ = _operand_cast(first if not isinstance(first, (list, tuple)) else first[0])
        duck = {"double": "DOUBLE[]", "string": "VARCHAR[]", "boolean": "BOOLEAN[]"}[cast]
        arr = f"TRY_CAST({jx} AS {duck})"
        parts = []
        for o, operand in v.items():
            if o == "$eq":
                parts.append(f"x = {_sql_lit(operand)}")
            elif o in _COMPARISONS:
                parts.append(f"x {_COMPARISONS[o]} {_sql_lit(operand)}")
            elif o == "$ne":
                parts.append(f"x <> {_sql_lit(operand)}")
            else:
                raise FilterError(f"$elemMatch does not support {o} in schemaless mode")
        inner = " AND ".join(parts)
        return f"(COALESCE(len(list_filter({arr}, x -> {inner})) > 0, FALSE))"
    raise FilterError(f"no SQL rendering for operator {op}")
