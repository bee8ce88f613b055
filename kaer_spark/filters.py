"""MongoDB/FerretDB-style filter-document → Spark ``Column`` compiler.

The reference passes the user's filter verbatim to the document store
(``/root/reference/db/db.go:113``; README: "you can use any document query
language when querying"). Its effective dialect is the FerretDB v1.0 query
operator set (``/root/reference/go.mod:7``). This module compiles those
filter dicts into ordinary Catalyst expressions, so the predicate is pushed
into the parquet scan (``PushedFilters`` in ``.explain``) — the reference,
by contrast, pulls the *entire* match set to the client before kNN
(``/root/reference/db/db.go:113-120``).

Null/missing-field semantics (Mongo-faithful, documented per operator):
with a typed-column data model "field missing" ≡ "value NULL".

* ``$eq v`` / implicit eq: NULL does not match (unless v is None).
* ``$eq None``: matches NULL (Mongo: matches missing or null).
* ``$ne v``: matches rows where the field is NULL **or** differs (Mongo
  treats missing as not-equal). ``$ne None`` matches only non-null.
* ``$in`` : NULL matches only if None is in the list.
* ``$nin``: complement of ``$in`` *including* NULL rows.
* ``$gt/$gte/$lt/$lte``: NULL never matches (same as SQL).
* ``$exists``: True → IS NOT NULL, False → IS NULL.
* ``$not``: Mongo's $not matches when the operand does **not** match,
  including missing fields — NULL-aware negation, not SQL three-valued NOT.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


class FilterError(ValueError):
    """Raised for malformed or unsupported filter documents."""


_COMPARISONS = {"$gt", "$gte", "$lt", "$lte"}


def compile_filter(filt: Mapping[str, Any] | None) -> Column:
    """Compile a Mongo-style filter document to a Spark boolean Column.

    An empty/None filter matches everything (reference behavior: an empty
    ``bson.M`` passed to ``Find`` matches all documents).
    """
    if not filt:
        return F.lit(True)
    if not isinstance(filt, Mapping):
        raise FilterError(f"filter must be a dict, got {type(filt).__name__}")
    clauses = [_compile_clause(k, v) for k, v in filt.items()]
    return _and_all(clauses)


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


def _compile_clause(key: str, value: Any) -> Column:
    if key == "$and":
        return _and_all([compile_filter(sub) for sub in _sublist(key, value)])
    if key == "$or":
        return _or_all([compile_filter(sub) for sub in _sublist(key, value)])
    if key == "$nor":
        return ~_or_all(
            [_nullsafe(compile_filter(sub)) for sub in _sublist(key, value)]
        )
    if key == "$not":
        raise FilterError("$not is a field-level operator: {field: {$not: {...}}}")
    if key.startswith("$"):
        raise FilterError(f"unsupported top-level operator: {key}")
    return _compile_field(key, value)


def _sublist(key: str, value: Any) -> list[Mapping[str, Any]]:
    if not isinstance(value, (list, tuple)) or not value:
        raise FilterError(f"{key} takes a non-empty list of filter documents")
    return list(value)


def _field_col(field: str) -> Column:
    # dot notation maps to nested struct access, which Spark's col() already
    # resolves (a.b.c); top-level names with dots are not in the test surface.
    return F.col(field)


def _is_operator_doc(value: Any) -> bool:
    return isinstance(value, Mapping) and any(
        isinstance(k, str) and k.startswith("$") for k in value
    )


def _compile_field(field: str, value: Any) -> Column:
    col = _field_col(field)
    if _is_operator_doc(value):
        return _and_all(
            [_compile_op(field, col, op, operand) for op, operand in value.items()]
        )
    # implicit equality; a plain dict operand would mean whole-subdocument
    # equality in Mongo — compare as struct if the user really passes one.
    return _eq(col, value)


def _eq(col: Column, v: Any) -> Column:
    if v is None:
        return col.isNull()
    return col == F.lit(v)


def _nullsafe(pred: Column) -> Column:
    """Collapse three-valued logic: NULL predicate result → False."""
    return F.coalesce(pred, F.lit(False))


def _compile_op(field: str, col: Column, op: str, v: Any) -> Column:
    if op == "$eq":
        return _eq(col, v)
    if op == "$ne":
        if v is None:
            return col.isNotNull()
        return col.isNull() | (col != F.lit(v))
    if op in _COMPARISONS:
        lit = F.lit(v)
        return {"$gt": col > lit, "$gte": col >= lit, "$lt": col < lit, "$lte": col <= lit}[op]
    if op == "$in":
        if not isinstance(v, (list, tuple)):
            raise FilterError("$in takes a list")
        non_null = [x for x in v if x is not None]
        pred = col.isin(non_null) if non_null else F.lit(False)
        if any(x is None for x in v):
            pred = pred | col.isNull()
        return _nullsafe(pred)
    if op == "$nin":
        return ~_compile_op(field, col, "$in", v)
    if op == "$exists":
        return col.isNotNull() if v else col.isNull()
    if op == "$not":
        if not _is_operator_doc(v):
            raise FilterError("$not takes an operator document")
        inner = _and_all(
            [_compile_op(field, col, o, operand) for o, operand in v.items()]
        )
        return ~_nullsafe(inner)
    if op == "$regex":
        return col.rlike(v)
    if op == "$mod":
        if not isinstance(v, (list, tuple)) or len(v) != 2:
            raise FilterError("$mod takes [divisor, remainder]")
        # Mongo's $mod uses truncated-division remainder (sign follows the
        # dividend) — Spark's % operator, not pmod (always non-negative)
        return (col % F.lit(v[0])) == F.lit(v[1])
    if op == "$size":
        return F.size(col) == F.lit(int(v))
    if op == "$all":
        if not isinstance(v, (list, tuple)):
            raise FilterError("$all takes a list")
        return _and_all([F.array_contains(col, F.lit(x)) for x in v]) if v else F.lit(True)
    if op == "$elemMatch":
        if not _is_operator_doc(v):
            raise FilterError("$elemMatch takes an operator document")

        def pred(x: Column) -> Column:
            return _and_all([_compile_op(field, x, o, operand) for o, operand in v.items()])

        return F.exists(col, pred)
    if op == "$type":
        # typed-column model: approximate by Spark SQL typeof()
        return F.expr(f"typeof({field})") == F.lit(str(v))
    raise FilterError(f"unsupported operator {op} on field {field}")


def filter_to_sql(filt: Mapping[str, Any] | None) -> str:
    """Render the compiled filter as an ANSI-SQL predicate string (for the
    DuckDB oracle and for documentation/EXPLAIN purposes).

    This intentionally re-implements the same semantics in plain SQL rather
    than stringifying the Spark Column, so the oracle path is independent.
    """
    if not filt:
        return "TRUE"
    return " AND ".join(_sql_clause(k, v) for k, v in filt.items())


def _sql_lit(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _sql_clause(key: str, value: Any) -> str:
    if key == "$and":
        return "(" + " AND ".join(filter_to_sql(s) for s in value) + ")"
    if key == "$or":
        return "(" + " OR ".join(filter_to_sql(s) for s in value) + ")"
    if key == "$nor":
        return (
            "(NOT ("
            + " OR ".join(f"COALESCE(({filter_to_sql(s)}), FALSE)" for s in value)
            + "))"
        )
    if _is_operator_doc(value):
        return "(" + " AND ".join(_sql_op(key, op, v) for op, v in value.items()) + ")"
    if value is None:
        return f"({key} IS NULL)"
    return f"({key} = {_sql_lit(value)})"


def _sql_op(field: str, op: str, v: Any) -> str:
    if op == "$eq":
        return f"({field} IS NULL)" if v is None else f"({field} = {_sql_lit(v)})"
    if op == "$ne":
        if v is None:
            return f"({field} IS NOT NULL)"
        return f"({field} IS NULL OR {field} <> {_sql_lit(v)})"
    if op in _COMPARISONS:
        sym = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}[op]
        return f"({field} {sym} {_sql_lit(v)})"
    if op == "$in":
        non_null = [x for x in v if x is not None]
        base = (
            f"{field} IN ({', '.join(_sql_lit(x) for x in non_null)})"
            if non_null
            else "FALSE"
        )
        if any(x is None for x in v):
            base = f"({base}) OR {field} IS NULL"
        return f"(COALESCE(({base}), FALSE))"
    if op == "$nin":
        return f"(NOT {_sql_op(field, '$in', v)})"
    if op == "$exists":
        return f"({field} IS {'NOT ' if v else ''}NULL)".replace(
            "IS NOT NULL", "IS NOT NULL"
        )
    if op == "$not":
        inner = " AND ".join(_sql_op(field, o, x) for o, x in v.items())
        return f"(NOT COALESCE(({inner}), FALSE))"
    if op == "$regex":
        return f"(regexp_matches({field}, {_sql_lit(v)}))"
    if op == "$mod":
        # DuckDB % is truncated-division remainder too — matches Mongo/Spark
        return f"({field} % {_sql_lit(v[0])} = {_sql_lit(v[1])})"
    if op == "$size":
        return f"(len({field}) = {int(v)})"
    if op == "$all":
        if not v:
            return "TRUE"
        items = ", ".join(_sql_lit(x) for x in v)
        return f"(COALESCE(list_has_all({field}, [{items}]), FALSE))"
    if op == "$elemMatch":
        inner = " AND ".join(_sql_op("x", o, operand) for o, operand in v.items())
        return f"(COALESCE(len(list_filter({field}, x -> {inner})) > 0, FALSE))"
    raise FilterError(f"no SQL rendering for operator {op}")
