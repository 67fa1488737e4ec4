"""simplejsonmatch → native Column compiler (P8's optimization path).

Compiles a destination-filter document into a pure Spark Column predicate
over the event envelope (topic/id/time strings, metadata map, data JSON),
so filter evaluation stays JVM-side instead of crossing into the Python
UDF.  Semantics are pinned by the same 241-case corpus as the interpreter
(functions/jsonmatch.py) — the test suite evaluates every compilable
corpus case through this compiler and asserts byte-identical outcomes.

Type fidelity: JSON scalars extracted with ``get_json_object`` lose the
string/number distinction ('"5"' and ``5`` both surface as ``"5"``), which
would corrupt the language's strict-type equality (string "5" ≠ number 5 —
operators.go:33-64).  We therefore extract through the VARIANT type:
``to_json(try_variant_get(parse_json(data), path, 'variant'))`` yields the
typed JSON text ('"5"' vs '5' vs 'true' vs '[..]'), and
``try_variant_get(..., 'array<variant>')`` exposes arrays for the
language's any-element semantics via ``F.exists``.

Constructs outside the compilable subset raise :class:`UncompilableFilter`
— the caller falls back to the pandas-UDF interpreter for those documents
(routing compiles per-destination filter docs at plan time; the
destinations table is a small dimension, so the collect is cheap).
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

_ORDERED = {"$gt": "__gt__", "$gte": "__ge__", "$lt": "__lt__", "$lte": "__le__"}
_OPERATORS = {
    "$eq", "$neq", "$gt", "$gte", "$lt", "$lte",
    "$in", "$nin", "$startsWith", "$endsWith", "$exist",
}
_SAFE_KEY = re.compile(r"^[A-Za-z0-9_\-]+$")


class UncompilableFilter(Exception):
    """Document uses constructs only the UDF interpreter handles."""


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _false() -> Column:
    return F.lit(False)


def _jsonlit(c: Any) -> str:
    return json.dumps(c, ensure_ascii=False, separators=(",", ":"))


# ───────────────── scalar predicates on the typed-JSON text ─────────────────


def _scalar_eq(raw: Column, c: Any) -> Column:
    """Strict-type equality of one JSON value against a primitive const."""
    if c is None:
        return raw == "null"
    if isinstance(c, bool):
        return raw == ("true" if c else "false")
    if _is_num(c):
        # numbers compare cross-width; quoted values are strings, not numbers
        return (~raw.startswith('"')) & (raw.try_cast("double") == float(c))
    if isinstance(c, str):
        return raw == _jsonlit(c)
    raise UncompilableFilter(f"non-primitive $eq constant: {c!r}")


def _scalar_op(raw: Column, str_val: Column, op: str, c: Any) -> Column:
    """One operator applied to one (non-array) JSON value.

    ``str_val`` is the typed string accessor for the same path — only
    meaningful when ``raw`` is quoted (the guard enforces strict types;
    the accessor alone would coerce numbers to their text form).
    """
    if op == "$eq":
        return _scalar_eq(raw, c)
    if op == "$neq":
        return raw.isNotNull() & ~F.coalesce(_scalar_eq(raw, c), _false())
    if op in _ORDERED:
        if _is_num(c):
            return (~raw.startswith('"')) & getattr(
                raw.try_cast("double"), _ORDERED[op]
            )(float(c))
        if isinstance(c, str):
            return raw.startswith('"') & getattr(str_val, _ORDERED[op])(c)
        raise UncompilableFilter(f"unsupported {op} constant: {c!r}")
    if op == "$startsWith" or op == "$endsWith":
        fn = "startswith" if op == "$startsWith" else "endswith"
        alts = c if isinstance(c, list) else [c]
        if not alts or not all(isinstance(a, str) for a in alts):
            raise UncompilableFilter(f"{op} needs string constant(s)")
        pred = None
        for a in alts:
            p = getattr(str_val, fn)(F.lit(a))
            pred = p if pred is None else (pred | p)
        return raw.startswith('"') & pred
    if op == "$exist":
        if not isinstance(c, bool):
            raise UncompilableFilter("$exist needs a bool")
        return raw.isNotNull() if c else raw.isNull()
    raise UncompilableFilter(f"operator {op} not compilable")


def _variant_in(raw: Column, str_val: Column, arr: Column, c: Any) -> Column:
    """$in over a variant value (operators.go:149-186)."""
    if isinstance(c, list):
        if not all(x is None or isinstance(x, (str, bool, int, float)) for x in c):
            raise UncompilableFilter("$in list with non-primitive items")
        pred = _false()
        for item in c:
            pred = pred | F.coalesce(_scalar_eq(raw, item), _false())
        return pred  # array/object inputs: every scalar_eq false → False (OpError)
    if isinstance(c, str):
        # v string → substring; v array → any-element EQUALITY
        sub = raw.startswith('"') & F.contains(str_val, F.lit(c))
        any_eq = F.exists(
            arr, lambda x: F.coalesce(_scalar_eq(F.to_json(x), c), _false())
        )
        return F.when(arr.isNotNull(), any_eq).otherwise(sub)
    raise UncompilableFilter(f"$in constant {c!r} not compilable")


# Max nested-array depth unrolled into the compiled expression.  The
# reference's recursivelyMatchValue (match.go:115-185) recurses to any
# data-driven depth; a static Column expression must pick a bound.  Arrays
# nested deeper than this match nothing on the compiled path — real filter
# payloads nest 1-2 levels, and the 241-case corpus never exceeds 2.
_MAX_ARRAY_DEPTH = 4


def _pred_on_variant(x: Column, schema: Any, depth: int = _MAX_ARRAY_DEPTH) -> Column:
    """Predicate matching one VARIANT value against a schema node.

    ``x`` may be a root path extraction or an array element — all paths
    below are relative to it, which is what makes the language's
    any-element recursion (array of objects vs object schema,
    match.go:143-175) expressible with ``F.exists``.  Array elements
    recurse through ``_pred_on_variant`` itself (bounded by ``depth``) so
    nested arrays match any-element at every level, mirroring
    recursivelyMatchValue.
    """
    raw = F.to_json(x)
    str_val = F.try_variant_get(x, "$", "string")
    arr = F.try_variant_get(x, "$", "array<variant>")

    if schema is None or isinstance(schema, (str, bool, int, float)):
        # primitive schema: scalar equality, any-element over arrays
        scalar = F.coalesce(_scalar_eq(raw, schema), _false())
        if depth <= 0:
            return F.when(arr.isNotNull(), _false()).otherwise(scalar)
        any_el = F.exists(
            arr, lambda e: F.coalesce(_pred_on_variant(e, schema, depth - 1), _false())
        )
        return F.when(arr.isNotNull(), any_el).otherwise(scalar)

    if isinstance(schema, dict):
        if "$or" in schema:
            # _mismatch_value checks $or before operators and ignores siblings
            subs = schema["$or"]
            if not isinstance(subs, list):
                raise UncompilableFilter("$or must hold a list")
            pred = _false()
            for s in subs:
                pred = pred | _pred_on_variant(x, s, depth)
            return pred
        if any(k in ("$not", "$and") for k in schema):
            raise UncompilableFilter("value-level $not/$and fall back to UDF")
        ops = {k: val for k, val in schema.items() if k in _OPERATORS}
        if ops:
            if set(schema) - set(ops):
                raise UncompilableFilter("mixed operator/path keys")
            pred = None
            for op, c in ops.items():
                if op == "$in":
                    p = _variant_in(raw, str_val, arr, c)
                elif op == "$nin":
                    p = raw.isNotNull() & ~F.coalesce(
                        _variant_in(raw, str_val, arr, c), _false()
                    )
                else:
                    p = _scalar_op(raw, str_val, op, c)
                pred = p if pred is None else (pred & p)
            return F.coalesce(pred, _false())

        # non-operator object schema: on an object, path descent; on an
        # array, any-element match of the whole schema (match.go:143-175)
        def object_pred(obj: Column) -> Column:
            pred = None
            for key, sub in schema.items():
                if not _SAFE_KEY.match(key):
                    raise UncompilableFilter(f"unsafe path segment {key!r}")
                child = F.try_variant_get(obj, f"$.{key}", "variant")
                allow_missing = isinstance(sub, dict) and sub.get("$exist") is False
                p = _pred_on_variant(child, sub)
                if not allow_missing:
                    p = F.to_json(child).isNotNull() & p
                pred = p if pred is None else (pred & p)
            return pred if pred is not None else F.lit(True)

        direct = object_pred(x)
        if depth <= 0:
            return F.when(arr.isNotNull(), _false()).otherwise(direct)
        # elements recurse through _pred_on_variant: an element that is
        # itself an array re-enters the any-element path one level deeper
        any_el = F.exists(
            arr, lambda e: F.coalesce(_pred_on_variant(e, schema, depth - 1), _false())
        )
        return F.when(arr.isNotNull(), any_el).otherwise(direct)

    raise UncompilableFilter(f"schema node {schema!r} not compilable")


def _variant_value_pred(v: Column, path: str, schema: Any) -> Column:
    """Predicate for one data path against its schema node."""
    return _pred_on_variant(F.try_variant_get(v, path, "variant"), schema)


def _overflow_on_variant(x: Column, schema: Any, depth: int = _MAX_ARRAY_DEPTH) -> Column:
    """True where the VALUE under ``x`` nests arrays past the unroll bound
    along paths ``schema`` actually inspects — exactly the rows on which
    :func:`_pred_on_variant` (bounded) may disagree with the reference's
    unbounded recursivelyMatchValue.  Mirrors its structure: operator
    nodes don't recurse (never overflow), path descent resets the bound
    (as ``object_pred`` does), array elements consume one level.
    """
    arr = F.try_variant_get(x, "$", "array<variant>")
    if schema is None or isinstance(schema, (str, bool, int, float)):
        if depth <= 0:
            return F.coalesce(arr.isNotNull(), _false())
        return F.coalesce(
            F.exists(
                arr,
                lambda e: F.coalesce(_overflow_on_variant(e, schema, depth - 1), _false()),
            ),
            _false(),
        )
    if isinstance(schema, dict):
        if "$or" in schema:
            subs = schema["$or"]
            if not isinstance(subs, list):
                return _false()
            pred = _false()
            for s in subs:
                pred = pred | _overflow_on_variant(x, s, depth)
            return pred
        if any(k in _OPERATORS for k in schema):
            return _false()
        children = _false()
        for key, sub in schema.items():
            if not _SAFE_KEY.match(key):
                continue  # the predicate compiler already rejected the doc
            child = F.try_variant_get(x, f"$.{key}", "variant")
            children = children | _overflow_on_variant(child, sub)  # fresh bound
        if depth <= 0:
            # mirror _pred_on_variant at the cutoff: an ARRAY here is
            # undecidable (overflow), an OBJECT still descends with a
            # fresh bound — its children can overflow on their own paths
            return F.when(F.coalesce(arr.isNotNull(), _false()), F.lit(True)).otherwise(
                children
            )
        any_el = F.coalesce(
            F.exists(
                arr,
                lambda e: F.coalesce(_overflow_on_variant(e, schema, depth - 1), _false()),
            ),
            _false(),
        )
        return F.when(arr.isNotNull(), any_el).otherwise(children)
    return _false()


def compile_overflow(filter_doc: dict | None, *, data_col: Column) -> Column | None:
    """Depth-overflow detector for a compiled filter document.

    Returns a boolean Column that is true on rows whose payload nests
    arrays deeper than :data:`_MAX_ARRAY_DEPTH` along a path the
    document's ``data`` schemas inspect — rows the bounded compiled
    predicate cannot decide faithfully and the caller must route to the
    UDF interpreter (the reference recurses to any data-driven depth,
    match.go:115-185).  Returns ``None`` when the document cannot
    overflow (no ``data`` schemas anywhere): callers skip the wrapper
    entirely, which is the common case.  Envelope scalars and metadata
    entries are strings — only ``data`` recursion is depth-bounded.
    """
    if not isinstance(filter_doc, dict):
        return None
    schemas: list[Any] = []

    def walk(d: Any) -> None:
        if not isinstance(d, dict):
            return
        for k, s in d.items():
            if k == "$not":
                walk(s)
            elif k in ("$or", "$and") and isinstance(s, list):
                for item in s:
                    walk(item)
            elif k == "data" and isinstance(s, dict):
                schemas.append(s)

    walk(filter_doc)
    if not schemas:
        return None
    v = F.parse_json(F.when(data_col.rlike(r"^\s*\{"), data_col).otherwise(F.lit("{}")))
    pred = _false()
    for s in schemas:
        pred = pred | _overflow_on_variant(F.try_variant_get(v, "$", "variant"), s)
    return F.coalesce(pred, _false())


# ───────────────── plain string columns (topic/id/time/metadata) ─────────────────


def _string_col_pred(col: Column, schema: Any) -> Column:
    """Schema node against an always-string value (envelope scalars)."""
    if isinstance(schema, str):
        return col == schema
    if schema is None or isinstance(schema, (bool, int, float)):
        return _false()  # strict types: a string never equals these
    if isinstance(schema, dict):
        if "$or" in schema:
            subs = schema["$or"]
            if not isinstance(subs, list):
                raise UncompilableFilter("$or must hold a list")
            pred = _false()
            for s in subs:
                pred = pred | _string_col_pred(col, s)
            return pred
        ops = {k: val for k, val in schema.items() if k in _OPERATORS}
        if not ops or set(schema) - set(ops):
            raise UncompilableFilter("string column needs operator schema")
        pred = None
        for op, c in ops.items():
            if op == "$eq":
                p = col == c if isinstance(c, str) else _false()
            elif op == "$neq":
                p = col != c if isinstance(c, str) else col.isNotNull()
            elif op in _ORDERED:
                if not isinstance(c, str):
                    raise UncompilableFilter("ordered op on string needs string")
                p = getattr(col, _ORDERED[op])(c)
            elif op in ("$startsWith", "$endsWith"):
                fn = "startswith" if op == "$startsWith" else "endswith"
                alts = c if isinstance(c, list) else [c]
                if not all(isinstance(a, str) for a in alts):
                    raise UncompilableFilter(f"{op} needs strings")
                p = _false()
                for a in alts:
                    p = p | getattr(col, fn)(F.lit(a))
            elif op == "$in":
                if isinstance(c, list):
                    p = _false()
                    for item in c:
                        p = p | (col == item if isinstance(item, str) else _false())
                elif isinstance(c, str):
                    p = F.contains(col, F.lit(c))
                else:
                    raise UncompilableFilter("$in constant not compilable")
            elif op == "$nin":
                inner = _string_col_pred(col, {"$in": c})
                p = col.isNotNull() & ~F.coalesce(inner, _false())
            elif op == "$exist":
                if not isinstance(c, bool):
                    raise UncompilableFilter("$exist needs a bool")
                p = col.isNotNull() if c else col.isNull()
            else:
                raise UncompilableFilter(f"operator {op}")
            pred = p if pred is None else (pred & p)
        return F.coalesce(pred, _false())
    raise UncompilableFilter(f"schema {schema!r} on string column")


# ───────────────────────── envelope compiler ─────────────────────────


def compile_filter(
    filter_doc: dict | None,
    *,
    data_col: Column,
    topic_col: Column,
    id_col: Column | None = None,
    time_col: Column | None = None,
    metadata_col: Column | None = None,
) -> Column:
    """Compile a filter document to one boolean Column (never null).

    Raises :class:`UncompilableFilter` for documents needing the UDF
    interpreter.  ``data_col`` is the raw JSON string column; invalid or
    non-object payloads behave as an empty object (entities.go:112-121),
    enforced by the object guard below.
    """
    if not filter_doc:
        return F.lit(True)
    if not isinstance(filter_doc, dict):
        raise UncompilableFilter("filter must be an object")

    v = F.parse_json(F.when(data_col.rlike(r"^\s*\{"), data_col).otherwise(F.lit("{}")))

    def compile_envelope(doc: dict) -> Column:
        pred = None

        def add(p: Column):
            nonlocal pred
            pred = p if pred is None else (pred & p)

        for key, sub in doc.items():
            if key == "$not":
                add(~F.coalesce(compile_envelope_node(sub), _false()))
            elif key == "$or":
                if not isinstance(sub, list):
                    raise UncompilableFilter("$or must hold a list")
                p = _false()
                for s in sub:
                    p = p | F.coalesce(compile_envelope_node(s), _false())
                add(p)
            elif key == "$and":
                if not isinstance(sub, list):
                    raise UncompilableFilter("$and must hold a list")
                for s in sub:
                    add(F.coalesce(compile_envelope_node(s), _false()))
            elif key == "topic":
                add(_string_col_pred(topic_col, sub))
            elif key == "id":
                if id_col is None:
                    raise UncompilableFilter("id column not provided")
                add(_string_col_pred(id_col, sub))
            elif key == "time":
                if time_col is None:
                    raise UncompilableFilter("time column not provided")
                add(_string_col_pred(time_col, sub))
            elif key == "metadata":
                if metadata_col is None:
                    raise UncompilableFilter("metadata column not provided")
                if not isinstance(sub, dict):
                    add(_false())
                    continue
                for mk, ms in sub.items():
                    if any(k in ("$not", "$and", "$or") for k in (mk,)):
                        raise UncompilableFilter("metadata-level logic ops")
                    entry = metadata_col.getItem(mk)
                    allow_missing = isinstance(ms, dict) and ms.get("$exist") is False
                    p = F.coalesce(_string_col_pred(entry, ms), _false())
                    if not allow_missing:
                        p = entry.isNotNull() & p
                    add(p)
            elif key == "data":
                if not isinstance(sub, dict):
                    add(_false())
                    continue
                add(F.coalesce(_variant_value_pred(v, "$", sub), _false()))
            else:
                raise UncompilableFilter(f"unknown envelope key {key!r}")
        return pred if pred is not None else F.lit(True)

    def compile_envelope_node(doc: Any) -> Column:
        if not isinstance(doc, dict):
            raise UncompilableFilter("$not/$or/$and operand must be an object")
        return compile_envelope(doc)

    return F.coalesce(compile_envelope(filter_doc), _false())


def compile_value_filter(data_col: Column, schema: Any) -> Column:
    """Compile a VALUE-level schema against a JSON object column (the shape
    the corpus pins): equivalent to ``match(json(data), schema)`` for dict
    inputs.  Raises UncompilableFilter outside the subset."""
    if not isinstance(schema, dict):
        raise UncompilableFilter("top-level non-object schemas use the UDF")
    v = F.parse_json(F.when(data_col.rlike(r"^\s*\{"), data_col).otherwise(F.lit("{}")))

    pred = None
    for key, sub in schema.items():
        if key in ("$not", "$or", "$and"):
            raise UncompilableFilter("top-level logic ops handled by envelope path")
        if key in _OPERATORS:
            raise UncompilableFilter("operators on the root object")
        if not _SAFE_KEY.match(key):
            raise UncompilableFilter(f"unsafe path segment {key!r}")
        path = f"$.{key}"
        exists_guard = F.to_json(F.try_variant_get(v, path, "variant")).isNotNull()
        allow_missing = isinstance(sub, dict) and sub.get("$exist") is False
        p = _variant_value_pred(v, path, sub)
        if not allow_missing:
            p = exists_guard & p
        pred = p if pred is None else (pred & p)
    return F.coalesce(pred if pred is not None else F.lit(True), _false())
