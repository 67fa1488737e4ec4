"""simplejsonmatch — the destination-filter language (P8).

A from-scratch Python implementation of the reference's filter semantics
(internal/simplejsonmatch/{types,match,operators}.go, itself a port of the
public hookdeck/simple-json-match TypeScript library):

- Operators: $eq $neq $gt $gte $lt $lte $in $nin $startsWith $endsWith
  $exist $or $and $not  (types.go:20-36; $ref unimplemented).
- Loose coercion: numbers compare cross-width as floats; strings/bools/null
  only compare to their own type (operators.go:33-64).
- Array semantics: input array vs primitive/operator schema = any-element
  match; schema array vs input array = contains-all (match.go:143-175).
- $not: sole key => pure negation; alongside other keys => the negated
  schema must not match AND the rest must match (match.go:17-37).
- Operator type errors (e.g. $gt between string and number) and internal
  panics evaluate to no-match (match.go:10-16, operators.go err returns).

Two execution paths:
- :func:`match` — pure-Python, row-at-a-time; the executable spec, also the
  body of the Pandas-UDF fallback (:func:`match_udf`).
- :func:`compile_filter` (functions/jsonmatch_compiler.py) — compiles a
  filter document to a native Column expression over the event columns;
  raises ``UncompilableFilter`` for constructs that need the UDF.

Routing input envelope (entities.go:63-92): ``{id, topic,
time (RFC3339), metadata{}, data{}}``.
"""

from __future__ import annotations

import json
from typing import Any

_OPERATORS = {
    "$eq",
    "$neq",
    "$gt",
    "$gte",
    "$lt",
    "$lte",
    "$in",
    "$nin",
    "$startsWith",
    "$endsWith",
    "$exist",
}


class _OpError(Exception):
    """Unsupported type for operator (operators.go ErrUnsupportedType)."""


_UNDEFINED = object()


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _is_primitive(v: Any) -> bool:
    return v is None or isinstance(v, (str, bool)) or _is_num(v)


def _compare_equality(v: Any, c: Any) -> bool:
    """operators.go:33-64 — loose numeric coercion, strict same-type otherwise."""
    if v is None and c is None:
        return True
    if v is None or c is None:
        return False
    if _is_num(v) and _is_num(c):
        return float(v) == float(c)
    if isinstance(v, str) and isinstance(c, str):
        return v == c
    if isinstance(v, bool) and isinstance(c, bool):
        return v == c
    return False


def _canonical_json(v: Any) -> str:
    """Go json.Marshal sorts object keys — replicate for deep $eq."""
    return json.dumps(v, sort_keys=True, separators=(",", ":"))


def _op_eq(v: Any, c: Any) -> bool:
    if _is_primitive(v) and _is_primitive(c):
        return _compare_equality(v, c)
    return _canonical_json(v) == _canonical_json(c)


def _ordered(v: Any, c: Any, op: str) -> bool:
    """$gt/$gte/$lt/$lte (operators.go:71-146): str-str or num-num only."""
    if isinstance(v, str) and isinstance(c, str):
        pass
    elif _is_num(v) and _is_num(c):
        v, c = float(v), float(c)
    else:
        raise _OpError
    if op == "$gt":
        return v > c
    if op == "$gte":
        return v >= c
    if op == "$lt":
        return v < c
    return v <= c


def _op_in(v: Any, c: Any) -> bool:
    """operators.go:149-186 — array membership / substring / array-contains."""
    if isinstance(c, list):
        if not (_is_primitive(v)):
            raise _OpError
        return any(_compare_equality(v, item) for item in c)
    if isinstance(v, str):
        if isinstance(c, str):
            return c in v
        raise _OpError
    if isinstance(v, list):
        return any(_compare_equality(item, c) for item in v)
    raise _OpError


def _op_affix(v: Any, c: Any, *, prefix: bool) -> bool:
    if not isinstance(v, str):
        raise _OpError
    check = v.startswith if prefix else v.endswith
    if isinstance(c, str):
        return check(c)
    if isinstance(c, list):
        for item in c:
            if not isinstance(item, str):
                raise _OpError
            if check(item):
                return True
        return False
    raise _OpError


def _apply_operator(op: str, v: Any, c: Any) -> bool:
    """operators.go:279-306; raises _OpError on unsupported type combos."""
    if op == "$eq":
        return _op_eq(v, c)
    if op == "$neq":
        return not _op_eq(v, c)
    if op in ("$gt", "$gte", "$lt", "$lte"):
        return _ordered(v, c, op)
    if op == "$in":
        return _op_in(v, c)
    if op == "$nin":
        return not _op_in(v, c)
    if op == "$startsWith":
        return _op_affix(v, c, prefix=True)
    if op == "$endsWith":
        return _op_affix(v, c, prefix=False)
    if op == "$exist":
        if not isinstance(c, bool):
            raise _OpError
        return (v is not _UNDEFINED) if c else (v is _UNDEFINED)
    raise _OpError


def _mismatch_value(v: Any, schema: Any) -> bool:
    """match.go:112-228 recursivelyMatchValue — True means MISMATCH."""
    if _is_primitive(schema):
        if _is_primitive(v):
            return not _compare_equality(v, schema)
        if isinstance(v, list):
            return not any(not _mismatch_value(item, schema) for item in v)
        if isinstance(v, dict):
            return True

    if isinstance(v, list):
        if isinstance(schema, list):
            # contains-all: every schema element present in input array
            for sub in schema:
                if not any(not _mismatch_value(item, sub) for item in v):
                    return True
            return False
        if isinstance(schema, dict):
            ops = {k: val for k, val in schema.items() if k in _OPERATORS}
            if ops:
                for op, c in ops.items():
                    try:
                        if not _apply_operator(op, v, c):
                            return True
                    except _OpError:
                        return True
                return False
        # any-element match against the (non-operator) schema
        return not any(not _mismatch_value(item, schema) for item in v)

    if isinstance(schema, dict):
        if "$or" in schema:
            ors = schema["$or"]
            if isinstance(ors, list):
                return not any(_match(v, s) for s in ors)
        ops = {k: val for k, val in schema.items() if k in _OPERATORS}
        if ops:
            for op, c in ops.items():
                try:
                    if not _apply_operator(op, v, c):
                        return True
                except _OpError:
                    return True
            return False
        if _is_primitive(v):
            return True
        return not _match(v, schema)

    return True


def _match(input_val: Any, schema: Any) -> bool:
    """match.go:10-110 matchJSONToSchema."""
    if isinstance(schema, dict) and "$not" in schema:
        inner = _match(input_val, schema["$not"])
        if len(schema) == 1:
            return not inner
        if inner:
            return False
        # fall through: remaining keys must also match ($not skipped below)

    if _is_primitive(input_val) or isinstance(input_val, list):
        return not _mismatch_value(input_val, schema)

    if isinstance(schema, dict):
        if not isinstance(input_val, dict):
            return not _mismatch_value(input_val, schema)
        for key, sub in schema.items():
            if key == "$not":
                continue
            if key == "$or" and isinstance(sub, list):
                if not any(_match(input_val, s) for s in sub):
                    return False
                continue
            if key == "$and" and isinstance(sub, list):
                if not all(_match(input_val, s) for s in sub):
                    return False
                continue
            if key not in input_val:
                # $exist: false on a missing key passes (match.go:88-101)
                if isinstance(sub, dict) and sub.get("$exist") is False:
                    continue
                return False
            if _mismatch_value(input_val[key], sub):
                return False
        return True

    return not _mismatch_value(input_val, schema)


def match(input_val: Any, schema: Any) -> bool:
    """Public entry — any internal error evaluates to False (match.go:10-16)."""
    try:
        return bool(_match(input_val, schema))
    except Exception:
        return False


def match_event_filter(
    filter_doc: dict | None,
    *,
    event_id: str,
    topic: str,
    time_rfc3339: str,
    metadata: dict | None,
    data: Any,
) -> bool:
    """MatchFilter (operators.go:309-345 / entities.go:63-92).

    Empty/None filter always matches; ``data`` may be a dict or a raw JSON
    string (parsed here; parse failure => empty data).
    """
    if not filter_doc:
        return True
    if isinstance(data, (str, bytes)):
        try:
            parsed = json.loads(data)
            data = parsed if isinstance(parsed, dict) else {}
        except Exception:
            data = {}
    envelope = {
        "id": event_id,
        "topic": topic,
        "time": time_rfc3339,
        "metadata": dict(metadata or {}),
        "data": data if isinstance(data, dict) else {},
    }
    return match(envelope, filter_doc)
