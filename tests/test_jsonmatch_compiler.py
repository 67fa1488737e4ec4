"""The compiled-Column filter path must agree with the interpreter on every
corpus case it claims to compile — same 241-case corpus, evaluated through
Spark, diffed against the pure-Python `match` (the executable spec)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from outpost_spark.functions.jsonmatch import match, match_event_filter
from outpost_spark.functions.jsonmatch_compiler import (
    UncompilableFilter,
    compile_filter,
    compile_value_filter,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_jsonmatch.json")
with open(FIXTURE) as f:
    CORPUS = json.load(f)

ALL_CASES = CORPUS["main"] + CORPUS["not"]


@pytest.mark.slow
def test_corpus_compiled_path_agrees_with_interpreter(spark):
    cases = []
    for i, c in enumerate(ALL_CASES):
        if not isinstance(c["input"], dict):
            continue  # envelope inputs are always objects
        cases.append((i, c))

    compiled: dict[int, object] = {}
    data_col = F.col("data")
    for i, c in cases:
        try:
            compiled[i] = compile_value_filter(data_col, c["schema"])
        except UncompilableFilter:
            pass

    assert compiled, "compiler should handle a nontrivial corpus subset"
    coverage = len(compiled) / len(cases)
    # the compiler must cover a meaningful share of real filter shapes
    assert coverage >= 0.4, f"compile coverage too low: {coverage:.0%}"

    df = spark.createDataFrame(
        [(i, json.dumps(c["input"])) for i, c in cases if i in compiled],
        "id int, data string",
    )
    out = df.select(
        "id", *[pred.alias(f"p{i}") for i, pred in compiled.items()]
    ).collect()
    mismatches = []
    by_id = {r["id"]: r for r in out}
    for i, c in cases:
        if i not in compiled:
            continue
        got = bool(by_id[i][f"p{i}"])
        want = match(c["input"], c["schema"])
        if got is not want:
            mismatches.append(
                (i, c["input"], c["schema"], f"compiled={got} spec={want}")
            )
    assert not mismatches, f"{len(mismatches)} divergences, e.g. {mismatches[:3]}"


@pytest.mark.slow
def test_envelope_compiled_filters(spark):
    rows = [
        ("e1", "user.created", "2024-01-01T00:00:00Z", {"source": "api"},
         '{"amount": 120, "type": "premium", "tags": ["a", "b"], "n": {"f": true}}'),
        ("e2", "user.deleted", "2024-02-01T00:00:00Z", {"source": "web"},
         '{"amount": "120", "type": "basic"}'),
        ("e3", "order.created", "2024-03-01T00:00:00Z", {},
         "not json"),
    ]
    df = spark.createDataFrame(
        rows,
        "id string, topic string, time string, metadata map<string,string>, data string",
    )
    docs = [
        {"topic": "user.created"},
        {"topic": {"$startsWith": "user."}},
        {"data": {"amount": {"$gte": 100}}},       # strict: "120" is not a number
        {"data": {"amount": "120"}},               # strict: 120 is not a string
        {"data": {"type": "premium", "amount": 120}},
        {"data": {"tags": "a"}},                   # any-element match
        {"data": {"n": {"f": True}}},              # nested path
        {"metadata": {"source": "api"}},
        {"time": {"$startsWith": "2024-0"}},
        {"$or": [{"topic": "order.created"}, {"data": {"type": "premium"}}]},
        {"$not": {"topic": "user.deleted"}},
        {"data": {"missing": {"$exist": False}}},
        {"data": {"amount": {"$exist": True}}},
    ]
    preds = [
        compile_filter(
            doc,
            data_col=F.col("data"),
            topic_col=F.col("topic"),
            id_col=F.col("id"),
            time_col=F.col("time"),
            metadata_col=F.col("metadata"),
        ).alias(f"d{j}")
        for j, doc in enumerate(docs)
    ]
    got = {r["id"]: r for r in df.select("id", *preds).collect()}
    for j, doc in enumerate(docs):
        for rid, topic, time_s, md, data in rows:
            want = match_event_filter(
                doc, event_id=rid, topic=topic, time_rfc3339=time_s,
                metadata=md, data=data,
            )
            assert bool(got[rid][f"d{j}"]) is want, (
                f"doc {doc} on {rid}: compiled={bool(got[rid][f'd{j}'])} spec={want}"
            )


def test_uncompilable_constructs_raise(spark):
    for doc in [
        {"data": {"x": {"$not": {"$eq": 1}}}},   # value-level $not
        {"data": {"x": [1, 2]}},                 # schema arrays (contains-all)
        {"weird_key": 1},                        # unknown envelope key
    ]:
        with pytest.raises(UncompilableFilter):
            compile_filter(
                doc,
                data_col=F.col("data"),
                topic_col=F.col("topic"),
                id_col=F.col("id"),
                time_col=F.col("time"),
                metadata_col=F.col("metadata"),
            )


def test_nested_array_recursion(spark):
    """recursivelyMatchValue (match.go:115-185) matches any element at any
    nesting depth; the compiled path must agree with the interpreter on
    arrays-of-arrays and arrays-of-objects-holding-arrays."""
    cases = [
        ({"a": [[1], 2]}, {"a": 1}),                   # array-of-array, scalar hit deep
        ({"a": [[1], 2]}, {"a": 2}),                   # scalar hit shallow
        ({"a": [[1], 2]}, {"a": 3}),                   # no hit
        ({"a": [[[5]]]}, {"a": 5}),                    # three levels
        ({"a": [[{"b": 1}]]}, {"a": {"b": 1}}),        # object inside nested array
        ({"a": [{"b": [1, 2]}]}, {"a": {"b": 2}}),     # array under object under array
        ({"a": [["x"], ["y"]]}, {"a": "y"}),           # strings
        ({"a": []}, {"a": 1}),                         # empty array
        ({"a": [[]]}, {"a": 1}),                       # nested empty
    ]
    compiled = [
        compile_value_filter(F.col("data"), schema).alias(f"p{i}")
        for i, (_, schema) in enumerate(cases)
    ]
    rows = [(i, json.dumps(inp)) for i, (inp, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "id int, data string")
    got = {r["id"]: r for r in df.select("id", *compiled).collect()}
    for i, (inp, schema) in enumerate(cases):
        want = match(inp, schema)
        assert bool(got[i][f"p{i}"]) is want, (
            f"case {inp} vs {schema}: compiled={bool(got[i][f'p{i}'])} spec={want}"
        )
