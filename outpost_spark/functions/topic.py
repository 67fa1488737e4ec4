"""Topic glob matching and topic-set normalization.

Reference: internal/models/entities.go:144-289.

Semantics pinned:
- ``matchTopicPattern`` (entities.go:255-289) is a classic greedy-``*``
  backtracking glob where ``*`` matches any run of characters (including
  empty, across ``.`` separators).  That is exactly the regex ``.*`` per
  star with all other characters literal — so we compile the glob to an
  anchored regex and evaluate it JVM-side with ``rlike`` (no UDF).
- ``MatchTopic`` (entities.go:150-160): an empty or ``"*"`` *event* topic
  matches anything; a destination topic set of exactly ``["*"]`` matches all.
- ``Normalize`` (entities.go:200-244): drop exact duplicates and entries
  covered by a strictly-more-general sibling; first-seen order preserved.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def glob_to_regex(pattern: str) -> str:
    """Translate a ``*`` glob into an anchored regex (entities.go:255-289)."""
    parts = pattern.split("*")
    return "^" + ".*".join(re.escape(p) for p in parts) + "$"


def match_topic_pattern(pattern: str, topic: str) -> bool:
    """Driver-side mirror of matchTopicPattern for plan-time decisions."""
    if pattern == topic:
        return True
    if "*" not in pattern:
        return False
    return re.match(glob_to_regex(pattern), topic) is not None


def topic_match_expr(event_topic: Column, dest_topics: list[str]) -> Column:
    """Column predicate: does ``event_topic`` match the destination's topic set?

    Mirrors Topics.MatchTopic (entities.go:150-160).  The destination topic
    set is known at plan time (destinations are a broadcast dimension), so
    the pattern list compiles to a single literal regex alternation —
    evaluated inside whole-stage codegen.
    """
    if len(dest_topics) == 1 and dest_topics[0] == "*":
        return F.lit(True)
    exact = [t for t in dest_topics if "*" not in t]
    globs = [t for t in dest_topics if "*" in t]
    pred = (event_topic == "") | (event_topic == "*")
    if exact:
        pred = pred | event_topic.isin(exact)
    if globs:
        alternation = "|".join(glob_to_regex(g)[1:-1] for g in globs)
        pred = pred | event_topic.rlike(f"^({alternation})$")
    return pred


def _glob_regex_col(t: Column) -> Column:
    """Column form of glob_to_regex: escape regex metachars, expand ``*`` -> ``.*``."""
    escaped = F.regexp_replace(t, r"([.^$+?()\[\]{}|\\])", r"\\$1")
    return F.concat(F.lit("^"), F.replace(escaped, F.lit("*"), F.lit(".*")), F.lit("$"))


def topic_match_any_expr(event_topic: Column, topics_col: Column) -> Column:
    """Predicate for a *column* of topic arrays (per-row destination topics).

    Used in the routing join where each destination row carries its own
    ``topics`` array.  Globs are translated to regex per element and matched
    with ``regexp_like`` inside ``exists`` — JVM-side, no Python UDF.
    Mirrors Topics.MatchTopic (entities.go:150-160).
    """
    return (
        (event_topic == "")
        | (event_topic == "*")
        | ((F.size(topics_col) == 1) & (F.element_at(topics_col, 1) == "*"))
        | F.exists(
            topics_col,
            lambda t: F.when(t == event_topic, F.lit(True))
            .when(t.contains("*"), F.regexp_like(event_topic, _glob_regex_col(t)))
            .otherwise(F.lit(False)),
        )
    )


def normalize_topics(topics: list[str]) -> list[str]:
    """Mirror of Topics.Normalize (entities.go:211-244) — plan-time Python."""
    if topics == ["*"] or len(topics) <= 1:
        return list(topics)
    result: list[str] = []
    for e in topics:
        if e in result:
            continue
        if any(
            p != e and match_topic_pattern(p, e) and not match_topic_pattern(e, p)
            for p in topics
        ):
            continue
        result.append(e)
    return result
