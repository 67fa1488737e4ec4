"""Witness-rotation fairness: the driver samples the first ~50 rows of
``queries()``, so ``_emit_order`` must place entries the driver has
never/least-recently witnessed first — otherwise a growing catalog
starves its own tail of correctness rows (VERDICT r05 task #7 pins the
property that held through r05)."""

import glob
import json
import os
import re

from outpost_spark import queries_catalog

DRIVER_ROW_BUDGET = 50

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_correctness():
    best_round, best = 0, None
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict) and rnd > best_round:
            best_round, best = rnd, data
    return best_round, best


def test_stale_entries_lead_the_emit_order():
    """Every registered entry with no WITNESSING row in the LATEST
    correctness file sorts before every entry that has one (so the
    driver's next run witnesses all currently-stale entries while the
    stale count fits its row budget).  Witnessing follows
    ``_row_witnesses``: an oracle-backed entry is only witnessed by a
    green value comparison, so entries whose oracle postdates their last
    driver row resurface immediately."""
    rnd, latest = _latest_correctness()
    if latest is None:
        return  # round 1: no correctness artifact yet — nothing to rotate on
    order = queries_catalog._emit_order()
    assert set(order) == set(queries_catalog._REGISTRY)
    witnessed_latest = {
        n
        for n in order
        if n in latest and queries_catalog._row_witnesses(n, latest[n])
    }
    stale = [n for n in order if n not in witnessed_latest]
    if not stale:
        return
    last_stale = max(order.index(n) for n in stale)
    # staleness strictly dominates: no latest-round-witnessed entry may
    # precede a stale one (witness history is monotone by round, so a
    # name in the latest file can never have a lower history value)
    first_witnessed = min(
        (order.index(n) for n in witnessed_latest), default=len(order)
    )
    assert last_stale < first_witnessed, (
        f"stale entry at position {last_stale} after witnessed entry at "
        f"{first_witnessed} (latest correctness: r{rnd:02d})"
    )
    if len(stale) <= DRIVER_ROW_BUDGET:
        assert last_stale < DRIVER_ROW_BUDGET, (
            f"{len(stale)} stale entries but one sits at position "
            f"{last_stale} >= the driver's {DRIVER_ROW_BUDGET}-row budget"
        )


def _all_correctness():
    rounds = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            rounds[int(m.group(1))] = data
    return rounds


def test_no_witness_ages_past_three_rounds():
    """Cadence bound (VERDICT r12 task #8): with ~117 entries and a
    50-row driver budget the revisit cycle is ~2.4 rounds; the
    least-recently-witnessed rotation must keep every entry's LATEST
    green witness within 3 rounds of the newest correctness artifact.
    Entries with no witness in ANY artifact are new this round — the
    emit-order test above already pins that they lead the next run."""
    rounds = _all_correctness()
    if not rounds:
        return
    latest = max(rounds)
    last_witness = {}
    for rnd in sorted(rounds):
        for name, row in rounds[rnd].items():
            if name in queries_catalog._REGISTRY and queries_catalog._row_witnesses(
                name, row
            ):
                last_witness[name] = rnd
    overdue = {
        n: w for n, w in last_witness.items() if latest - w > 3
    }
    assert not overdue, (
        f"entries whose latest witness predates r{latest - 3:02d}: {overdue}"
    )


def test_oracle_sql_keys_subset_of_queries():
    qs = queries_catalog.queries()
    osql = queries_catalog.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
