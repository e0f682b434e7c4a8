"""Registry-shape invariants. The external correctness gate attests only
the FIRST 50 entries of ``QUERIES`` in dict order per round — r2 shipped
33 queries that silently never earned a driver row because they were
appended at the end. These tests make that failure mode impossible to
reintroduce: any query that has never appeared in a CORRECTNESS file
must sit inside the gate window."""

import glob
import json
import os

from big_data_analysis_of_twitter_emoji_usage_spark.plans.catalog import (
    ORACLE_SQL,
    QUERIES,
    _GATE_FRONT,
    _PROVEN,
    _SENTINELS,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_WINDOW = 50


def _attested_names() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        data = json.load(open(path, encoding="utf-8"))
        for name, row in data.items():
            # green differential row, or the documented rows-only check
            # (err='no_oracle' with a positive spark row count).
            if row.get("rows_match") or (
                row.get("err") == "no_oracle" and (row.get("spark_rows") or 0) > 0
            ):
                names.add(name)
    return names


def test_registry_blocks_are_disjoint_and_complete():
    assert len(_GATE_FRONT) + len(_SENTINELS) + len(_PROVEN) == len(QUERIES)
    assert not (set(_GATE_FRONT) & set(_PROVEN))
    assert not (set(_GATE_FRONT) & set(_SENTINELS))


def test_never_attested_queries_sit_inside_gate_window():
    window = set(list(QUERIES)[:GATE_WINDOW])
    never = set(QUERIES) - _attested_names()
    outside = sorted(never - window)
    assert not outside, (
        f"{len(outside)} queries have no driver CORRECTNESS row and sit "
        f"past slot {GATE_WINDOW}; move them into _GATE_FRONT: {outside}"
    )


def test_proven_queries_really_are_attested():
    """Nothing rotates into _PROVEN without at least one green driver row."""
    attested = _attested_names()
    unproven = sorted(set(_PROVEN) - attested)
    assert not unproven, f"not driver-attested, keep in _GATE_FRONT: {unproven}"


def test_gate_front_plus_sentinels_fit_the_window():
    assert len(_GATE_FRONT) + len(_SENTINELS) <= GATE_WINDOW, (
        "gate-front block has outgrown the driver's attestation window; "
        "rotate proven queries out or split the round"
    )


def test_oracle_coverage_is_total():
    """Since r4 every catalog query is oracle-paired — the two former
    rows-only entries run their verification in-plan and emit hashable
    booleans. A new rows-only query should be a deliberate decision."""
    rows_only = {q for q in QUERIES if q not in ORACLE_SQL}
    assert rows_only == set()
