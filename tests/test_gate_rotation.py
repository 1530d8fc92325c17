"""Gate-window rotation bookkeeping: verification debt must be
explicit, never silent.

The external driver hash-checks only the FIRST 50 ``queries()``
entries (the ``_PRIORITY`` window) per round, so a newly registered
query can sit unverified forever unless someone notices.  These tests
make that impossible: every registered query must be (a) in the
current window, (b) already driver-checked in some committed
``CORRECTNESS_r*.json``, or (c) explicitly queued for a future
rotation in ``workload._QUEUED_FOR_ROTATION`` — registering a query
without doing one of the three turns the suite red.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    seen: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        seen.update(json.load(open(f)).keys())
    return seen


def test_window_is_exactly_50_known_queries():
    from rainforest_spark import workload

    qs = workload.all_queries()
    assert len(workload._PRIORITY) == 50
    assert len(set(workload._PRIORITY)) == 50, "duplicate window entry"
    unknown = [q for q in workload._PRIORITY if q not in qs]
    assert not unknown, f"window names unregistered queries: {unknown}"
    # the window really is the first 50 the driver will sample
    assert list(qs)[:50] == workload._PRIORITY


def test_no_silent_verification_debt():
    """Every registered query: driver-checked, in-window, or queued."""
    from rainforest_spark import workload

    checked = _driver_checked()
    window = set(workload._PRIORITY)
    queued = set(workload._QUEUED_FOR_ROTATION)
    orphans = [q for q in workload.all_queries()
               if q not in checked and q not in window
               and q not in queued]
    assert not orphans, (
        f"queries with no driver CORRECTNESS row, not in the gate "
        f"window, and not queued for rotation: {orphans} — add them "
        f"to _PRIORITY or _QUEUED_FOR_ROTATION")


def test_queue_entries_are_registered_and_not_redundant():
    from rainforest_spark import workload

    qs = workload.all_queries()
    checked = _driver_checked()
    for q in workload._QUEUED_FOR_ROTATION:
        assert q in qs, f"queued entry {q!r} is not a registered query"
        assert q not in workload._PRIORITY, (
            f"{q!r} is both queued and in-window — drop the queue entry")
        assert q not in checked, (
            f"{q!r} already has a driver row — drop the queue entry")


def test_every_query_has_an_oracle():
    """Standing invariant: zero rows-only entries (CLAUDE.md)."""
    from rainforest_spark import workload

    qs, os_ = workload.all_queries(), workload.all_oracles()
    missing = [q for q in qs if q not in os_]
    assert not missing, f"queries without oracles: {missing}"
