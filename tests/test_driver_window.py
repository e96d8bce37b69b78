"""Invariants on the driver verification window.

The external correctness driver checks the FIRST 50 entries of load_all()
each round.  These tests pin the rotation contract: every query that has
never received a passing driver row sits inside that window, oldest debt
first, so verification coverage converges to 100% across rounds instead of
leaving a permanently-unchecked tail.
"""

from __future__ import annotations

from spark_bam_spark.queries import (
    _DRIVER_CHECK_PRIORITY,
    REGISTRY,
    driver_green_names,
    load_all,
)

DRIVER_WINDOW = 50


def test_never_green_names_fit_driver_window():
    reg = load_all()
    green = driver_green_names()
    never = [n for n in reg if n not in green]
    window = list(reg)[:DRIVER_WINDOW]
    overflow = [n for n in never if n not in window]
    assert not overflow, (
        f"{len(never)} never-driver-green queries but these fall outside the "
        f"first {DRIVER_WINDOW} load_all() slots: {overflow}. Either the "
        f"registry gained too many new queries this round (cap additions so "
        f"debt fits the window) or the ordering regressed."
    )


def test_pinned_debt_precedes_new_registrations():
    """A query registered after the pinned tuple was drafted must not
    displace pinned (older) unverified names."""
    reg = list(load_all())
    green = driver_green_names()
    pinned_unverified = [n for n in _DRIVER_CHECK_PRIORITY if n in REGISTRY and n not in green]
    assert reg[: len(pinned_unverified)] == pinned_unverified


def test_priority_names_all_registered():
    load_all()
    missing = [n for n in _DRIVER_CHECK_PRIORITY if n not in REGISTRY]
    assert not missing, f"stale names in _DRIVER_CHECK_PRIORITY: {missing}"


def test_verified_names_sorted_after_unverified():
    reg = list(load_all())
    green = driver_green_names()
    if not green:  # fresh checkout without CORRECTNESS_r*.json history
        return
    first_green = min(i for i, n in enumerate(reg) if n in green)
    assert all(n in green for n in reg[first_green:]), (
        "an unverified query is ordered after a verified one"
    )
