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


def test_no_window_slot_wasted_on_verified_query():
    """Every one of the driver's 50 slots goes to a never-green query as
    long as any exist; a never-green query may overflow (>50 of them in
    some round) but never because a verified one took its slot."""
    reg = load_all()
    green = driver_green_names()
    never = [n for n in reg if n not in green]
    window = list(reg)[:DRIVER_WINDOW]
    overflow = [n for n in never if n not in window]
    if overflow:
        wasted = [n for n in window if n in green]
        assert not wasted, (
            f"{len(overflow)} never-driver-green queries overflow the "
            f"{DRIVER_WINDOW}-slot window while verified queries occupy "
            f"slots: {wasted}"
        )
    # overflow must come from the TAIL of the pinned order (newest debt):
    # an early-pinned (older) name outside the window while a later-pinned
    # one is inside means the rotation regressed
    pin_idx = {n: i for i, n in enumerate(_DRIVER_CHECK_PRIORITY)}
    out_pinned = [pin_idx[n] for n in overflow if n in pin_idx]
    in_pinned = [pin_idx[n] for n in window if n in pin_idx]
    if out_pinned and in_pinned:
        assert min(out_pinned) > max(in_pinned), (
            "an older pinned query overflowed the window while newer pinned "
            "debt occupies a slot"
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


def test_force_recheck_precedes_plain_greens_and_fits_window():
    """Code-changed greens pinned in _FORCE_RECHECK must re-enter the
    window ahead of untouched greens so the driver re-hashes the new
    behavior the same round it ships."""
    from spark_bam_spark.queries import _FORCE_RECHECK

    reg = list(load_all())
    green = driver_green_names()
    forced = [n for n in _FORCE_RECHECK if n in green]
    if not forced:
        return
    window = reg[:DRIVER_WINDOW]
    assert all(n in window for n in forced), "a force-recheck name fell out of the window"
    last_forced = max(reg.index(n) for n in forced)
    plain = [n for n in reg if n in green and n not in _FORCE_RECHECK]
    assert reg.index(plain[0]) > last_forced


def test_greens_rotate_oldest_evidence_first():
    """Already-verified names are ordered by the round of their latest
    green row (stale evidence first) so the 50-slot window re-verifies
    the oldest hashes each round; within one round, bench (headline)
    queries come first."""
    from spark_bam_spark.queries import _FORCE_RECHECK, driver_green_rounds

    reg = load_all()
    rounds = driver_green_rounds()
    plain = [n for n in reg if n in rounds and n not in _FORCE_RECHECK]
    ages = [rounds[n] for n in plain]
    assert ages == sorted(ages), "green rotation is not oldest-evidence-first"
    for rnd in set(ages):
        block = [n for n in plain if rounds[n] == rnd]
        bench_flags = [reg[n].headline or reg[n].headline2 for n in block]
        assert bench_flags == sorted(bench_flags, reverse=True), (
            f"non-bench query precedes a bench query inside the r{rnd} age block"
        )
