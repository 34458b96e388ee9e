"""Registry evidence-rotation contracts.

ADVICE r15 item 3: ``ROUND_MODIFIED_DEFERRED`` used to be a bare tuple
plus a comment telling the next round's editor to promote its entries
into ``ROUND_MODIFIED`` — nothing failed mechanically if the promotion
was forgotten, so a rewritten key could permanently escape driver
re-verification.  Now each deferred entry carries the round it was
deferred in, and this test fails the suite the moment driver evidence
for that round exists on disk (i.e. the deferring round is over) while
the key still sits un-promoted.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from event_stream_checkout_spark import registry

ROOT = Path(registry.__file__).resolve().parent.parent


def _graded_rounds() -> set[int]:
    """Rounds with a driver CORRECTNESS file on disk."""
    rounds: set[int] = set()
    for f in ROOT.glob("CORRECTNESS_r*.json"):
        m = re.search(r"_r(\d+)", f.name)
        if m:
            rounds.add(int(m.group(1)))
    return rounds


def test_deferred_entries_carry_round_stamps():
    for entry in registry.ROUND_MODIFIED_DEFERRED:
        assert (
            isinstance(entry, tuple)
            and len(entry) == 2
            and isinstance(entry[0], str)
            and isinstance(entry[1], int)
        ), (
            "ROUND_MODIFIED_DEFERRED entries must be (key, deferred_in_round) "
            f"pairs, got {entry!r} — the round stamp is what makes the "
            "promotion contract mechanically checkable"
        )


def test_expired_deferrals_are_promoted():
    """A deferral from round R expires once CORRECTNESS_rR exists.

    The driver writes CORRECTNESS_r{R}.json at the END of round R; its
    presence means the deferring round is over and the next window is
    being built — the key must now be in ROUND_MODIFIED or it escapes
    driver re-grading forever.
    """
    graded = _graded_rounds()
    if not graded:
        return  # cold checkout before round 1: nothing can be expired
    latest = max(graded)
    expired = [
        key
        for key, deferred_in in registry.ROUND_MODIFIED_DEFERRED
        if latest >= deferred_in
    ]
    assert not expired, (
        f"deferred re-grades from a finished round (evidence through "
        f"r{latest} is on disk) must be promoted into ROUND_MODIFIED: "
        f"{expired}"
    )


def test_round_modified_keys_are_registered():
    queries = registry.load_all()
    missing = [k for k in registry.ROUND_MODIFIED if k not in queries]
    assert not missing, f"ROUND_MODIFIED names unregistered keys: {missing}"
    missing_deferred = [
        k for k, _ in registry.ROUND_MODIFIED_DEFERRED if k not in queries
    ]
    assert not missing_deferred, (
        f"ROUND_MODIFIED_DEFERRED names unregistered keys: {missing_deferred}"
    )


def test_round_modified_leads_driver_window_after_ungraded():
    """load_all puts never-graded keys first, then ROUND_MODIFIED —
    so every promoted re-grade lands inside the driver's 50-key window
    as long as (new keys + promotions) <= 50."""
    ordered = list(registry.load_all())
    never_graded = [k for k in ordered if k not in registry.DRIVER_VERIFIED]
    window = ordered[:50]
    for key in registry.ROUND_MODIFIED:
        if len(never_graded) + len(registry.ROUND_MODIFIED) <= 50:
            assert key in window, (
                f"promoted re-grade {key!r} fell outside the 50-key "
                "driver window"
            )


def test_driver_evidence_loader_matches_files():
    """LATEST_GREEN must reflect the on-disk evidence (spot-check the
    newest file so a parser regression cannot silently zero the
    rotation)."""
    graded = _graded_rounds()
    if not graded:
        return
    latest = max(graded)
    rows = json.loads((ROOT / f"CORRECTNESS_r{latest}.json").read_text())
    for key, row in rows.items():
        if isinstance(row, dict) and row.get("err") is None and row.get("hash_match") is True:
            assert registry.LATEST_GREEN.get(key, 0) >= latest, (
                f"{key} graded green in r{latest} but LATEST_GREEN says "
                f"{registry.LATEST_GREEN.get(key)}"
            )
