"""Driver-emission-order regression tests (VERDICT r2 findings #1/#8).

The driver's correctness run is budget-capped (~50 slots/round) and
walks ``queries()`` in dict order, so the order IS the verification
coverage policy: keys without a green row in any committed
CORRECTNESS_r*.json must come first, SQL-oracled before rows-only,
expensive Pregel fixpoints last.
"""

from __future__ import annotations

from ezbake_graph_spark import registry


def _classes() -> list[tuple[str, int]]:
    keys = list(registry.queries())
    green = registry._driver_green()
    checked = registry._checked_rounds()
    out = []
    for k in keys:
        spec = registry.REGISTRY[k]
        pregel = "pregel" in spec.tags
        g = k in green or (spec.oracle is None and k in checked)
        if k in registry._RECENTLY_CHANGED:
            c = -1  # code changed since last driver row: re-verify first
            out.append((k, c))
            continue
        if not g and pregel:
            c = 4
        elif not g and spec.oracle is not None:
            c = 0
        elif not g:
            c = 1
        else:
            # round 10: ONE green rotation class (Pregel no longer
            # outranks non-Pregel; staleness alone orders re-checks)
            c = 2
        out.append((k, c))
    return out


def _tail_override() -> set[str]:
    """Keys the window-tail promotion may splice out of class order
    (VERDICT r3 item 4): the never-green oracled Pregel fixpoints
    (registry-derived) + the stale-rotation pair."""
    return set(registry._promoted_pregel()) | set(registry._ROTATE_PREGEL)


def test_never_verified_keys_emit_first():
    cls = [c for k, c in _classes() if k not in _tail_override()]
    assert cls == sorted(cls), "registry emission order must be class-sorted"


def test_all_never_green_oracled_precede_all_green():
    seen_green = False
    for key, c in _classes():
        if key in _tail_override():
            continue
        if c >= 2:
            seen_green = True
        if c == 0:
            assert not seen_green, f"never-verified oracled key {key} emitted after green keys"


def test_pregel_promotion_lands_in_driver_window():
    """EVERY oracled-but-never-green Pregel fixpoint must appear inside
    the driver's ~50-slot window (the plain classifier puts never-green
    Pregel strictly last, so without the splice a window never reaches
    them — the VERDICT r3 defect), at the TAIL so they displace as few
    cheap first-time slots as possible. Registry-derived: a Pregel key
    that gains an oracle in a future round is covered automatically."""
    keys = list(registry.queries())
    expected = registry._promoted_pregel()
    tail_len = len(expected) + len(registry._ROTATE_PREGEL)
    for k in expected:
        pos = keys.index(k)
        assert pos < registry._WINDOW, f"{k} at {pos} — outside driver window"
        assert pos >= registry._WINDOW - tail_len, f"{k} at {pos} — should sit at window tail"


def test_green_keys_emit_stalest_round_first():
    """VERDICT r6 #2: within the green class, keys re-emit ordered by
    the round of their latest green driver row (oldest first), so the
    window's spare slots continuously re-validate the stalest records
    (22 join/graph keys were last checked in r2, 4 rounds stale).
    Round 10: Pregel keys rotate in the SAME class, so they are no
    longer excluded here — only the tail-splice override is."""
    keys = list(registry.queries())
    green = registry._driver_green()
    rounds = registry._latest_green_round()
    checked = registry._checked_rounds()
    override = _tail_override()
    seen = [
        rounds.get(k, checked.get(k, 0))
        for k in keys
        if (k in green or (registry.REGISTRY[k].oracle is None and k in checked))
        and k not in override
        and k not in registry._RECENTLY_CHANGED
    ]
    assert seen == sorted(seen), "green keys must emit oldest-green-round first"
    assert min(rounds.values()) < max(rounds.values())  # rotation is non-trivial


def test_green_set_reads_correctness_files():
    green = registry._driver_green()
    # r1/r2 are committed in-repo; the union was 52 keys at round-3 start
    assert "agg_pricing_q1" in green
    assert "join_star_q5" in green
    assert len(green) >= 52


def test_window_head_is_the_stalest_cohort():
    """Retires the r8 never-checked sentinel (every registry key has a
    driver row as of CORRECTNESS_r09; its own assert message said to
    retire it) and replaces it with the steady-state policy (VERDICT
    r9 #8): with coverage complete, the driver window's spare slots
    must be spent on the STALEST records — every re-verification slot
    inside the window (behind the ``_RECENTLY_CHANGED`` front,
    excluding the Pregel tail splice) must be at least as stale as
    every same-class key left outside the window. New keys without any
    driver row still jump ahead via the never-checked classes; this
    test only pins the rotation once they're checked."""
    keys = list(registry.queries())
    checked = registry._checked_rounds()
    never = {
        k
        for k, spec in registry.REGISTRY.items()
        if k not in checked
        and "pregel" not in spec.tags
        and k not in registry._RECENTLY_CHANGED
    }
    # Brand-new keys (no driver row yet) are expected between rounds;
    # they must land inside the driver window, ahead of every
    # re-verification slot (the never-checked classes sort first).
    override = _tail_override()
    for k in never:
        pos = keys.index(k)
        assert pos < registry._WINDOW, f"new key {k} outside driver window"
    rounds = registry._latest_green_round()

    def staleness(k):
        return rounds.get(k, checked.get(k, 0))

    rotation = [
        k
        for k in keys
        if k not in override
        and k not in registry._RECENTLY_CHANGED
        and k in checked
    ]
    n_window = sum(1 for k in keys[: registry._WINDOW] if k in set(rotation))
    inside, outside = rotation[:n_window], rotation[n_window:]
    assert inside and outside, "rotation degenerate: widen the registry"
    assert max(staleness(k) for k in inside) <= min(
        staleness(k) for k in outside
    ), "window head must be drawn from the stalest checked cohort"


def test_recently_changed_keys_are_registered():
    """Round rule (VERDICT r12 #10): the commit that rewrites a kernel
    must queue its registry keys in ``_RECENTLY_CHANGED``. A typo'd key
    would silently fail to re-verify — every entry must resolve to a
    registered key (the companion emission test below tolerates missing
    keys by design, so this is the strict guard)."""
    registry.queries()
    unknown = [k for k in registry._RECENTLY_CHANGED if k not in registry.REGISTRY]
    assert not unknown, f"_RECENTLY_CHANGED contains unregistered keys: {unknown}"


def test_recently_changed_fit_in_driver_window():
    """The re-verify front must leave room for rotation: if the list
    outgrows half the ~50-slot window, staleness draining stalls."""
    assert len(registry._RECENTLY_CHANGED) <= registry._WINDOW // 2


def test_recently_changed_keys_emit_at_window_front():
    """VERDICT r7 #7: a key whose implementation changed since its
    last driver row must be re-verified in the NEXT round — such keys
    jump to the very front of the emission order, ahead of even
    first-time keys."""
    keys = list(registry.queries())
    changed = [k for k in registry._RECENTLY_CHANGED if k in registry.REGISTRY]
    assert changed, "round with no changed keys: empty the list instead"
    front = keys[: len(changed)]
    assert set(front) == set(changed), (
        f"changed keys not at window front: {front} vs {changed}"
    )
