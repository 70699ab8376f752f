"""Move extraction from board-state readings, incl. the capture feedback loop."""

import numpy as np

from camkifu_tpu.core.gamesync import MoveExtractor, score_moves
from camkifu_tpu.gamemodel.move import B, W, Move


def grid(*stones):
    g = np.zeros((19, 19), np.int8)
    for color, r, c in stones:
        g[r, c] = 1 if color == B else 2
    return g


def test_single_moves_in_sequence():
    ex = MoveExtractor()
    assert ex.advance(grid((B, 3, 3))) == [Move("np", (B, 3, 3))]
    # Same reading again: idempotent.
    assert ex.advance(grid((B, 3, 3))) == []
    assert ex.advance(grid((B, 3, 3), (W, 15, 15))) == [Move("np", (W, 15, 15))]
    assert [m.number for m in ex.moves] == [1, 2]


def test_two_stone_catchup_prefers_alternation():
    ex = MoveExtractor()
    ex.advance(grid((B, 0, 0)))
    # Reading jumps ahead by a W and a B move (hand blocked the camera).
    out = ex.advance(grid((B, 0, 0), (W, 9, 9), (B, 5, 5)))
    assert [m.color for m in out] == [W, B]
    assert len(ex.moves) == 3


def test_capture_consistency():
    ex = MoveExtractor()
    # B surrounds W at (0,0): sequence B(0,1), W(0,0), B(1,0) captures W.
    ex.advance(grid((B, 0, 1)))
    ex.advance(grid((B, 0, 1), (W, 0, 0)))
    # Post-capture physical reading: W gone, B(1,0) new.
    out = ex.advance(grid((B, 0, 1), (B, 1, 0)))
    assert out == [Move("np", (B, 1, 0))]
    # Extractor's own state agrees: capture applied.
    assert ex.state()[0, 0] == 0
    assert len(ex.moves) == 3


def test_capture_with_stone_still_visible_one_frame():
    """Physical removal lags: the new stone appears while the captured stone
    is still on the board in the reading — move is still accepted; the next
    reading (stone removed) must then be consistent, not re-emit."""
    ex = MoveExtractor()
    ex.advance(grid((B, 0, 1)))
    ex.advance(grid((B, 0, 1), (W, 0, 0)))
    out = ex.advance(grid((B, 0, 1), (W, 0, 0), (B, 1, 0)))
    assert out == [Move("np", (B, 1, 0))]
    # Now the player removes the captured stone; reading matches rules state.
    assert ex.advance(grid((B, 0, 1), (B, 1, 0))) == []
    assert ex.state()[0, 0] == 0


def test_unexplained_disappearance_rejected():
    ex = MoveExtractor()
    ex.advance(grid((B, 3, 3)))
    ex.advance(grid((B, 3, 3), (W, 9, 9)))
    # B(3,3) vanishes while W(4,4) appears — no capture explains that. The
    # out-of-turn W is first *held* (it might be a late-committing pair);
    # after the hold expires the unexplained disappearance is rejected.
    bad = grid((W, 9, 9), (W, 4, 4))
    for _ in range(MoveExtractor.HOLD_READINGS + 1):
        assert ex.advance(bad) == []
    assert ex.rejected >= 1
    assert len(ex.moves) == 2


def test_out_of_order_commits_reordered_by_hold():
    """Two moves commit in reverse order (the second stabilized first); the
    hold lets the true order come out."""
    ex = MoveExtractor()
    ex.advance(grid((B, 3, 3)))
    # W(5,5) then B(7,7) were played, but B's stone commits first… no wait:
    # next is W, and a B stone appears first — out of turn, held.
    assert ex.advance(grid((B, 3, 3), (B, 7, 7))) == []
    # …two readings later the W stone commits too.
    out = ex.advance(grid((B, 3, 3), (B, 7, 7), (W, 5, 5)))
    assert [(m.color, m.row, m.col) for m in ex.moves] == \
        [("B", 3, 3), ("W", 5, 5), ("B", 7, 7)]


def test_hold_expires_for_genuine_nonalternation():
    """Free placement / handicap: a second same-color move really happened;
    it must still be recorded once the hold expires."""
    ex = MoveExtractor()
    ex.advance(grid((B, 3, 3)))
    two_b = grid((B, 3, 3), (B, 15, 15))
    out = []
    for _ in range(MoveExtractor.HOLD_READINGS + 1):
        out += ex.advance(two_b)
    assert out == [Move("np", (B, 15, 15))]


def test_color_flip_rejected():
    ex = MoveExtractor()
    ex.advance(grid((B, 3, 3)))
    assert ex.advance(grid((W, 3, 3))) == []
    assert ex.rejected == 1


def test_correction_feedback():
    ex = MoveExtractor()
    ex.advance(grid((B, 3, 3)))
    ex.advance(grid((B, 3, 3), (W, 9, 9)))
    # Human: the W stone was actually at (9, 10).
    ex.apply_correction(Move("np", (W, 9, 9)), Move("np", (W, 9, 10)))
    assert ex.state()[9, 9] == 0 and ex.state()[9, 10] == 2
    assert ex.moves[1] == Move("np", (W, 9, 10))
    # Human deletes a stone.
    ex.apply_correction(Move("np", (B, 3, 3)), None)
    assert ex.state()[3, 3] == 0 and len(ex.moves) == 1
    # Human adds a stone vision missed.
    ex.apply_correction(None, Move("np", (B, 5, 5)))
    assert ex.state()[5, 5] == 1


def test_score_moves():
    ref = [Move("np", (B, 1, 1)), Move("np", (W, 2, 2)), Move("np", (B, 3, 3))]
    det = [Move("np", (B, 1, 1)), Move("np", (W, 2, 3))]
    s = score_moves(det, ref)
    assert s["good"] == 1 and s["wrong"] == 1 and s["missing"] == 1
    assert abs(s["agreement"] - 1 / 3) < 1e-9
    assert score_moves(ref, ref)["agreement"] == 1.0


def test_score_moves_aligned_after_early_miss():
    """A dropped move 3 must score the remaining N-1 moves as good
    (alignment, not positional zip)."""
    from camkifu_tpu.utils.synth import sample_moves

    ref = sample_moves(12, seed=3)
    det = ref[:2] + ref[3:]                       # move 3 missed
    s = score_moves(det, ref)
    assert s["good"] == 11 and s["missing"] == 1
    assert s["wrong"] == 0 and s["extra"] == 0
    assert abs(s["agreement"] - 11 / 12) < 1e-9


def test_score_moves_extra_and_substitution():
    from camkifu_tpu.utils.synth import sample_moves

    ref = sample_moves(10, seed=5)
    used = {(m.row, m.col) for m in ref}
    spot = next((r, c) for r in range(19) for c in range(19)
                if (r, c) not in used)
    phantom = Move("np", (B,) + spot)
    assert phantom not in ref
    det = ref[:4] + [phantom] + ref[4:]           # phantom insertion
    s = score_moves(det, ref)
    assert s["good"] == 10 and s["extra"] == 1 and s["missing"] == 0
    # One move read at the wrong intersection → exactly one "wrong".
    det2 = list(ref)
    spot2 = next((r, c) for r in range(18, -1, -1) for c in range(18, -1, -1)
                 if (r, c) not in used and (r, c) != spot)
    det2[6] = Move("np", (det2[6].color,) + spot2, gsize=19)
    s2 = score_moves(det2, ref)
    assert s2["good"] == 9 and s2["wrong"] == 1
    assert s2["missing"] == 0 and s2["extra"] == 0


def test_multistone_capture_removal_lag_no_phantom():
    """B captures a 2-stone W group; readings keep showing the captured
    stones for many frames (physical removal lags through the removing
    hand's occlusion). Re-placing ONE of them is legal (the vacated
    neighbor is a liberty), so without the pending-capture filter a
    phantom W move is emitted."""
    ex = MoveExtractor()
    # W group at (0,0),(0,1); B at (1,0),(1,1),(0,2) captures it.
    seq = [grid((W, 0, 0)),
           grid((W, 0, 0), (B, 1, 0)),
           grid((W, 0, 0), (B, 1, 0), (W, 0, 1)),
           grid((W, 0, 0), (B, 1, 0), (W, 0, 1), (B, 1, 1))]
    for s in seq:
        ex.advance(s)
    # The capturing move: B(0,2). Reading still shows the captured group.
    lagged = grid((W, 0, 0), (B, 1, 0), (W, 0, 1), (B, 1, 1), (B, 0, 2))
    out = ex.advance(lagged)
    assert out == [Move("np", (B, 0, 2))]
    assert ex.state()[0, 0] == 0 and ex.state()[0, 1] == 0
    # Stale group persists across MANY readings: no phantom W moves.
    for _ in range(30):
        assert ex.advance(lagged) == []
    assert len(ex.moves) == 5
    # One transient misread (removing hand grazes a dead stone: the point
    # flashes E for a single reading) must NOT drop the pending entry —
    # the stale stone re-reading as "new" next frame would otherwise be
    # emitted as a phantom W move.
    flash = grid((B, 1, 0), (W, 0, 1), (B, 1, 1), (B, 0, 2))  # (0,0) reads E
    assert ex.advance(flash) == []
    assert ex.advance(lagged) == []            # stale stone back: filtered
    assert len(ex.moves) == 5
    # Physical removal arrives: consistent, nothing new emitted.
    clean = grid((B, 1, 0), (B, 1, 1), (B, 0, 2))
    assert ex.advance(clean) == []
    # The cleared points are live again: W playing into the vacated area
    # (not on a suicide point) is a real move.
    out = ex.advance(grid((B, 1, 0), (B, 1, 1), (B, 0, 2), (W, 5, 5)))
    assert out == [Move("np", (W, 5, 5))]


def test_stale_capture_mask_tracks_pending_removal():
    """The mask flags exactly the captured-awaiting-removal points that the
    reading still shows, and clears per point once the reading catches up
    (the contradiction tracker keys off this)."""
    ex = MoveExtractor()
    for s in [grid((W, 0, 0)), grid((W, 0, 0), (B, 1, 0))]:
        ex.advance(s)
    lagged = grid((W, 0, 0), (B, 1, 0), (B, 0, 1))   # B captures W(0,0)
    ex.advance(lagged)
    m = ex.stale_capture_mask(lagged)
    assert m[0, 0] and m.sum() == 1
    # Reading catches up: the point is empty now → mask clears.
    clean = grid((B, 1, 0), (B, 0, 1))
    ex.advance(clean)
    assert not ex.stale_capture_mask(clean).any()


def test_ko_recapture_never_seen_empty_repairs_after_ttl():
    """Too-fast ko: W recaptures at the pending-removal point so fast the
    reading NEVER shows it empty. The pending filter must not suppress the
    recapture forever — after PENDING_CAPTURE_TTL the stale entry expires
    and the extractor emits the late real move (capturing B's ko stone)."""
    from camkifu_tpu.core.gamesync import PENDING_CAPTURE_TTL

    ex = MoveExtractor()
    p, q = (5, 5), (5, 4)
    setup = [(B, 4, 5), (W, 4, 4), (B, 6, 5), (W, 6, 4), (B, 5, 6),
             (W, 5, 3), (B, 16, 16), (W, *p)]
    stones = []
    for s in setup:
        stones.append(s)
        ex.advance(grid(*stones))
    # B takes the ko: captures W at p.
    stones.append((B, *q))
    out = ex.advance(grid(*stones))
    assert out == [Move("np", (B, *q))]
    assert ex.state()[p] == 0
    # W recaptures during the same occlusion: the reading never shows p
    # empty; q (B's captured ko stone) clears once physically lifted.
    after = [s for s in stones if (s[1], s[2]) != q]   # W@p still listed
    reading = grid(*after)
    for _ in range(PENDING_CAPTURE_TTL - 1):
        assert ex.advance(reading) == []
    out = ex.advance(reading)                          # TTL expired
    assert out == [Move("np", (W, *p))]
    assert ex.state()[q] == 0 and ex.state()[p] == 2
    assert [(m.color, m.row, m.col) for m in ex.moves[-2:]] == \
        [("B", *q), ("W", *p)]


def test_apply_correction_is_atomic_on_divergence():
    """A relocate whose replacement is illegal against the extractor's
    state must apply NOTHING (previously: removal confirmed, replacement
    raised out — half-applied, extractor desynchronized)."""
    ex = MoveExtractor()
    ex.advance(grid((B, 3, 3)))
    before = ex.state().copy()
    # Relocate B(3,3) onto (3,3) itself-occupied... use an occupied target:
    ex.advance(grid((B, 3, 3), (W, 9, 9)))
    before = ex.state().copy()
    ex.apply_correction(Move("np", (B, 3, 3)),
                        Move("np", (B, 9, 9)))   # target occupied by W
    assert np.array_equal(ex.state(), before)
    assert [m.coord_tuple() if hasattr(m, 'coord_tuple') else
            (m.color, m.row, m.col) for m in ex.moves] == \
        [(B, 3, 3), (W, 9, 9)]


def test_apply_correction_deletes_last_occurrence_only():
    """Move equality is (color, position); after a capture + legal replay
    the same (color, point) appears twice in the move list — deleting one
    must not strip both."""
    ex = MoveExtractor()
    ex.moves = [Move("np", (B, 2, 2), number=1),
                Move("np", (W, 5, 5), number=2),
                Move("np", (B, 2, 2), number=3)]
    ex.rule.put(Move("np", (B, 2, 2)), reset=True)
    ex.rule.confirm()
    ex.apply_correction(Move("np", (B, 2, 2)), None)
    assert [m.number for m in ex.moves] == [1, 2]
