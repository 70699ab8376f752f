"""Rules engine: captures, suicide, staging semantics (SURVEY §2.2)."""

import pytest

from camkifu_tpu.gamemodel.move import B, E, W, Move
from camkifu_tpu.gamemodel.rules import IllegalMove, Rule, RuleUnsafe


def put(rule, color, row, col):
    captured = rule.put(Move("np", (color, row, col), gsize=rule.gsize))
    rule.confirm()
    return captured


def test_simple_put_and_occupied():
    r = RuleUnsafe()
    put(r, B, 3, 3)
    assert r[3, 3] == B
    with pytest.raises(IllegalMove):
        r.put(Move("np", (W, 3, 3)))


def test_single_stone_capture():
    r = RuleUnsafe()
    # White stone at (0, 0) in the corner, black takes both liberties.
    put(r, W, 0, 0)
    put(r, B, 0, 1)
    captured = put(r, B, 1, 0)
    assert captured == [Move("np", (W, 0, 0))]
    assert r[0, 0] == E


def test_group_capture_returns_all_stones():
    r = RuleUnsafe()
    # White group (5,5),(5,6); black surrounds.
    put(r, W, 5, 5)
    put(r, W, 5, 6)
    for rc in [(4, 5), (4, 6), (6, 5), (6, 6), (5, 4)]:
        assert put(r, B, *rc) == []
    captured = put(r, B, 5, 7)
    assert sorted((m.row, m.col) for m in captured) == [(5, 5), (5, 6)]
    assert all(m.color == W for m in captured)
    assert r[5, 5] == E and r[5, 6] == E


def test_suicide_illegal_by_default():
    r = RuleUnsafe()
    put(r, B, 0, 1)
    put(r, B, 1, 0)
    with pytest.raises(IllegalMove):
        r.put(Move("np", (W, 0, 0)))


def test_capture_beats_suicide():
    r = RuleUnsafe()
    # B stones (0,1),(1,0) each have (0,0) as their only liberty once W holds
    # (0,2),(1,1),(2,0). W playing (0,0) fills its own last liberty but captures
    # both B stones first, so the move is legal.
    put(r, B, 0, 1)
    put(r, B, 1, 0)
    put(r, W, 0, 2)
    put(r, W, 1, 1)
    put(r, W, 2, 0)
    caps = put(r, W, 0, 0)
    assert sorted((m.row, m.col) for m in caps) == [(0, 1), (1, 0)]
    assert r[0, 0] == W


def test_staging_discard_leaves_grid_untouched():
    r = RuleUnsafe()
    r.put(Move("np", (B, 9, 9)))
    r.discard()
    assert r[9, 9] == E
    with pytest.raises(IllegalMove):
        r.confirm()


def test_remove():
    r = RuleUnsafe()
    put(r, B, 2, 2)
    r.remove(Move("np", (B, 2, 2)))
    r.confirm()
    assert r[2, 2] == E
    with pytest.raises(IllegalMove):
        r.remove(Move("np", (B, 2, 2)))


def test_as_labels():
    r = Rule()
    put(r, B, 0, 0)
    put(r, W, 18, 18)
    labels = r.as_labels()
    assert labels[0, 0] == 1 and labels[18, 18] == 2 and labels.sum() == 3


def test_pass_is_legal_noop():
    r = RuleUnsafe()
    assert r.put(Move("sgf", (B, ""))) == []
    r.confirm()
    assert (r.stones == E).all()


def _ko_position(rule):
    # B diamond around (1,1) holding a W stone; W diamond around (1,2).
    for color, r, c in [(B, 0, 1), (W, 0, 2), (B, 1, 0), (W, 1, 3),
                        (B, 2, 1), (W, 2, 2), (W, 1, 1)]:
        put(rule, color, r, c)
    caps = put(rule, B, 1, 2)             # B takes the ko
    assert caps == [Move("np", (W, 1, 1))]


def test_ko_allowed_by_default():
    r = RuleUnsafe()
    _ko_position(r)
    caps = put(r, W, 1, 1)                # immediate recapture: physical
    assert caps == [Move("np", (B, 1, 2))]   # boards can do this; record it


def test_ko_rejected_when_enforced():
    r = RuleUnsafe(enforce_ko=True)
    _ko_position(r)
    with pytest.raises(IllegalMove, match="ko"):
        r.put(Move("np", (W, 1, 1)))
    # After a ko threat elsewhere, the recapture becomes legal.
    put(r, W, 9, 9)
    put(r, B, 15, 15)
    caps = put(r, W, 1, 1)
    assert caps == [Move("np", (B, 1, 2))]
