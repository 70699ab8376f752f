"""Tri-coordinate-frame conversion tests (SURVEY §2.2: this is where
off-by-one / transpose bugs live — pin them down)."""

import pytest

from camkifu_tpu.gamemodel.move import B, E, W, Move, opposite


def test_sgf_frame_column_first():
    # 'pd' = column 15 ('p'), row 3 ('d')
    m = Move("sgf", (B, "pd"))
    assert (m.row, m.col) == (3, 15)
    assert m.get_coord("sgf") == "pd"


def test_np_frame_roundtrip():
    m = Move("np", (W, 3, 15))
    assert m.get_coord("sgf") == "pd"
    assert m.get_coord("np") == (3, 15)


def test_tk_frame_roundtrip():
    scale = 32.0
    m = Move("np", (B, 7, 2))
    x, y = m.get_coord("tk", canvas_scale=scale)
    assert (x, y) == ((2 + 0.5) * 32.0, (7 + 0.5) * 32.0)
    back = Move("tk", (B, x, y), canvas_scale=scale)
    assert back == m


def test_tk_frame_rounds_to_nearest_intersection():
    scale = 30.0
    m = Move("tk", (W, 0.5 * 30 + 13, 18.5 * 30 - 13), canvas_scale=scale)
    assert (m.row, m.col) == (18, 0)


def test_pass_move():
    m = Move("sgf", (B, ""))
    assert m.is_pass
    assert m.get_coord("sgf") == ""
    tt = Move("sgf", (B, "tt"))  # 'tt' = pass on boards <= 19
    assert tt.is_pass


def test_corners():
    assert Move("sgf", (B, "aa")).get_coord("np") == (0, 0)
    assert Move("sgf", (B, "ss")).get_coord("np") == (18, 18)


def test_off_board_raises():
    with pytest.raises(ValueError):
        Move("np", (B, 19, 0))
    with pytest.raises(ValueError):
        Move("np", (B, -1, 5))


def test_equality_ignores_number():
    a = Move("np", (B, 3, 3), number=1)
    b = Move("np", (B, 3, 3), number=9)
    assert a == b and hash(a) == hash(b)
    assert a != Move("np", (W, 3, 3))


def test_opposite():
    assert opposite(B) == W and opposite(W) == B
    with pytest.raises(ValueError):
        opposite(E)
