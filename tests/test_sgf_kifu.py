"""SGF parser/serializer round-trips and Kifu behavior (SURVEY §2.2)."""

import pytest

from camkifu_tpu.gamemodel import sgf
from camkifu_tpu.gamemodel.kifu import Kifu
from camkifu_tpu.gamemodel.move import B, W, Move

SAMPLE = "(;FF[4]GM[1]SZ[19]PB[Hon.]PW[Go S.]KM[0];B[pd];W[dp];B[qp]\n(;W[dd];B[oq])(;W[cd]))"


def test_parse_mainline_and_variations():
    col = sgf.parse(SAMPLE)
    assert len(col) == 1
    game = col[0]
    main = game.mainline()
    assert main[0].get("SZ") == "19"
    moves = [(k, n.get(k)) for n in main for k in ("B", "W") if k in n]
    assert moves == [("B", "pd"), ("W", "dp"), ("B", "qp"), ("W", "dd"), ("B", "oq")]
    assert len(game.variations) == 2


def test_escaped_values_roundtrip():
    raw = r"(;FF[4]C[bracket \] and backslash \\ here];B[aa])"
    col = sgf.parse(raw)
    assert col[0].nodes[0].get("C") == "bracket ] and backslash \\ here"
    again = sgf.parse(sgf.serialize(col))
    assert again[0].nodes[0].get("C") == "bracket ] and backslash \\ here"


def test_serialize_parse_roundtrip_stable():
    col = sgf.parse(SAMPLE)
    text1 = sgf.serialize(col)
    text2 = sgf.serialize(sgf.parse(text1))
    assert text1 == text2


def test_parse_errors():
    with pytest.raises(sgf.SgfError):
        sgf.parse("not sgf at all")
    with pytest.raises(sgf.SgfError):
        sgf.parse("(;B[aa")


def test_kifu_append_and_numbering():
    k = Kifu()
    k.append(Move("np", (B, 3, 15)))
    k.append(Move("np", (W, 15, 3)))
    moves = k.moves()
    assert [m.number for m in moves] == [1, 2]
    assert moves[0] == Move("np", (B, 3, 15))
    assert k.next_color() == B
    assert k.lastmove() == Move("np", (W, 15, 3))
    assert k.modified


def test_kifu_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "game.sgf")
    k = Kifu.new(path)
    k.set_info("PB", "vision")
    for i, (c, r, cc) in enumerate([(B, 3, 3), (W, 15, 15), (B, 15, 2)]):
        k.append(Move("np", (c, r, cc)))
    k.save()
    assert not k.modified

    k2 = Kifu.load(path)
    assert [m.get_coord("np") for m in k2.moves()] == [(3, 3), (15, 15), (15, 2)]
    assert k2.get_info("PB") == "vision"
    assert k2.gsize == 19

    # Resume: appending to a loaded kifu continues the game (checkpoint/resume).
    k2.append(Move("np", (W, 0, 0)))
    assert len(k2) == 4 and k2.modified


def test_kifu_delete_and_relocate():
    k = Kifu()
    k.append(Move("np", (B, 3, 3)))
    k.append(Move("np", (W, 5, 5)))
    k.append(Move("np", (B, 7, 7)))
    k.delete(Move("np", (W, 5, 5)))
    assert [m.get_coord("np") for m in k.moves()] == [(3, 3), (7, 7)]
    k.relocate(Move("np", (B, 7, 7)), Move("np", (B, 7, 8)))
    assert k.moves()[-1] == Move("np", (B, 7, 8))
    with pytest.raises(KeyError):
        k.delete(Move("np", (W, 9, 9)))


def test_kifu_load_mainline_of_variationful_game(tmp_path):
    path = tmp_path / "var.sgf"
    path.write_text(SAMPLE)
    k = Kifu.load(str(path))
    assert [m.get_coord("sgf") for m in k.moves()] == ["pd", "dp", "qp", "dd", "oq"]


def test_parse_tolerates_bom_crlf_and_lowercase():
    raw = "﻿(;ff[4]gm[1]SZ[19]\r\n;B[aa]\r\n;W[bb])"
    col = sgf.parse(raw.lstrip("﻿"))
    main = col[0].mainline()
    assert main[0].get("FF") == "4"          # lowercase idents normalized
    assert [n.get(k) for n in main for k in ("B", "W") if k in n] == \
        ["aa", "bb"]


def test_parse_multi_game_collection():
    col = sgf.parse("(;FF[4];B[aa]) (;FF[4];B[bb])")
    assert len(col) == 2
    assert col[1].nodes[1].get("B") == "bb"


def test_kifu_load_strips_bom(tmp_path):
    path = tmp_path / "bom.sgf"
    path.write_bytes("﻿(;FF[4]SZ[19];B[cc])".encode("utf-8"))
    k = Kifu.load(str(path))
    assert k.moves()[0].get_coord("sgf") == "cc"


def test_problem_sgf_with_liberty_less_setup_group_loads(tmp_path):
    """SGF setup properties (AB/AW) are position edits, not moves: a valid
    problem file can set up a liberty-less group whose surround is listed
    later in the same node. Routing setup through move legality raised
    'suicide' and made such files unloadable (r3 review finding)."""
    from camkifu_tpu.core.controllerv import Controller

    # W stones at aa, ba have no liberties once the B surround is placed —
    # and the B stones are listed AFTER them in the same node.
    sgf = ("(;FF[4]GM[1]SZ[19]"
           "AW[aa][ba]AB[ca][ab][bb]"
           ";B[pd];W[dp])")
    p = tmp_path / "problem.sgf"
    p.write_text(sgf)
    ctrl = Controller(str(p))                 # must not raise
    stones = ctrl.rules.copystones()
    assert stones[0, 0] == "W" and stones[0, 1] == "W"   # kept, not captured
    assert stones[0, 2] == "B" and stones[1, 0] == "B"
    assert len(ctrl.kifu) == 2
