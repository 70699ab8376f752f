"""filecheck on a real encoded video + reference SGF (SURVEY §3.5 exactly)."""

import numpy as np

from camkifu_tpu import filecheck
from camkifu_tpu.gamemodel.kifu import Kifu
from camkifu_tpu.utils import synth

HW = (360, 640)


def test_filecheck_video_against_reference_sgf(tmp_path):
    import cv2

    moves = synth.sample_moves(5, seed=17)
    corners = synth.default_corners(HW)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=3, frame_hw=HW, empty_leadin=1)]

    video = str(tmp_path / "game.mp4")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (HW[1], HW[0]))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    ref = str(tmp_path / "ref.sgf")
    kifu = Kifu.new(ref)
    for m in moves:
        kifu.append(m)
    kifu.save()

    report = filecheck.check(video, ref, corners=corners, batch=8,
                             use_meta=False)
    assert report["agreement"] == 1.0, report
    assert report["frames"] == len(frames)
    assert report["diff"] == []


def test_filecheck_video_gsize_from_sgf(tmp_path):
    """A 13x13 video scored against an SZ[13] reference: the board size is
    read from the SGF (hardcoding 19 would mis-grid the classification)."""
    import cv2

    gsize = 13
    moves = synth.sample_moves(4, gsize=gsize, seed=31)
    corners = synth.default_corners(HW)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=3, frame_hw=HW, gsize=gsize, empty_leadin=1)]

    video = str(tmp_path / "game13.mp4")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (HW[1], HW[0]))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    ref = str(tmp_path / "ref13.sgf")
    kifu = Kifu.new(ref, gsize=gsize)
    for m in moves:
        kifu.append(m)
    kifu.save()

    report = filecheck.check(video, ref, corners=corners, batch=8,
                             use_meta=False)
    assert report["agreement"] == 1.0, report
    assert report["diff"] == []


def test_filecheck_cli_reports_failure_cleanly(tmp_path):
    """A wrong reference must FAIL with a per-move diff, not crash."""
    import cv2

    moves = synth.sample_moves(3, seed=23)
    corners = synth.default_corners(HW)
    frames = [f for f, _ in synth.render_game(
        moves, frames_per_move=3, frame_hw=HW, empty_leadin=1)]
    video = str(tmp_path / "game.mp4")
    vw = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                         (HW[1], HW[0]))
    for f in frames:
        vw.write(f[:, :, ::-1])
    vw.release()

    wrong = str(tmp_path / "wrong.sgf")
    kifu = Kifu.new(wrong)
    from camkifu_tpu.gamemodel.move import Move
    kifu.append(Move("np", ("B", 0, 0)))
    kifu.save()

    report = filecheck.check(video, wrong, corners=corners, batch=8,
                             use_meta=False)
    assert report["agreement"] < 1.0
    assert len(report["diff"]) >= 1
