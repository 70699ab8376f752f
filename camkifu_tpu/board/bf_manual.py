"""BoardFinderManual — user-clicked corners, persisted per input file.

Parity: ``camkifu/board/bf_manual.py`` (SURVEY §2.1) — left-click places the
next corner, a click near an existing corner adjusts it, and manual corner
locations persist per video file so re-opening reuses them. The fallback
when auto detection fails, and the ground-truth tool (SURVEY §4).
"""

from __future__ import annotations

import json
import os

import numpy as np

from camkifu_tpu.board.boardfinder import BoardFinder

PERSIST_PATH = os.path.expanduser("~/.camkifu_tpu/corners.json")


def _load_store() -> dict:
    try:
        with open(PERSIST_PATH, encoding="utf-8") as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


def _save_store(store: dict) -> None:
    os.makedirs(os.path.dirname(PERSIST_PATH), exist_ok=True)
    tmp = PERSIST_PATH + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(store, f)
    os.replace(tmp, PERSIST_PATH)


class BoardFinderManual(BoardFinder):
    label = "manual"

    def __init__(self, vmanager):
        super().__init__(vmanager)
        self.key = str(getattr(vmanager, "video", "")) or None
        if self.key:
            saved = _load_store().get(self.key)
            if saved:
                for x, y in np.array(saved, np.float32).reshape(4, 2):
                    self.corners.add((x, y))
                self._publish()

    # -- user input (wired to GUI clicks or called programmatically) --------

    def onclick(self, x: float, y: float) -> None:
        self.corners.add((x, y))
        if self.corners.ready():
            self._publish()
            self._persist()

    def set_corners(self, points) -> None:
        """Set all four corners at once (tests, CLI --corners)."""
        self.corners.clear()
        for p in np.asarray(points, np.float32).reshape(4, 2):
            self.corners.add(p)
        self._publish()
        self._persist()

    def clear(self) -> None:
        self.corners.clear()
        self.mtx = None

    def _persist(self) -> None:
        if self.key and self.corners.ready():
            store = _load_store()
            store[self.key] = self.corners.points.reshape(-1).tolist()
            _save_store(store)

    # Manual mode does not detect anything per-frame.
    def _detect(self, frames) -> bool:
        return self.corners.ready()
