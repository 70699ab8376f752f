"""Board-state → move-sequence extraction (the "emit moves, not states" core).

Parity: the reference's StonesFinder compares each stabilized board reading
against the controller's current game state under the kifu lock and calls
``suggest(move)`` for consistent new stones (SURVEY §3.3). Device output here
is fixed-shape per-frame board states + confidences (SURVEY §7 hard-part b);
this host module diffs them into moves through the rules engine, so captures
are handled exactly: when a detected move captures, the rules remove the
captured stones and the *post-capture* state is what the next reading is
compared against — the feedback loop SURVEY §2.2 calls out.
"""

from __future__ import annotations

import numpy as np

from camkifu_tpu.config import guiconf
from camkifu_tpu.gamemodel.move import B, INT_TO_COLOR, Move, opposite
from camkifu_tpu.gamemodel.rules import IllegalMove, RuleUnsafe


class MoveExtractor:
    """Turns a stream of stabilized board readings into an ordered move list.

    Policy (mirrors the reference's suggest/bulk behavior):
    - A reading identical to the current state emits nothing (idempotent).
    - Exactly one new stone, with every disappearance explained by the capture
      that move produces → emit that move.
    - Two new stones (one of each color, reader caught up after agitation) →
      emit both, alternation order preferred.
    - Anything inconsistent (unexplained disappearances, same-color double
      moves, illegal moves) → reading rejected, nothing emitted. The vote
      layer upstream makes such readings rare; rejection is the reference's
      abstention semantics.
    """

    def __init__(self, gsize: int = guiconf.gsize, kifu=None,
                 on_move=None, strict_alternation: bool = False):
        self.rule = RuleUnsafe(gsize=gsize)
        self.kifu = kifu
        self.on_move = on_move          # callback(Move) for controller piping
        self.strict_alternation = strict_alternation
        self.moves: list[Move] = []
        self.rejected = 0

    # -- queries ---------------------------------------------------------

    def state(self) -> np.ndarray:
        return self.rule.as_labels()

    def next_color(self) -> str:
        if not self.moves:
            return B
        return opposite(self.moves[-1].color)

    # -- main entry ------------------------------------------------------

    def advance(self, reading: np.ndarray) -> list[Move]:
        """Consume one stabilized (gsize, gsize) int label reading; emit moves."""
        reading = np.asarray(reading)
        emitted: list[Move] = []
        # Up to two single-move steps per reading (two-stone catch-up case);
        # any residual discrepancy is left for future (better) readings.
        for _ in range(2):
            move = self._one_step(reading)
            if move is None:
                break
            emitted.append(move)
        return emitted

    def _one_step(self, reading: np.ndarray) -> Move | None:
        state = self.state()
        new_mask = (reading != 0) & (state == 0)
        gone_mask = (reading == 0) & (state != 0)
        changed_mask = (reading != 0) & (state != 0) & (reading != state)
        if changed_mask.any():
            # A stone changing color outright is never a legal game event.
            self.rejected += 1
            return None
        new_positions = list(zip(*np.nonzero(new_mask)))
        if not new_positions:
            if gone_mask.any():
                # Disappearances without a new stone: not a move (could be a
                # hand shadow); reject quietly.
                self.rejected += 1
            return None

        candidates = []
        if len(new_positions) == 1:
            candidates = [new_positions[0]]
        else:
            # Prefer the stone whose color matches alternation.
            want = self.next_color()
            prefer = [p for p in new_positions
                      if INT_TO_COLOR[int(reading[p])] == want]
            candidates = prefer or new_positions

        for r, c in candidates:
            color = INT_TO_COLOR[int(reading[r, c])]
            if self.strict_alternation and color != self.next_color():
                continue
            move = Move("np", (color, int(r), int(c)), gsize=self.rule.gsize)
            try:
                captured = self.rule.put(move)
            except IllegalMove:
                continue
            # Every vanished stone must be explained by this move's captures.
            cap_set = {(m.row, m.col) for m in captured}
            gone_set = set(zip(*np.nonzero(gone_mask)))
            gone_set = {(int(a), int(b)) for a, b in gone_set}
            unexplained = gone_set - cap_set
            # Captured stones the reading still sees are fine for one frame
            # (physical removal lags); captures not yet visible are tolerated.
            if unexplained:
                self.rule.discard()
                continue
            self.rule.confirm()
            move.number = len(self.moves) + 1
            self.moves.append(move)
            if self.kifu is not None:
                self.kifu.append(move)
            if self.on_move is not None:
                self.on_move(move)
            return move
        self.rejected += 1
        return None

    # -- human-correction feedback (ControllerV.corrected path) -------------

    def apply_correction(self, err: Move | None, exp: Move | None) -> None:
        """Mirror a human fix into the extractor's game state.

        err=None: stone added manually; exp=None: stone deleted; both set:
        relocated.
        """
        if err is not None and exp is None:
            self.rule.remove(err)
            self.rule.confirm()
            self.moves = [m for m in self.moves if m != err]
        elif err is None and exp is not None:
            self.rule.put(exp, reset=True)
            self.rule.confirm()
            self.moves.append(exp)
        elif err is not None and exp is not None:
            self.rule.remove(err)
            self.rule.confirm()
            self.rule.put(exp)
            self.rule.confirm()
            self.moves = [exp if m == err else m for m in self.moves]


def score_moves(detected: list[Move], reference: list[Move]) -> dict:
    """Move-sequence agreement — the filecheck metric (SURVEY §3.5/§6).

    Position-wise comparison of the two sequences; returns counts and the
    agreement ratio in [0, 1].
    """
    good = sum(1 for d, r in zip(detected, reference) if d == r)
    wrong = sum(1 for d, r in zip(detected, reference) if d != r)
    missing = max(0, len(reference) - len(detected))
    extra = max(0, len(detected) - len(reference))
    agreement = good / len(reference) if reference else 1.0
    return {"good": good, "wrong": wrong, "missing": missing,
            "extra": extra, "ref_moves": len(reference),
            "detected_moves": len(detected), "agreement": agreement}
