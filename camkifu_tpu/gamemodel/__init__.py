from camkifu_tpu.gamemodel.move import Move, B, W, E, opposite
from camkifu_tpu.gamemodel.rules import Rule, RuleUnsafe, IllegalMove
from camkifu_tpu.gamemodel.kifu import Kifu
from camkifu_tpu.gamemodel import sgf

__all__ = [
    "Move", "B", "W", "E", "opposite",
    "Rule", "RuleUnsafe", "IllegalMove",
    "Kifu", "sgf",
]
