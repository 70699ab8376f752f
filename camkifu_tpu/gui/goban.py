"""Goban canvas: board display + human-correction input surface.

Parity: ``golib/gui/goban.py`` (SURVEY §2.2) — draws grid, hoshi, stones,
last-move highlight; maps pixels↔intersections (the Move 'tk' frame); click
to put a stone, right-click to delete — the surface through which humans
correct the vision system.
"""

from __future__ import annotations

import tkinter as tk

from camkifu_tpu.config import guiconf
from camkifu_tpu.gamemodel.move import B, E, W, Move


class Goban(tk.Canvas):
    def __init__(self, master, controller, size: int = guiconf.canvas_size):
        super().__init__(master, width=size, height=size,
                         background=guiconf.background, highlightthickness=0)
        self.controller = controller
        self.gsize = controller.kifu.gsize
        self.size = size
        self.scale = size / self.gsize        # px per grid step
        self.select_color = B                  # next color for manual put
        self.bind("<Button-1>", self._on_left)
        self.bind("<Button-3>", self._on_right)
        controller.listeners.append(lambda *a: self.redraw())
        self.redraw()

    # -- drawing -------------------------------------------------------------

    def redraw(self) -> None:
        self.delete("all")
        g, s = self.gsize, self.scale
        lo = 0.5 * s
        hi = (g - 0.5) * s
        for i in range(g):
            p = (i + 0.5) * s
            self.create_line(lo, p, hi, p, fill="#333")
            self.create_line(p, lo, p, hi, fill="#333")
        if g == 19:
            for r in (3, 9, 15):
                for c in (3, 9, 15):
                    x, y = (c + 0.5) * s, (r + 0.5) * s
                    self.create_oval(x - 3, y - 3, x + 3, y + 3, fill="#333")
        stones = self.controller.stones()
        radius = guiconf.stone_ratio * s
        for r in range(g):
            for c in range(g):
                v = stones[r, c]
                if v == 0:
                    continue
                x, y = (c + 0.5) * s, (r + 0.5) * s
                fill = "#111" if v == 1 else "#f4f4f4"
                self.create_oval(x - radius, y - radius, x + radius,
                                 y + radius, fill=fill, outline="#000")
        last = self.controller.kifu.lastmove()
        if last is not None and not last.is_pass \
                and self.controller.nav.at_end():
            x, y = last.get_coord("tk", canvas_scale=s)
            self.create_oval(x - 4, y - 4, x + 4, y + 4, outline="#d22",
                             width=2)

    # -- input ------------------------------------------------------------

    def _on_left(self, event) -> None:
        move = Move("tk", (self.select_color, event.x, event.y),
                    canvas_scale=self.scale, gsize=self.gsize)
        stones = self.controller.stones()
        if stones[move.row, move.col] != 0:
            return
        try:
            self.controller.append(move)
        except Exception:
            return
        # A manual put is a correction the finder must learn about.
        if hasattr(self.controller, "corrected"):
            self.controller.corrected(None, move)
        self.select_color = W if move.color == B else B
        self.redraw()

    def _on_right(self, event) -> None:
        stones = self.controller.stones()
        move = Move("tk", (B, event.x, event.y), canvas_scale=self.scale,
                    gsize=self.gsize)
        v = stones[move.row, move.col]
        if v == 0:
            return
        target = Move("np", ("B" if v == 1 else "W", move.row, move.col),
                      gsize=self.gsize)
        try:
            self.controller.delete(target)
        except KeyError:
            return
        if hasattr(self.controller, "corrected"):
            self.controller.corrected(target, None)
        self.redraw()
