"""Board / GUI geometry constants.

Parity: Golib ``golib/config/guiconf.py`` (SURVEY §2.2 — board size is a global
constant ``gsize = 19`` in the reference). We keep the module-level default for
API parity but everything downstream takes ``gsize`` as a parameter so other
board sizes (9, 13) work.
"""

# Board size (number of intersections per side). Reference default: 19.
gsize = 19

# Tk canvas geometry (used only by the optional GUI).
canvas_size = 620          # pixels, square goban canvas
stone_ratio = 0.45         # stone radius as a fraction of one grid step
background = "#B8803E"     # goban wood tone
