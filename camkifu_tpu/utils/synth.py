"""Synthetic goban renderer: frames (and whole games) with known ground truth.

The reference could only test against hand-recorded videos with hand-made SGF
oracles (SURVEY §4); this renderer generates them programmatically — a board
state (or move sequence) in, photorealistic-enough camera frames out, with the
exact corner coordinates and SGF available as ground truth. Host-side numpy +
cv2 (cv2 is the drawing/oracle library here, not part of the TPU path).
"""

from __future__ import annotations

import numpy as np

from camkifu_tpu.config import guiconf
from camkifu_tpu.gamemodel.move import B, W, Move
from camkifu_tpu.gamemodel.rules import RuleUnsafe

WOOD = (193, 154, 107)       # RGB board wood
LINE = (40, 30, 20)
BLACK_STONE = (28, 26, 24)
WHITE_STONE = (235, 233, 228)
TABLE = (70, 75, 60)         # background behind the board

#: Alternative looks for robustness testing: (wood, line, black, white).
PALETTES = {
    "kaya": (WOOD, LINE, BLACK_STONE, WHITE_STONE),
    "walnut": ((120, 85, 55), (25, 18, 12), (20, 20, 22), (228, 224, 210)),
    "bamboo": ((214, 190, 140), (60, 50, 35), (35, 32, 30), (240, 240, 235)),
}


def render_canonical(labels: np.ndarray, zone: int = 24,
                     rng: np.random.Generator | None = None,
                     stone_jitter: float = 0.0,
                     jitter_key: int = 0,
                     palette: str = "kaya") -> np.ndarray:
    """Draw a top-down goban: labels (g, g) int (0=E, 1=B, 2=W) → RGB uint8.

    The image side is g*zone with intersection (r, c) at ((c+.5)z, (r+.5)z),
    matching the canonical-warp convention.
    """
    import cv2

    g = labels.shape[0]
    size = g * zone
    rng = rng or np.random.default_rng(0)
    wood, line, black, white = PALETTES[palette]
    img = np.empty((size, size, 3), np.uint8)
    img[:] = wood
    # Wood grain noise.
    img = np.clip(img.astype(np.int16)
                  + rng.integers(-8, 8, (size, 1, 1)), 0, 255).astype(np.uint8)
    lo = int(zone / 2)
    hi = int(size - zone / 2)
    for i in range(g):
        p = int((i + 0.5) * zone)
        cv2.line(img, (lo, p), (hi, p), line, 1, cv2.LINE_AA)
        cv2.line(img, (p, lo), (p, hi), line, 1, cv2.LINE_AA)
    # Hoshi points.
    if g == 19:
        for r in (3, 9, 15):
            for c in (3, 9, 15):
                cv2.circle(img, (int((c + .5) * zone), int((r + .5) * zone)),
                           max(2, zone // 10), line, -1, cv2.LINE_AA)
    radius = int(zone * 0.47)
    for r in range(g):
        for c in range(g):
            if labels[r, c] == 0:
                continue
            color = black if labels[r, c] == 1 else white
            jx = jy = 0.0
            if stone_jitter:
                # Deterministic per intersection: a stone keeps its placement
                # error for the whole game, regardless of when neighbors
                # arrive.
                srng = np.random.default_rng((jitter_key, r, c))
                jx, jy = srng.uniform(-stone_jitter, stone_jitter, 2) * zone
            center = (int((c + .5) * zone + jx), int((r + .5) * zone + jy))
            cv2.circle(img, center, radius, color, -1, cv2.LINE_AA)
            # Specular highlight / shading for realism.
            hl = tuple(min(255, v + 35) for v in color)
            cv2.circle(img, (center[0] - radius // 3, center[1] - radius // 3),
                       max(1, radius // 3), hl, -1, cv2.LINE_AA)
    return img


def default_corners(frame_hw: tuple[int, int] = (1080, 1920),
                    perspective: float = 0.12) -> np.ndarray:
    """A plausible camera view: board fills most of the frame, mild keystone.

    Returns (4, 2) float32 (x, y) of the corner *intersections*, tl/tr/br/bl.
    """
    h, w = frame_hw
    cx, cy = w / 2.0, h / 2.0
    half = 0.42 * min(h, w)
    k = perspective * half
    return np.array([
        [cx - half + k, cy - half + k * 0.5],   # tl (pushed in: tilt away)
        [cx + half - k, cy - half + k * 0.5],   # tr
        [cx + half, cy + half],                 # br
        [cx - half, cy + half],                 # bl
    ], dtype=np.float32)


def render_frame(labels: np.ndarray, corners: np.ndarray | None = None,
                 frame_hw: tuple[int, int] = (1080, 1920),
                 noise: float = 3.0, seed: int = 0,
                 stone_jitter: float = 0.0,
                 light_gradient: float = 0.0,
                 blur_sigma: float = 0.0,
                 shadow: float = 0.0,
                 jitter_seed: int | None = None,
                 palette: str = "kaya") -> tuple[np.ndarray, np.ndarray]:
    """Render a camera frame of the given board state.

    light_gradient: relative brightness falloff corner-to-corner (0.3 =
    one side of the frame 30% darker — uneven room lighting).
    blur_sigma: defocus blur in pixels (camera out of focus).
    shadow: darkness of a soft elliptical shadow over part of the board
    (0.25 = 25% darker inside, feathered edge — a player leaning in).
    Returns (frame uint8 RGB (H, W, 3), corners (4, 2) float32 (x, y)).
    """
    import cv2

    rng = np.random.default_rng(seed)
    g = labels.shape[0]
    zone = 24
    # Stone placement jitter must be stable across frames of the same game
    # (stones sit still once played); camera noise varies per frame.
    canon = render_canonical(labels, zone=zone, rng=rng,
                             stone_jitter=stone_jitter,
                             jitter_key=jitter_seed if jitter_seed is not None
                             else seed, palette=palette)
    h, w = frame_hw
    corners = default_corners(frame_hw) if corners is None else \
        np.asarray(corners, np.float32)
    # Canonical corner-intersection positions (x, y), tl/tr/br/bl.
    lo, hi = zone / 2.0, g * zone - zone / 2.0
    src = np.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi]], np.float32)
    M = cv2.getPerspectiveTransform(src, corners)
    frame = np.empty((h, w, 3), np.uint8)
    frame[:] = TABLE
    frame = np.clip(frame.astype(np.int16)
                    + rng.integers(-6, 6, (h, w, 1)), 0, 255).astype(np.uint8)
    # Warp the board in, with a mask to blend over the table. The board slab
    # extends half a cell beyond the outer grid lines (like a real goban edge).
    warped = cv2.warpPerspective(canon, M, (w, h), flags=cv2.INTER_LINEAR)
    mask = cv2.warpPerspective(np.full(canon.shape[:2], 255, np.uint8), M,
                               (w, h), flags=cv2.INTER_NEAREST)
    frame[mask > 0] = warped[mask > 0]
    if shadow:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx, cy = 0.65 * w, 0.4 * h
        d = np.sqrt(((xx - cx) / (0.35 * w)) ** 2
                    + ((yy - cy) / (0.45 * h)) ** 2)
        dark = 1.0 - shadow * np.clip(1.5 - d, 0.0, 1.0)
        frame = np.clip(frame.astype(np.float32) * dark[..., None],
                        0, 255).astype(np.uint8)
    if blur_sigma:
        k = int(blur_sigma * 6) | 1
        frame = cv2.GaussianBlur(frame, (k, k), blur_sigma)
    if light_gradient:
        gx = np.linspace(1.0, 1.0 - light_gradient, w, dtype=np.float32)
        gy = np.linspace(1.0, 1.0 - 0.5 * light_gradient, h,
                         dtype=np.float32)
        frame = np.clip(frame.astype(np.float32)
                        * (gy[:, None] * gx[None, :])[..., None],
                        0, 255).astype(np.uint8)
    if noise:
        frame = np.clip(frame.astype(np.float32)
                        + rng.normal(0, noise, frame.shape), 0, 255
                        ).astype(np.uint8)
    return frame, corners


def game_states(moves: list[Move], gsize: int = guiconf.gsize):
    """Board-state (g, g) int8 label grid after each move (rules applied,
    captures removed). Yields (state_after_move, move)."""
    rule = RuleUnsafe(gsize=gsize)
    for move in moves:
        rule.put(move)
        rule.confirm()
        yield rule.as_labels(), move


def render_game(moves: list[Move], frames_per_move: int = 3,
                corners: np.ndarray | None = None,
                frame_hw: tuple[int, int] = (720, 1280),
                gsize: int = guiconf.gsize, seed: int = 0,
                empty_leadin: int = 2, **frame_kwargs):
    """Yield (frame, state_labels) for a whole game: ``empty_leadin`` frames of
    the empty board, then ``frames_per_move`` frames after each move. Extra
    kwargs (stone_jitter, light_gradient, blur_sigma, shadow) pass through to
    render_frame."""
    empty = np.zeros((gsize, gsize), np.int8)
    corners = default_corners(frame_hw) if corners is None else corners
    i = 0
    for _ in range(empty_leadin):
        frame, _ = render_frame(empty, corners, frame_hw, seed=seed + i,
                                jitter_seed=seed, **frame_kwargs)
        i += 1
        yield frame, empty
    for state, _move in game_states(moves, gsize):
        for _ in range(frames_per_move):
            frame, _ = render_frame(state, corners, frame_hw, seed=seed + i,
                                    jitter_seed=seed, **frame_kwargs)
            i += 1
            yield frame, state


def moves_from_sgf(path: str) -> list[Move]:
    from camkifu_tpu.gamemodel.kifu import Kifu
    return Kifu.load(path).moves()


def sample_moves(n: int = 40, gsize: int = guiconf.gsize, seed: int = 7
                 ) -> list[Move]:
    """A random legal alternating game (no captures sought, suicide avoided)."""
    rng = np.random.default_rng(seed)
    rule = RuleUnsafe(gsize=gsize)
    moves = []
    color = B
    tries = 0
    while len(moves) < n and tries < 50 * n:
        tries += 1
        r, c = int(rng.integers(gsize)), int(rng.integers(gsize))
        try:
            rule.put(Move("np", (color, r, c), gsize=gsize))
            rule.confirm()
        except Exception:
            continue
        moves.append(Move("np", (color, r, c), gsize=gsize))
        color = W if color == B else B
    return moves
