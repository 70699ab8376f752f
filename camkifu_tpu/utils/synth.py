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


def _wood_grain(size: int, amp: float, key: int) -> np.ndarray:
    """Procedural wood-grain multiplier (size, size): vertical streaks whose
    phase wanders smoothly down the board (growth-ring wiggle) over a
    low-frequency band pattern — the sim-real texture the flat-shaded r2
    boards lacked (VERDICT r2 missing #1). Deterministic per `key` so grain
    is stable across frames of a game (a real board does not shimmer)."""
    rng = np.random.default_rng((0xD00D, key))
    x = np.arange(size, dtype=np.float32)
    # Ring wiggle: smooth random walk along y (box-filtered white noise).
    wander = np.cumsum(rng.normal(0.0, 0.35, size).astype(np.float32))
    k = max(5, size // 24)
    kernel = np.ones(k, np.float32) / k
    wander = np.convolve(wander, kernel, mode="same")
    lam = size / (6.0 + rng.uniform(0, 3))         # streak wavelength
    streaks = np.sin(2 * np.pi * (x[None, :] / lam + 0.08 * wander[:, None]))
    bands = np.sin(2 * np.pi * (x[None, :] / (lam * 3.7)
                                + 0.03 * wander[:, None]) + 1.1)
    fine = rng.normal(0.0, 0.25, (size, size)).astype(np.float32)
    g = 0.55 * streaks + 0.3 * bands + 0.35 * fine
    return 1.0 + amp * g


def render_canonical(labels: np.ndarray, zone: int = 24,
                     rng: np.random.Generator | None = None,
                     stone_jitter: float = 0.0,
                     jitter_key: int = 0,
                     wood_texture: float = 0.0,
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
    if wood_texture:
        grain = _wood_grain(size, wood_texture, jitter_key)
        img = np.clip(img.astype(np.float32) * grain[..., None],
                      0, 255).astype(np.uint8)
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
                 wood_texture: float = 0.0,
                 vignette: float = 0.0,
                 motion_blur: tuple[float, float] | None = None,
                 hand: tuple[float, float, float] | None = None,
                 palette: str = "kaya",
                 lens_k1: float = 0.0,
                 white_balance: float = 0.0) -> tuple[np.ndarray, np.ndarray]:
    """Render a camera frame of the given board state.

    light_gradient: relative brightness falloff corner-to-corner (0.3 =
    one side of the frame 30% darker — uneven room lighting).
    blur_sigma: defocus blur in pixels (camera out of focus).
    shadow: darkness of a soft elliptical shadow over part of the board
    (0.25 = 25% darker inside, feathered edge — a player leaning in).
    wood_texture: procedural grain amplitude (0.1 ≈ visible kaya streaks).
    vignette: corner darkening of the lens (0.25 = 25% darker at corners).
    motion_blur: (dx, dy) px — directional blur of camera motion this frame.
    hand: (x, y, reach) — a hand + forearm over the board, fingertip at
    frame position (x, y); reach ∈ [0, 1] fades it in/out so render_game
    can animate a move being placed.
    lens_k1: radial lens distortion coefficient (r normalized to half the
    short frame side; >0 = barrel — straight board lines bow outward —
    <0 = pincushion; cheap webcams sit around |k1| ≈ 0.03–0.08 at this
    normalization). The returned ground-truth corners are distorted
    through the same model.
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
                             else seed, wood_texture=wood_texture,
                             palette=palette)
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
    if hand is not None and hand[2] > 0.0:
        frame = _draw_hand(frame, hand, rng)
    if lens_k1:
        # Radial distortion of the composed scene (optics happen before
        # the sensor): output pixel p_d samples the pinhole scene at the
        # inverse of p_d = c + (p_u − c)(1 + k1·r_u²), r normalized to
        # half the short side. The inverse radius comes from 4 fixed-point
        # iterations (exact to <1e-3 px for |k1| ≤ 0.2).
        s = min(h, w) / 2.0
        ccx, ccy = w / 2.0, h / 2.0
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        rd = np.sqrt((xx - ccx) ** 2 + (yy - ccy) ** 2) / s
        ru = rd.copy()
        for _ in range(4):
            ru = rd / (1.0 + lens_k1 * ru * ru)
        scale = np.where(rd > 1e-9, ru / np.maximum(rd, 1e-9), 1.0)
        map_x = (ccx + (xx - ccx) * scale).astype(np.float32)
        map_y = (ccy + (yy - ccy) * scale).astype(np.float32)
        frame = cv2.remap(frame, map_x, map_y, cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REPLICATE)
        pc = corners - np.array([ccx, ccy], np.float32)
        r_u = np.linalg.norm(pc, axis=1, keepdims=True) / s
        corners = (np.array([ccx, ccy], np.float32)
                   + pc * (1.0 + lens_k1 * r_u ** 2)).astype(np.float32)
    if motion_blur is not None:
        dx, dy = float(motion_blur[0]), float(motion_blur[1])
        n_k = max(3, int(np.hypot(dx, dy)) | 1)
        if np.hypot(dx, dy) >= 1.0:
            k = np.zeros((n_k, n_k), np.float32)
            cv2.line(k, (int(n_k / 2 - dx / 2), int(n_k / 2 - dy / 2)),
                     (int(n_k / 2 + dx / 2), int(n_k / 2 + dy / 2)),
                     1.0, 1)
            k /= max(k.sum(), 1e-6)
            frame = cv2.filter2D(frame, -1, k)
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
    if vignette:
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        r2 = (((xx - w / 2) / (w / 2)) ** 2
              + ((yy - h / 2) / (h / 2)) ** 2) / 2.0
        frame = np.clip(frame.astype(np.float32)
                        * (1.0 - vignette * r2)[..., None],
                        0, 255).astype(np.uint8)
    if white_balance:
        # Miscalibrated camera WB: warm (+) boosts R and cuts B, cool (−)
        # the reverse — shifts every chroma statistic the detectors use.
        f = frame.astype(np.float32)
        f[..., 0] *= 1.0 + white_balance
        f[..., 2] *= 1.0 - white_balance
        frame = np.clip(f, 0, 255).astype(np.uint8)
    if noise:
        frame = np.clip(frame.astype(np.float32)
                        + rng.normal(0, noise, frame.shape), 0, 255
                        ).astype(np.uint8)
    return frame, corners


#: Skin/sleeve colors for the animated hand.
_SKIN = (198, 160, 128)
_SLEEVE = (52, 56, 84)


def _draw_hand(frame: np.ndarray, hand, rng) -> np.ndarray:
    """A hand + forearm reaching in from the bottom edge, fingertip at
    (x, y), with a soft drop shadow under it. reach ∈ (0, 1] interpolates
    the fingertip from the bottom edge to (x, y) — animating it across
    frames produces the moving occluder real recordings have (a player
    placing a stone), which the flat r2 synth lacked."""
    import cv2

    h, w = frame.shape[:2]
    x, y, reach = float(hand[0]), float(hand[1]), float(hand[2])
    # Entry point on the bottom edge, roughly under the target.
    ex = np.clip(x + 0.18 * w, 0, w - 1)
    tip = np.array([ex + (x - ex) * reach, h - 1 + (y - (h - 1)) * reach],
                   np.float32)
    arm_dir = np.array([ex, h - 1], np.float32) - tip
    nrm = np.linalg.norm(arm_dir) + 1e-6
    arm_dir /= nrm
    ang = np.degrees(np.arctan2(arm_dir[1], arm_dir[0]))
    # Soft shadow (offset toward the light's opposite side).
    sh = frame.astype(np.float32)
    mask = np.zeros((h, w), np.uint8)
    cv2.ellipse(mask, (int(tip[0] + 12), int(tip[1] + 14)), (38, 22),
                ang, 0, 360, 80, -1)
    cv2.line(mask, (int(tip[0] + 12 + arm_dir[0] * 30),
                    int(tip[1] + 14 + arm_dir[1] * 30)),
             (int(ex + 12), h - 1), 60, 44)
    mask = cv2.GaussianBlur(mask, (31, 31), 12)
    sh *= (1.0 - (mask.astype(np.float32) / 255.0) * 0.5)[..., None]
    frame = np.clip(sh, 0, 255).astype(np.uint8)
    overlay = frame.copy()
    # Forearm (sleeve) then hand blob + two fingers.
    cv2.line(overlay, (int(tip[0] + arm_dir[0] * 34),
                       int(tip[1] + arm_dir[1] * 34)),
             (int(ex), h - 1), _SLEEVE, 40)
    cv2.ellipse(overlay, (int(tip[0] + arm_dir[0] * 16),
                          int(tip[1] + arm_dir[1] * 16)), (26, 17),
                ang, 0, 360, _SKIN, -1)
    f1 = tip + np.array([-arm_dir[1], arm_dir[0]]) * 5
    f2 = tip - np.array([-arm_dir[1], arm_dir[0]]) * 5
    for f in (f1, f2):
        cv2.line(overlay, (int(f[0] + arm_dir[0] * 18),
                           int(f[1] + arm_dir[1] * 18)),
                 (int(f[0]), int(f[1])), _SKIN, 7)
    return cv2.addWeighted(overlay, 0.96, frame, 0.04, 0)


def encode_roundtrip(frames, codec: str = "mp4v", fps: int = 25,
                     path: str | None = None) -> list[np.ndarray]:
    """Encode frames to a video file and decode them back — the sensor/
    compression artifact pass (macroblocking, chroma subsampling, ringing)
    between the renderer and the pipeline. Returns the decoded RGB frames.
    """
    import os
    import tempfile

    import cv2

    own = path is None
    if own:
        fd, path = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
    try:
        # Stream rendered frames straight into the encoder: materializing
        # the full game on both sides of the codec would double the peak
        # host RSS (a synth:100 realism game at 720p is ~2 GB per side).
        vw = None
        n_in = 0
        for f in frames:
            if vw is None:
                h, w = f.shape[:2]
                vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*codec),
                                     fps, (w, h))
                if not vw.isOpened():
                    raise RuntimeError(
                        f"VideoWriter failed for codec {codec!r}")
            vw.write(f[:, :, ::-1])
            n_in += 1
        if vw is None:
            raise RuntimeError("encode round-trip got no frames")
        vw.release()
        cap = cv2.VideoCapture(path)
        out = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            out.append(f[:, :, ::-1].copy())
        cap.release()
    finally:
        if own:
            os.unlink(path)
    if len(out) != n_in:
        raise RuntimeError(
            f"encode round-trip dropped frames: {n_in} in, "
            f"{len(out)} out")
    return out


def game_states(moves: list[Move], gsize: int = guiconf.gsize):
    """Board-state (g, g) int8 label grid after each move (rules applied,
    captures removed). Yields (state_after_move, move)."""
    rule = RuleUnsafe(gsize=gsize)
    for move in moves:
        rule.put(move)
        rule.confirm()
        yield rule.as_labels(), move


def render_game(moves: list[Move], frames_per_move=3,
                corners: np.ndarray | None = None,
                frame_hw: tuple[int, int] = (720, 1280),
                gsize: int = guiconf.gsize, seed: int = 0,
                empty_leadin: int = 2, hand_frames: int = 0,
                flicker: float = 0.0, removal_lag: int = 0,
                corners_fn=None, wb_drift: float = 0.0, **frame_kwargs):
    """Yield (frame, state_labels) for a whole game: ``empty_leadin`` frames of
    the empty board, then ``frames_per_move`` frames after each move. Extra
    kwargs (stone_jitter, light_gradient, blur_sigma, shadow, wood_texture,
    vignette, …) pass through to render_frame.

    frames_per_move may be a sequence with one entry per move — e.g. to
    model the players pausing mid-game (a knocked camera's settle time, a
    long think) by holding one position longer.

    corners_fn, if given, is called with the global frame index and must
    return that frame's (4, 2) board corners — a MOVING camera (handheld
    drift/rotation, or a discontinuous bump). It overrides ``corners``;
    the hand animation follows the moving pose.

    hand_frames > 0 animates a hand RETREATING from each just-played stone
    over that many frames (a real recording's moving occluder): frame 0
    after a move has the hand covering the new stone, then it withdraws.

    flicker > 0 simulates camera auto-exposure hunting: a per-frame global
    gain doing a seeded random walk within [1−flicker, 1+flicker], with a
    reactive dip toward 1−0.8·flicker while the hand is in frame (real AE
    compensates for the bright hand exactly when moves are played). At
    flicker=0.15 consecutive-frame steps reach ~10–15% — the regime
    measured to stall an exposure-naive motion gate board-wide.

    removal_lag > 0 keeps CAPTURED stones physically on the board for that
    many frames after the capturing move (real players lift captures out
    seconds late, often after the next move is already played); a hand
    sweeps over the group on its final lingering frames when hand_frames
    is on. The yielded state is the RENDERED one (stale stones included) —
    it is what the frame shows; game truth is ``game_states(moves)``.
    """
    import cv2

    empty = np.zeros((gsize, gsize), np.int8)
    corners = default_corners(frame_hw) if corners is None else corners
    zone = 24
    lo, hi = zone / 2.0, gsize * zone - zone / 2.0
    src = np.array([[lo, lo], [hi, lo], [hi, hi], [lo, hi]], np.float32)
    fpm = (list(frames_per_move) if not isinstance(frames_per_move, int)
           else [frames_per_move] * len(moves))
    if len(fpm) != len(moves):
        raise ValueError(f"frames_per_move sequence has {len(fpm)} entries "
                         f"for {len(moves)} moves")

    def corners_at(idx):
        if corners_fn is None:
            return corners
        return np.asarray(corners_fn(idx), np.float32)

    rng_f = np.random.default_rng(seed + 940229)
    rng_wb = np.random.default_rng(seed + 615243)   # own stream: adding WB
    gain = 1.0                                      # must not move flicker
    wb = 0.0

    def expose(frame, hand_active):
        """Camera auto-pipeline per frame: AE gain hunting (``flicker``)
        and auto-white-balance hunting (``wb_drift`` — a random walk of
        the R/B gains within ±wb_drift, the slow color-temperature
        breathing real cameras show as the scene content changes)."""
        nonlocal gain, wb
        if wb_drift:
            wb += float(rng_wb.normal(0.0, 0.25 * wb_drift))
            wb = float(np.clip(wb, -wb_drift, wb_drift))
        if not flicker and not wb_drift:
            return frame
        if flicker:
            target = 1.0 - 0.8 * flicker if hand_active else 1.0
            gain += 0.35 * (target - gain) + rng_f.normal(0.0, 0.4 * flicker)
            gain = float(np.clip(gain, 1.0 - flicker, 1.0 + flicker))
        f = frame.astype(np.float32) * gain
        if wb_drift:
            f[..., 0] *= 1.0 + wb
            f[..., 2] *= 1.0 - wb
        return np.clip(f, 0, 255).astype(np.uint8)

    def to_frame_xy(row, col, idx):
        Mi = cv2.getPerspectiveTransform(
            src, np.asarray(corners_at(idx), np.float32))
        p = Mi @ np.array([(col + 0.5) * zone, (row + 0.5) * zone, 1.0])
        return p[0] / p[2], p[1] / p[2]

    #: (row, col) → [color_int, frames_left] of captured-but-not-yet-removed
    #: stones; counts down across move boundaries (lag routinely spans them).
    linger: dict[tuple[int, int], list[int]] = {}
    prev_state = empty

    i = 0
    for _ in range(empty_leadin):
        frame, _ = render_frame(empty, corners_at(i), frame_hw, seed=seed + i,
                                jitter_seed=seed, **frame_kwargs)
        i += 1
        yield expose(frame, False), empty
    for mi, (state, move) in enumerate(game_states(moves, gsize)):
        if removal_lag and (move.row, move.col) in linger:
            # The next move lands on a point whose captured stone is still
            # physically there — impossible: the player sweeps the dead
            # stones off first. Render that cleanup as a beat of the TRUE
            # pre-move position (all lingering captures gone) so readings
            # see the vacated points empty before the stone arrives.
            linger.clear()
            for _ in range(fpm[mi]):
                frame, _ = render_frame(prev_state, corners_at(i), frame_hw,
                                        seed=seed + i, jitter_seed=seed,
                                        **frame_kwargs)
                i += 1
                yield expose(frame, False), prev_state
        if removal_lag:
            gone = (prev_state != 0) & (state == 0)
            for r, c in np.argwhere(gone):
                linger[(int(r), int(c))] = [int(prev_state[r, c]),
                                            removal_lag]
        prev_state = state
        for j in range(fpm[mi]):
            hand = None
            if hand_frames and j < hand_frames:
                x, y = to_frame_xy(move.row, move.col, i)
                hand = (x, y, 1.0 - j / float(hand_frames))
            shown = state
            if linger:
                shown = state.copy()
                removing = []
                for (r, c), entry in list(linger.items()):
                    color, left = entry
                    if left <= 0 or state[r, c] != 0:
                        del linger[(r, c)]     # removed, or legally reused
                        continue
                    shown[r, c] = color
                    entry[1] = left - 1
                    if left <= hand_frames:
                        removing.append((r, c, left))
                if removing and hand is None and hand_frames:
                    # The removing hand reaches IN over the group it is
                    # lifting out (reach grows as frames_left shrinks).
                    rr = float(np.mean([r for r, _, _ in removing]))
                    cc = float(np.mean([c for _, c, _ in removing]))
                    x, y = to_frame_xy(rr, cc, i)
                    hand = (x, y,
                            1.0 - min(l for _, _, l in removing)
                            / float(hand_frames))
            frame, _ = render_frame(shown, corners_at(i), frame_hw,
                                    seed=seed + i, jitter_seed=seed,
                                    hand=hand, **frame_kwargs)
            i += 1
            yield expose(frame, hand is not None), shown


def moves_from_sgf(path: str) -> list[Move]:
    from camkifu_tpu.gamemodel.kifu import Kifu
    return Kifu.load(path).moves()


def capture_rich_moves(n: int = 24, gsize: int = guiconf.gsize,
                       seed: int = 7) -> list[Move]:
    """An alternating game guaranteed to contain captures: a scripted
    opening where B captures a TWO-stone W group (move 11) and then a
    single W stone (move 19), padded to ``n`` with random capture-free
    filler. Multi-stone captures are the adversarial case for move
    extraction: re-placing one captured stone is legal (its vacated
    neighbors are liberties), so a reading that still shows the group
    pending physical removal looks like playable new moves.
    """
    assert gsize >= 19, "the scripted set pieces assume a 19x19 board"
    script = [
        # B builds the surround of W (2,2)+(2,3); W tenukis top-right.
        (B, 3, 2), (W, 2, 2), (B, 2, 1), (W, 2, 3), (B, 1, 2), (W, 15, 15),
        (B, 1, 3), (W, 16, 3), (B, 3, 3), (W, 13, 13),
        (B, 2, 4),                         # captures W (2,2) and (2,3)
        # Single-stone capture of W (9,9).
        (W, 9, 9), (B, 8, 9), (W, 5, 15), (B, 10, 9), (W, 4, 16),
        (B, 9, 8), (W, 3, 15),
        (B, 9, 10),                        # captures W (9,9)
    ]
    rule = RuleUnsafe(gsize=gsize)
    moves = []
    for spec in script:                    # never truncated: n < len(script)
        m = Move("np", spec, gsize=gsize)  # returns the whole script (the
        rule.put(m)                        # captures are the point)
        rule.confirm()
        moves.append(m)
    rng = np.random.default_rng(seed)
    color = W if moves[-1].color == B else B
    tries = 0
    while len(moves) < n and tries < 80 * n:
        tries += 1
        r, c = int(rng.integers(gsize)), int(rng.integers(gsize))
        m = Move("np", (color, r, c), gsize=gsize)
        try:
            if rule.put(m):                # filler must not capture
                rule.discard()
                continue
            rule.confirm()
        except Exception:
            continue
        moves.append(m)
        color = W if color == B else B
    return moves


def gauntlet_scenario(n_moves: int = 19, seed: int = 11,
                      frame_hw: tuple[int, int] = (720, 1280),
                      gsize: int = guiconf.gsize):
    """THE GAUNTLET — every adversity at once, one game (see
    tests/test_gauntlet.py for the full rationale). Returns
    ``(moves, frames_factory)``: the ground-truth kifu and a zero-arg
    callable yielding the footage. The scenario stacks a capture-rich game
    with 60-frame physical removal lag, a handheld drifting + slowly
    rotating + slowly zooming camera, a mid-game camera BUMP landing while
    captured stones are still pending removal, auto-exposure flicker,
    auto-white-balance hunting (±8% R/B gain random walk), the full
    realism pass (grain, vignette, defocus, gradient, shadow, jitter,
    animated hand, walnut palette), and an mp4 encode round-trip.

    Reference parity: the reference was exercised on real recorded games
    where all of these co-occur (SURVEY §0.6, §4) — this is the closest
    synthetic equivalent; the bar is exact move-for-move agreement.
    """
    from camkifu_tpu.config import cvconf

    moves = capture_rich_moves(max(n_moves, 19), gsize=gsize, seed=seed)
    fpm = cvconf.vote_window + 3
    fpm_list = [fpm] * len(moves)
    fpm_list[13] += 36       # the players pause after the table is knocked
    fpm_list[-1] += 12       # trailing hold so the last move's votes commit
    leadin = 6
    # The knock lands mid-pause, while the two-stone capture's dead stones
    # are STILL physically on the board (lag 60 frames spans moves 10→16).
    bump_at = leadin + sum(fpm_list[:13]) + fpm

    base = default_corners(frame_hw)
    c0 = base.mean(axis=0)

    def cam(i):
        # Handheld: drift ≤0.7 px/frame, rotation 0.04°/frame, zoom
        # 0.02%/frame — all an order of magnitude under the jump trip.
        th = np.deg2rad(0.04 * i)
        s = 1.0 + 2e-4 * i
        if i >= bump_at:                   # the knock: +2° and ~31 px, once
            th += np.deg2rad(2.0)
        rot = np.array([[np.cos(th), -np.sin(th)],
                        [np.sin(th), np.cos(th)]], np.float32)
        cs = c0 + s * (base - c0) @ rot.T
        cs += np.array([6.0 * np.sin(i / 9.0), 5.0 * np.cos(i / 11.0)],
                       np.float32)
        if i >= bump_at:
            cs += np.array([26.0, -17.0], np.float32)
        return cs.astype(np.float32)

    def frames_factory():
        it = (f for f, _ in render_game(
            moves, frames_per_move=fpm_list, frame_hw=frame_hw, seed=seed,
            empty_leadin=leadin, corners_fn=cam, gsize=gsize,
            hand_frames=2, flicker=0.12, wb_drift=0.08, removal_lag=60,
            stone_jitter=0.07, light_gradient=0.3, blur_sigma=1.2,
            shadow=0.18, wood_texture=0.10, vignette=0.22,
            palette="walnut"))
        return iter(encode_roundtrip(it))

    return moves, frames_factory


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
