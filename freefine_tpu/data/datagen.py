"""GeoBench dataset authoring: edit-instruction vocabulary and
geometry-aware parameter samplers.

Rebuilds the reference generation pipeline (L5, SURVEY.md §2.5):
  * instruction vocabulary (operations x directions x degree levels with
    prompt templates) — generative-models/scripts/sampling/
    edit_prompt_set.py:7-341;
  * geometry-aware parameter samplers — re_edit_3d.py:752-1115:
    move (bbox-vs-boundary checks per level), scale (boundary-limited),
    2D rotation (feasibility search against the constrain area), 3D
    y-rotation degree ranges;
  * 2D/3D routing (judge_2d_3d, :1098-1115) and SV3D azimuth-list
    construction (generate_azimuth_angles, :1038-1062).

All randomness flows through an explicit numpy Generator (the reference
seeds global RNGs from wall-clock time, re_edit_3d.py:1000-1002 — replaced
for reproducibility).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

OPERATIONS = {
    "move": {
        "descriptions": ["Move", "Shift", "Slide", "Drag"],
        "directions": [
            "upward", "downward", "leftward", "rightward",
            "upper-left", "upper-right", "lower-left", "lower-right",
        ],
    },
    "rotate": {
        "descriptions": ["Rotate", "Spin", "Turn", "Swivel"],
        "directions": {
            "2D": ["around the z-axis clockwise", "around the z-axis counterclockwise"],
            "3D_y": ["around the y-axis clockwise", "around the y-axis counterclockwise"],
        },
    },
    "enlarge": {
        "descriptions": ["Enlarge", "Expand", "zoom", "amplify"],
        "directions": ["uniformly"],
    },
    "shrink": {
        "descriptions": ["Shrink", "Contract"],
        "directions": ["uniformly"],
    },
}

DEGREES = {
    "level_1": ["lightly", "slightly", "gently", "mildly"],
    "level_2": ["moderately", "markedly", "appreciably"],
    "level_3": ["heavily", "intensely", "significantly", "strongly"],
}

MOVE_RANGES = {  # fraction of image size per level (re_edit_3d.py:776-787)
    "level_1": (0.05, 0.1),
    "level_2": (0.1, 0.2),
    "level_3": (0.2, 0.4),
}
ENLARGE_RANGES = {"level_1": (1.1, 1.3), "level_2": (1.3, 1.5), "level_3": (1.5, 3.0)}
SHRINK_RANGES = {"level_1": (0.8, 0.9), "level_2": (0.6, 0.8), "level_3": (0.4, 0.6)}
ROTATE_RANGES = {"level_1": (5, 10), "level_2": (10, 20), "level_3": (20, 40)}
ROTATE3D_RANGES = {"level_1": (5, 10), "level_2": (15, 20), "level_3": (25, 40)}


@dataclasses.dataclass
class Instruction:
    type: str        # move / rotate / enlarge / shrink
    direction: str
    degree: str      # level_1..level_3
    prompt: str      # contains "{object}"


def find_motion_type(prompt: str) -> str:
    for mtype, meta in OPERATIONS.items():
        if any(w in prompt for w in meta["descriptions"]):
            return mtype
    raise AssertionError(f"No matched motion found for prompt: {prompt}")


def find_degree(prompt: str) -> str:
    for lvl, words in DEGREES.items():
        if any(w in prompt for w in words):
            return lvl
    raise ValueError(prompt)


def generate_instructions(
    rng: np.random.Generator, sample_type: str = "2D"
) -> List[Instruction]:
    """One instruction per (operation, degree level), with sampled synonyms
    and directions (reference generate_instruction, edit_prompt_set.py:
    180-222)."""
    out = []
    for mtype, meta in OPERATIONS.items():
        dirs = meta["directions"]
        if mtype == "rotate":
            dirs = dirs["2D"] if sample_type == "2D" else dirs["3D_y"]
        for level, words in DEGREES.items():
            desc = words[rng.integers(len(words))]
            verb = meta["descriptions"][rng.integers(len(meta["descriptions"]))]
            direction = dirs[rng.integers(len(dirs))]
            prompt = f"{verb} the {{object}} {direction} {desc}"
            out.append(Instruction(mtype, direction, level, prompt))
    return out


def mask_bbox(mask: np.ndarray) -> Tuple[int, int, int, int]:
    ys, xs = np.nonzero(np.asarray(mask) > 0)
    if len(ys) == 0:
        return 0, 0, 0, 0
    return int(xs.min()), int(ys.min()), int(xs.max() - xs.min() + 1), int(
        ys.max() - ys.min() + 1
    )


def sample_move(
    mask: np.ndarray, constrain_area: np.ndarray, direction: str, level: str,
    rng: np.random.Generator,
) -> Tuple[int, int, bool]:
    """(dx, dy, out_of_bounds) — re_edit_3d.py:752-807 semantics."""
    h, w = constrain_area.shape
    x, y, bw, bh = mask_bbox(mask)
    lo, hi = MOVE_RANGES[level]
    rx = (int(lo * w), int(hi * w))
    ry = (int(lo * h), int(hi * h))
    dx = dy = 0
    oob = False
    if "left" in direction:
        dx = -int(rng.integers(rx[0], rx[1]))
        oob |= x + dx < 0
    elif "right" in direction:
        dx = int(rng.integers(rx[0], rx[1]))
        oob |= x + bw + dx > w
    if "up" in direction:
        dy = -int(rng.integers(ry[0], ry[1]))
        oob |= y + dy < 0
    elif "down" in direction or "low" in direction:
        dy = int(rng.integers(ry[0], ry[1]))
        oob |= y + bh + dy > h
    return dx, dy, oob


def sample_scale(
    mask: np.ndarray, constrain_area: np.ndarray, edit_class: str, level: str,
    rng: np.random.Generator,
) -> Tuple[float, float]:
    """Uniform scale bounded by the image boundary for enlargement
    (re_edit_3d.py:864-908)."""
    h, w = constrain_area.shape
    x, y, bw, bh = mask_bbox(mask)
    cx, cy = x + bw / 2, y + bh / 2
    if edit_class == "shrink":
        lo, hi = SHRINK_RANGES[level]
        s = float(rng.uniform(lo, hi))
        return s, s
    lo, hi = ENLARGE_RANGES[level]
    bx = max(w - cx, cx) / max(bw / 2, 1)
    by = max(h - cy, cy) / max(bh / 2, 1)
    s = min(bx, by, float(rng.uniform(lo, hi)))
    if s <= lo:
        raise ValueError("resize lower bound error, discard")
    return s, s


def max_rotation_angle(
    cx: float, cy: float, r: float, constrain_area: np.ndarray,
    counterclockwise: bool, scale_ratio: float = 0.1, max_angle: int = 40,
) -> int:
    """Largest angle whose rotated bbox corners stay inside the free area
    (re_edit_3d.py:909-997)."""
    h, w = constrain_area.shape
    free = 1 - (np.asarray(constrain_area) > 0).astype(np.int32)
    angles = np.arange(1, max_angle + 1)
    signed = -angles if counterclockwise else angles
    rad = np.radians(signed)
    corners = (
        np.array(
            [[np.cos(a), np.sin(a)]
             for a in (-np.pi / 4, np.pi / 4, 3 * np.pi / 4, -3 * np.pi / 4)]
        ) * r
    )
    xs = cx + np.outer(np.cos(rad), corners[:, 0])
    ys = cy + np.outer(np.sin(rad), corners[:, 1])
    inside = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    ok_in = np.zeros_like(xs, bool)
    ok_in[inside] = free[ys[inside].astype(int), xs[inside].astype(int)] == 1
    ok_out = np.zeros_like(xs, bool)
    ok_out[~inside] = (np.abs(xs[~inside] - cx) <= scale_ratio * r) & (
        np.abs(ys[~inside] - cy) <= scale_ratio * r
    )
    conditions = np.all(ok_in | ok_out, axis=1)
    if not conditions.any():
        return 0
    if conditions.all():
        return max_angle
    first_bad = int(np.argmax(~conditions))
    return int(abs(signed[max(first_bad - 1, 0)]))


def sample_rotation_2d(
    mask: np.ndarray, constrain_area: np.ndarray, direction: str, level: str,
    rng: np.random.Generator,
) -> int:
    x, y, bw, bh = mask_bbox(mask)
    cx, cy = x + bw / 2, y + bh / 2
    r = float(np.hypot(bw / 2, bh / 2))
    ccw = "counterclockwise" in direction
    cap = max_rotation_angle(cx, cy, r, constrain_area, ccw)
    lo, hi = ROTATE_RANGES[level]
    angle = min(cap, float(rng.uniform(lo, hi)))
    if angle <= lo:
        raise ValueError("rotate lower bound error, discard")
    a = int(round(angle))
    return -a if ccw else a


def judge_2d_3d(instruction: Instruction) -> str:
    """z-axis rotation -> 2D affine; y-axis rotation -> 3D
    (re_edit_3d.py:1098-1115)."""
    if instruction.type != "rotate":
        return "2D"
    return "2D" if "z-axis" in instruction.prompt else "3D"


def gen_2d_edit_config(
    mask: np.ndarray, constrain_area: np.ndarray, instruction: Instruction,
    rng: np.random.Generator,
):
    """-> (edit_config dict, 9-param edit_param, out_of_bounds) —
    gen_2D_edit_config_v2 (re_edit_3d.py:998-1036)."""
    dx = dy = 0
    rot = 0
    scale = (1.0, 1.0)
    oob = False
    if instruction.type == "move":
        dx, dy, oob = sample_move(mask, constrain_area, instruction.direction,
                                  instruction.degree, rng)
    elif instruction.type in ("enlarge", "shrink"):
        scale = sample_scale(mask, constrain_area, instruction.type,
                             instruction.degree, rng)
    elif instruction.type == "rotate":
        rot = sample_rotation_2d(mask, constrain_area, instruction.direction,
                                 instruction.degree, rng)
    else:
        raise ValueError(instruction.type)
    cfg = {
        "dx": dx, "dy": dy, "rotation_angle": rot, "resize_scale": scale,
        "flip_horizontal": False, "flip_vertical": False,
    }
    edit_param = [dx, dy, 0, 0, 0, rot, scale[0], scale[1], 1]
    return cfg, edit_param, oob


def gen_3d_edit_config(instruction: Instruction, rng: np.random.Generator):
    """3D y-rotation parameters (generate_editing_config_3d,
    re_edit_3d.py:1081-1096)."""
    assert instruction.type == "rotate"
    lo, hi = ROTATE3D_RANGES[instruction.degree]
    deg = int(round(float(rng.uniform(lo, hi))))
    if "counterclockwise" in instruction.direction:
        deg = -deg
    return [0, 0, 0, 0, deg, 0, 1, 1, 1], deg


def generate_azimuth_angles(
    n_views: int = 21, angle_list_3d: Optional[Sequence[float]] = None
) -> List[float]:
    """SV3D orbital azimuth list hitting the requested angles
    (re_edit_3d.py:1038-1062): forward angles kept, backward ones wrapped
    to 360+a, the rest evenly spread, terminated with 0."""
    angle_list_3d = list(angle_list_3d or [])
    half = len(angle_list_3d) // 2
    fwd = np.array(angle_list_3d[:half], np.float64)
    bwd = np.array([360 + a for a in angle_list_3d[half:]], np.float64)
    assert len(fwd) + len(bwd) < n_views
    remaining = n_views - len(fwd) - len(bwd) - 1
    rest = (
        np.linspace(0, 360, remaining + 1)[:-1] % 360
        if remaining > 0 else np.array([])
    )
    az = np.sort(np.concatenate([fwd, bwd, rest]) % 360)
    return list(np.concatenate([az, [0.0]]))
