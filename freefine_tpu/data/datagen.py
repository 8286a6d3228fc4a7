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

# Celeb authoring variant (edit_prompt_set.py:7-17,49-53): each facial
# category supports a restricted operation set, and the fine facial parts
# only ever draw level_1 ("slight") degree adverbs.
CELEB_CATEGORY_OPERATIONS = {
    "eye": ("move", "enlarge", "shrink"),
    "eyebrow": ("move", "enlarge", "shrink", "rotate"),
    "nose": ("move", "enlarge", "shrink", "rotate"),
    "ear": ("move", "enlarge", "shrink"),
    "mouth": ("move", "enlarge", "shrink", "rotate"),
    "hat": ("move", "enlarge", "shrink", "rotate"),
    "earring": ("enlarge", "shrink", "rotate"),
    "person": ("enlarge", "shrink", "rotate"),
}
SLIGHT_EDIT_LIST = ("eye", "eyebrow", "nose", "ear", "mouth")
CELEB_DEGREE_LEVELS = ("level_1",)  # celeb_degrees, edit_prompt_set.py:49-53

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


def _sample_degree_for_label(rng: np.random.Generator, label: str) -> str:
    """slight_edit_list labels draw from celeb_degrees (level_1 only,
    sample_degree_celeb, edit_prompt_set.py:168-170); others from the full
    table (sample_degree, :171-173)."""
    levels = (
        CELEB_DEGREE_LEVELS if label in SLIGHT_EDIT_LIST
        else tuple(DEGREES.keys())
    )
    level = levels[rng.integers(len(levels))]
    words = DEGREES[level]
    return words[rng.integers(len(words))]


def generate_instructions_celeb(
    rng: np.random.Generator, label: str, sample_type: str = "2D"
) -> List[Instruction]:
    """Celeb-category instruction distribution (reference
    generate_instruction_celeb, edit_prompt_set.py:223-270): only the
    label's allowed operations; ONE instruction per direction with a
    label-conditioned degree (not the per-level sweep of
    generate_instructions); 3D keeps the per-level y-rotation sweep."""
    if label not in CELEB_CATEGORY_OPERATIONS:
        raise KeyError(f"unknown celeb category {label!r}")
    out = []
    for mtype in CELEB_CATEGORY_OPERATIONS[label]:
        meta = OPERATIONS[mtype]
        if mtype != "rotate":
            if sample_type != "2D":
                continue
            for direction in meta["directions"]:
                verb = meta["descriptions"][
                    rng.integers(len(meta["descriptions"]))
                ]
                desc = _sample_degree_for_label(rng, label)
                prompt = f"{verb} the {{object}} {direction} {desc}"
                out.append(
                    Instruction(mtype, direction, find_degree(prompt), prompt)
                )
        elif sample_type == "2D":
            for direction in meta["directions"]["2D"]:
                verb = meta["descriptions"][
                    rng.integers(len(meta["descriptions"]))
                ]
                desc = _sample_degree_for_label(rng, label)
                prompt = f"{verb} the {{object}} {direction} {desc}"
                out.append(
                    Instruction(mtype, direction, find_degree(prompt), prompt)
                )
        else:  # 3D: y-rotation sweeps all three levels regardless of label
            for direction in meta["directions"]["3D_y"]:
                for level, words in DEGREES.items():
                    verb = meta["descriptions"][
                        rng.integers(len(meta["descriptions"]))
                    ]
                    desc = words[rng.integers(len(words))]
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


# ---------------------------------------------------------------------------
# Batch authoring driver (reference re_edit_3d.py main(), :1239-1395)
# ---------------------------------------------------------------------------


def sample_instance_edits(
    img: np.ndarray,
    mask: np.ndarray,
    inp_img: np.ndarray,
    cons_area: np.ndarray,
    obj_label: str,
    rng: np.random.Generator,
    use_3d: bool = False,
    sv3d_edit_fn=None,
):
    """All feasible coarse edits for one instance.

    2D: one instruction per (operation x level) -> constraint-aware sampled
    params -> `re_edit_2d` coarse render (coarse_edit_func_v2 +
    sample_edit_func_2d, re_edit_3d.py:527-551).  Infeasible samples
    (rotation/scale caps below the level's lower bound) are discarded like
    the reference's AssertionError skip.

    3D: rotate instructions only; `sv3d_edit_fn(img, mask, angle_deg,
    inp_background) -> (coarse, target_mask)` renders each sampled
    y-rotation (wire to `models.sv3d.re_edit_3d_sv3d` when SV3D weights are
    available).

    Returns a list of dicts with edit_prompt / edit_param / coarse /
    target_mask / out_of_img_boundary.
    """
    from freefine_tpu.ops.geometry import re_edit_2d

    results = []
    if not use_3d:
        for ins in generate_instructions(rng, "2D"):
            try:
                _, edit_param, oob = gen_2d_edit_config(mask, cons_area, ins, rng)
            except ValueError as e:          # infeasible sample -> discard
                continue
            coarse, tgt_mask, _ = re_edit_2d(img, mask, edit_param, inp_img)
            results.append({
                "edit_prompt": ins.prompt.format(object=obj_label),
                "edit_param": edit_param,
                "coarse": coarse,
                "target_mask": tgt_mask,
                "out_of_img_boundary": bool(oob),
            })
        return results

    assert sv3d_edit_fn is not None, (
        "3D authoring needs an SV3D renderer; pass sv3d_edit_fn wired to "
        "freefine_tpu.models.sv3d.re_edit_3d_sv3d"
    )
    for ins in generate_instructions(rng, "3D"):
        if ins.type != "rotate":
            continue
        edit_param, deg = gen_3d_edit_config(ins, rng)
        coarse, tgt_mask = sv3d_edit_fn(img, mask, deg, inp_img)
        results.append({
            "edit_prompt": ins.prompt.format(object=obj_label),
            "edit_param": edit_param,
            "coarse": coarse,
            "target_mask": tgt_mask,
            "out_of_img_boundary": False,
        })
    return results


def run_coarse_authoring(
    src_json: str,
    dst_base: str,
    data_id=None,
    use_3d: bool = False,
    seed: int = 42,
    sv3d_edit_fn=None,
    size: int = 512,
    progress=print,
):
    """End-to-end GeoBench coarse-input authoring with temp-file resume.

    Mirrors the reference batch driver (re_edit_3d.py:1239-1395): iterate
    source instances (schema: data[da_n] = {src_img_path, 4v_caption/
    caption, instances: {mask_path: [...], inp_img_path: [...],
    obj_label: [...]}}), build the constrain-area union, sample
    constraint-aware edits per instance, write coarse_input/ + target_mask/
    images, checkpoint to {3d_}temp_file_coarse.json after every instance,
    and emit {3d_}coarse_input_full_pack_{id}.json at the end (removing the
    temp file).

    Deviation: one seeded numpy Generator instead of the reference's
    wall-clock global seeding (re_edit_3d.py:531) — runs are reproducible.
    """
    import os
    import os.path as osp

    from freefine_tpu import masks as mask_ops
    from freefine_tpu.data.geobench import (
        load_json, read_image, read_mask, save_image, save_json,
    )

    prefix = "3d_" if use_3d else ""
    tag = "all" if data_id is None else str(data_id)
    final_path = osp.join(dst_base, f"{prefix}coarse_input_full_pack_{tag}.json")
    if osp.exists(final_path):
        progress(f"coarse edit for {tag} already finished ({final_path})")
        return load_json(final_path)
    temp_path = osp.join(dst_base, f"{prefix}temp_file_coarse.json")
    new_data = load_json(temp_path) if osp.exists(temp_path) else {}

    coarse_dir = osp.join(dst_base, "coarse_input_3d" if use_3d else "coarse_input")
    tgt_dir = osp.join(dst_base, "target_mask_3d" if use_3d else "target_mask")
    data = load_json(src_json)
    base_dir = osp.dirname(osp.abspath(src_json))

    def resolve(p):
        return p if osp.isabs(p) else osp.join(base_dir, p)

    rng = np.random.default_rng(seed)
    for da_n, da in data.items():
        if "instances" not in da:
            progress(f"skip {da_n}: no instances")
            continue
        if da_n in new_data and new_data[da_n].get("instances"):
            progress(f"skip {da_n}: already authored (resume)")
            continue
        img = read_image(resolve(da["src_img_path"]), size=size)
        instances = da["instances"]
        mask_list = instances["mask_path"]
        inp_list = instances["inp_img_path"]
        labels = instances["obj_label"]
        raw_masks = [read_mask(resolve(m), size=size) for m in mask_list]
        cons_all = np.asarray(
            mask_ops.get_constrain_areas(raw_masks, size, size)
        )

        entry = {
            "src_img_path": da["src_img_path"],
            "4v_caption": da.get("4v_caption", da.get("caption", "")),
            "instances": {},
        }
        for ins_id in range(len(inp_list)):
            mask_cur = (raw_masks[ins_id] > 0).astype(np.float32)
            inp_cur = read_image(resolve(inp_list[ins_id]), size=size)
            cons = np.where(mask_cur > 0, 0.0, cons_all).astype(np.float32)
            samples = sample_instance_edits(
                img, mask_cur, inp_cur, cons, labels[ins_id], rng,
                use_3d=use_3d, sv3d_edit_fn=sv3d_edit_fn,
            )
            sample_dict = {}
            for sid, s in enumerate(samples):
                tgt_path = osp.join(tgt_dir, da_n, str(ins_id), f"{sid}.png")
                coarse_path = osp.join(coarse_dir, da_n, str(ins_id), f"{sid}.png")
                save_image(s["target_mask"], tgt_path)
                save_image(s["coarse"], coarse_path)
                sample_dict[str(sid)] = {
                    "edit_prompt": s["edit_prompt"],
                    "src_img_path": da["src_img_path"],
                    "obj_label": labels[ins_id],
                    "ori_img_path": da["src_img_path"],
                    "ori_mask_path": mask_list[ins_id],
                    "tgt_mask_path": tgt_path,
                    "coarse_input_path": coarse_path,
                    "edit_param": list(s["edit_param"]),
                    "out_of_img_boundary": s["out_of_img_boundary"],
                }
            entry["instances"][str(ins_id)] = sample_dict
            new_data[da_n] = entry
            save_json(new_data, temp_path)  # per-instance resume checkpoint
        progress(f"{da_n}: {sum(len(v) for v in entry['instances'].values())} edits")

    save_json(new_data, final_path)
    if osp.exists(temp_path):
        os.remove(temp_path)
    progress(f"wrote {final_path}")
    return new_data


def _cli(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="GeoBench coarse-input authoring "
                    "(python -m freefine_tpu.data.datagen)"
    )
    p.add_argument("--src", required=True, help="source annotations JSON")
    p.add_argument("--out", required=True, help="destination base dir")
    p.add_argument("--data-id", default=None, help="subset tag for the pack name")
    p.add_argument("--use-3d", action="store_true",
                   help="author 3D y-rotations (needs SV3D weights)")
    p.add_argument("--sv3d-dir", default=None,
                   help="converted SV3D checkpoint dir (orbax) for --use-3d")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--size", type=int, default=512)
    a = p.parse_args(argv)

    sv3d_fn = None
    if a.use_3d:
        if a.sv3d_dir is None:
            p.error("--use-3d needs --sv3d-dir (converted SV3D weights)")
        from freefine_tpu.models.sv3d import make_sv3d_edit_fn

        sv3d_fn = make_sv3d_edit_fn(a.sv3d_dir)
    return run_coarse_authoring(
        a.src, a.out, data_id=a.data_id, use_3d=a.use_3d, seed=a.seed,
        sv3d_edit_fn=sv3d_fn, size=a.size,
    )


if __name__ == "__main__":
    _cli()
