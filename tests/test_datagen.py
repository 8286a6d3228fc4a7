"""Dataset-generation sampler tests."""

import numpy as np
import pytest

from freefine_tpu.data import datagen as D


@pytest.fixture
def scene():
    mask = np.zeros((64, 64), np.uint8)
    mask[24:40, 24:40] = 1
    cons = np.zeros((64, 64), np.float32)
    return mask, cons


def test_generate_instructions_cover_all_ops():
    rng = np.random.default_rng(0)
    instrs = D.generate_instructions(rng, "2D")
    types = {i.type for i in instrs}
    assert types == {"move", "rotate", "enlarge", "shrink"}
    assert len(instrs) == 4 * 3  # ops x degree levels
    for i in instrs:
        assert "{object}" in i.prompt
        assert D.find_motion_type(i.prompt) == i.type
        assert D.find_degree(i.prompt) == i.degree


def test_sample_move_respects_direction(scene):
    mask, cons = scene
    rng = np.random.default_rng(1)
    dx, dy, oob = D.sample_move(mask, cons, "rightward", "level_1", rng)
    assert dx > 0 and dy == 0 and not oob
    dx, dy, oob = D.sample_move(mask, cons, "upper-left", "level_2", rng)
    assert dx < 0 and dy < 0


def test_sample_move_flags_out_of_bounds():
    mask = np.zeros((64, 64), np.uint8)
    mask[24:40, 44:60] = 1  # bbox right edge at 60
    cons = np.zeros((64, 64), np.float32)
    rng = np.random.default_rng(2)
    # level 3 rightward: dx in [12, 25]; 60 + 12 > 64 always -> oob
    _, _, oob = D.sample_move(mask, cons, "rightward", "level_3", rng)
    assert oob


def test_sample_scale_bounds(scene):
    mask, cons = scene
    rng = np.random.default_rng(3)
    for _ in range(5):
        sx, sy = D.sample_scale(mask, cons, "shrink", "level_2", rng)
        assert 0.6 <= sx <= 0.8 and sx == sy
        sx, sy = D.sample_scale(mask, cons, "enlarge", "level_1", rng)
        assert sx > 1.1


def test_rotation_constrained_by_obstacles(scene):
    mask, cons = scene
    rng = np.random.default_rng(4)
    free_angle = D.sample_rotation_2d(mask, cons, "clockwise", "level_1", rng)
    assert 5 <= free_angle <= 10
    ccw = D.sample_rotation_2d(mask, cons, "counterclockwise", "level_1", rng)
    assert -10 <= ccw <= -5
    # a fully-blocked constrain area kills rotation
    blocked = np.ones((64, 64), np.float32)
    with pytest.raises(ValueError):
        D.sample_rotation_2d(mask, blocked, "clockwise", "level_3", rng)


def test_gen_2d_edit_config_param_layout(scene):
    mask, cons = scene
    rng = np.random.default_rng(5)
    instr = D.Instruction("move", "rightward", "level_1",
                          "Move the {object} rightward lightly")
    cfg, param, oob = D.gen_2d_edit_config(mask, cons, instr, rng)
    assert len(param) == 9
    assert param[0] == cfg["dx"] and param[5] == cfg["rotation_angle"]
    assert param[6:9] == [1.0, 1.0, 1]


def test_gen_3d_edit_config():
    rng = np.random.default_rng(6)
    instr = D.Instruction(
        "rotate", "around the y-axis counterclockwise", "level_2",
        "Rotate the {object} around the y-axis counterclockwise moderately",
    )
    assert D.judge_2d_3d(instr) == "3D"
    param, deg = D.gen_3d_edit_config(instr, rng)
    assert param[4] == deg and -20 <= deg <= -15
    instr2 = D.Instruction(
        "rotate", "around the z-axis clockwise", "level_1",
        "Turn the {object} around the z-axis clockwise gently",
    )
    assert D.judge_2d_3d(instr2) == "2D"


def test_azimuth_angles():
    az = D.generate_azimuth_angles(21, [30, 60, -30, -60])
    assert len(az) == 21
    assert az[-1] == 0.0
    s = set(np.round(az, 3))
    for a in (30, 60, 300, 330):
        assert a in s
    inner = az[:-1]
    assert inner == sorted(inner)


def test_vis_utils(tmp_path, rng_np):
    import jax.numpy as jnp

    from freefine_tpu.utils.vis import latent_to_preview, save_intermediate_gif

    lat = jnp.asarray(rng_np.normal(size=(2, 8, 8, 4)).astype(np.float32))
    prev = latent_to_preview(lat)
    assert prev.shape == (2, 8, 8, 3) and prev.dtype == np.uint8
    gif = save_intermediate_gif([prev[0], prev[1]], str(tmp_path), "t.gif")
    import os

    assert os.path.exists(gif)


def test_stage_timer():
    from freefine_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and "a" in t.report()
