"""BeatHeritage V1 enhancement layer (inference/enhance.py): quality
control, flow, pattern variety, style passes over a generated std map.
(reference beatheritage_postprocessor.py — dead code there, live here.)
"""

import dataclasses
import math

from beatheritage_tpu.config import InferenceConfig
from beatheritage_tpu.inference.enhance import MapEnhancer, enhance_result
from beatheritage_tpu.osu.beatmap import Beatmap, Slider


def make_osu(objects: list[str]) -> str:
    return "\n".join([
        "osu file format v14",
        "",
        "[General]",
        "AudioFilename: audio.wav",
        "Mode: 0",
        "",
        "[Metadata]",
        "Title:t",
        "Artist:a",
        "Creator:c",
        "Version:v",
        "BeatmapID:1",
        "BeatmapSetID:1",
        "",
        "[Difficulty]",
        "HPDrainRate:5",
        "CircleSize:4",
        "OverallDifficulty:7",
        "ApproachRate:9",
        "SliderMultiplier:1.4",
        "SliderTickRate:1",
        "",
        "[TimingPoints]",
        "100,500,4,2,0,60,1,0",
        "",
        "[HitObjects]",
        *objects,
        "",
    ])


def args_with(**kw) -> InferenceConfig:
    args = InferenceConfig()
    for k, v in kw.items():
        section, name = k.split("__")
        setattr(getattr(args, section), name, v)
    return args


def test_disabled_is_identity():
    osu = make_osu(["100,100,100,1,0,0:0:0:0:", "103,100,600,1,0,0:0:0:0:"])
    assert enhance_result(osu, InferenceConfig()) == osu


def test_spacing_fix_pushes_apart():
    osu = make_osu(["100,100,100,1,0,0:0:0:0:", "103,100,600,1,0,0:0:0:0:"])
    args = args_with(quality_control__enable_auto_correction=True)
    args.quality_control.min_distance_threshold = 20.0
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    a, b = list(out.hit_objects())
    assert math.hypot(b.x - a.x, b.y - a.y) >= 20.0 - 1e-6


def test_overlap_fix_scans_lookahead_not_just_neighbors():
    # objects 0 and 2 overlap heavily; object 1 is far away
    osu = make_osu(["100,100,100,1,0,0:0:0:0:",
                    "400,300,600,1,0,0:0:0:0:",
                    "110,100,1100,1,0,0:0:0:0:"])
    args = args_with(quality_control__enable_auto_correction=True)
    args.quality_control.max_overlap_ratio = 0.3
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    objs = list(out.hit_objects())
    r = 54.4 - 4.48 * 4
    d = math.hypot(objs[2].x - objs[0].x, objs[2].y - objs[0].y)
    assert max(0.0, 2 * r - d) / (2 * r) <= 0.3 + 1e-6


def test_exact_stacks_are_preserved():
    osu = make_osu(["100,100,100,1,0,0:0:0:0:", "100,100,600,1,0,0:0:0:0:"])
    args = args_with(quality_control__enable_auto_correction=True)
    args.quality_control.min_distance_threshold = 0.0
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    a, b = list(out.hit_objects())
    assert (a.x, a.y) == (b.x, b.y)


def test_flow_smoothing_caps_sharp_turns():
    # 170-degree turn: A(0,192) -> B(100,192) -> C(1.5,183.4) (back on itself)
    osu = make_osu(["50,192,100,1,0,0:0:0:0:",
                    "150,192,600,1,0,0:0:0:0:",
                    "52,175,1100,1,0,0:0:0:0:"])
    args = args_with(quality_control__enable_flow_optimization=True)
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    a, b, c = list(out.hit_objects())
    a_prev = math.atan2(b.y - a.y, b.x - a.x)
    a_cur = math.atan2(c.y - b.y, c.x - b.x)
    diff = (math.degrees(a_cur - a_prev) + 180.0) % 360.0 - 180.0
    assert abs(diff) <= 120.0 + 1e-6
    # jump distance preserved
    assert math.hypot(c.x - b.x, c.y - b.y) > 90.0


def test_slider_translates_rigidly():
    osu = make_osu(["100,100,100,1,0,0:0:0:0:",
                    "102,100,600,2,0,L|202:100,1,100"])
    args = args_with(quality_control__enable_auto_correction=True)
    args.quality_control.min_distance_threshold = 30.0
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    sl = [o for o in out.hit_objects() if isinstance(o, Slider)][0]
    # anchor offset from head must still be (100, 0)
    (ax, ay), = sl.curve_points
    assert abs((ax - sl.x) - 100) < 1e-6 and abs(ay - sl.y) < 1e-6
    assert sl.length == 100


def test_pattern_variety_breaks_repeats():
    # 16 objects alternating between two fixed positions: second window is a
    # near-copy of the first -> must be replaced with a library pattern
    objs = []
    for i in range(16):
        x = 100 if i % 2 == 0 else 200
        objs.append(f"{x},200,{100 + i * 500},1,0,0:0:0:0:")
    osu = make_osu(objs)
    args = args_with(advanced_features__enable_pattern_variety=True)
    before = [(o.x, o.y) for o in Beatmap.from_string(osu).hit_objects()]
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    after = [(o.x, o.y) for o in out.hit_objects()]
    assert before[:8] == after[:8]
    assert before[8:] != after[8:]
    for x, y in after:
        assert 0 <= x <= 512 and 0 <= y <= 384


def test_style_preservation_narrows_spacing_spread():
    objs = ["100,100,100,1,0,0:0:0:0:",
            "110,100,600,1,0,0:0:0:0:",     # 10 px jump
            "310,100,1100,1,0,0:0:0:0:",    # 200 px jump
            "320,100,1600,1,0,0:0:0:0:"]    # 10 px jump
    osu = make_osu(objs)
    args = args_with(advanced_features__enable_style_preservation=True)
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    got = list(out.hit_objects())
    spacings = [math.hypot(b.x - a.x, b.y - a.y)
                for a, b in zip(got, got[1:])]
    assert max(spacings) - min(spacings) < 190.0  # was 190 spread before


def test_difficulty_scaling_changes_spacing_toward_target():
    objs = [f"{100 + i * 20},200,{100 + i * 500},1,0,0:0:0:0:"
            for i in range(8)]
    osu = make_osu(objs)
    args = args_with(advanced_features__enable_difficulty_scaling=True)
    args.difficulty = 8.0
    out = Beatmap.from_string(MapEnhancer(args).enhance_osu(osu))
    got = list(out.hit_objects())
    spacing = math.hypot(got[1].x - got[0].x, got[1].y - got[0].y)
    assert spacing > 20.0  # scaled up toward the higher star target


def test_non_std_modes_untouched():
    osu = make_osu(["100,100,100,1,0,0:0:0:0:",
                    "103,100,600,1,0,0:0:0:0:"]).replace("Mode: 0", "Mode: 1")
    args = args_with(quality_control__enable_auto_correction=True)
    assert MapEnhancer(args).enhance_osu(osu) == osu


def test_config_yaml_roundtrip():
    """base.yaml's quality_control/advanced_features sections land in the
    typed schema (they were silently dropped before)."""
    from beatheritage_tpu.config import load_config
    cfg = load_config(InferenceConfig, "inference", "base")
    assert cfg.quality_control.min_distance_threshold == 10
    assert cfg.quality_control.enable_auto_correction is False
    assert cfg.advanced_features.enable_pattern_variety is False
