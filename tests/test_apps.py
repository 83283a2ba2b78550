"""App-layer tests: web UI plumbing, collate, export, native audio, datasets."""

import json

import numpy as np
import pytest

from beatheritage_tpu.apps.webui import build_overrides
from beatheritage_tpu.eval.collate import collate


def test_build_overrides():
    config, overrides = build_overrides({
        "config": "v30", "audio_path": "/a.wav", "gamemode": "3",
        "difficulty": "5.5", "descriptors": "stream, tech",
        "extra": "super_timing=true top_p=0.9", "cfg_scale": "1.2",
    })
    assert config == "v30"
    assert "audio_path=/a.wav" in overrides
    assert "gamemode=3" in overrides
    assert "descriptors=[stream,tech]" in overrides
    assert "super_timing=true" in overrides and "top_p=0.9" in overrides


def test_collate_html(tmp_path):
    f1 = tmp_path / "a.json"
    f1.write_text(json.dumps({"fid": 12.5, "rhythm_active_f1": 0.8}))
    f2 = tmp_path / "b.json"
    f2.write_text(json.dumps([{"config_name": "v30", "wall_time_s": 3.2,
                               "quality": {"flow_score": 0.5}}]))
    html = collate([str(f1), str(f2)])
    assert "<table>" in html and "12.5" in html and "v30" in html


def test_native_audio_decode(tmp_path):
    from beatheritage_tpu.data.audio import save_wav, load_audio
    from beatheritage_tpu.native import available, decode_wav_native
    sr = 44100
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    p = tmp_path / "t.wav"
    save_wav(p, x, sr)
    if not available():
        from beatheritage_tpu.native.build import build
        build(verbose=False)
    out = decode_wav_native(p.read_bytes(), 16000)
    assert out is not None
    assert abs(len(out) - 16000) < 4
    assert np.max(np.abs(out)) == pytest.approx(1.0, abs=1e-3)
    # load_audio routes through native and gives the same contract
    via_loader = load_audio(p, 16000)
    assert abs(len(via_loader) - 16000) < 4


def test_export_strips_mapper_rows(tmp_path):
    import jax
    from beatheritage_tpu.apps.export_model import remove_mappers_from_model
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.models import ModelDims, init_params
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        "model.do_mapper_embed=true"])
    tok = Tokenizer(cfg)
    tok.mapper_idx = {111: 0, 222: 1}
    tok.num_mapper_classes = 2
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(0), dims)
    out = remove_mappers_from_model(params, tok, [222])
    table = np.asarray(out["cond"]["mapper"]["table"])
    assert np.all(table[1] == 0)
    assert np.any(table[0] != 0)


def test_classifier_dataset_windows(tmp_path):
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.data.classifier_dataset import RComplexionDataset
    from beatheritage_tpu.data.parser import BeatmapParser
    from beatheritage_tpu.osu import Beatmap
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    parser = BeatmapParser(cfg, tok)
    objects = "\n".join(f"{100},{100},{500 + i * 250},1,0,0:0:0:0:"
                        for i in range(30))
    bm = Beatmap.from_string(f"""osu file format v14
[General]
Mode: 0
[TimingPoints]
0,250,4,2,0,60,1,0
[HitObjects]
{objects}
""")
    ds = RComplexionDataset(cfg.data, parser, tok, metadata="unused",
                            path=tmp_path, src_seq_len=8)
    windows = list(ds.beatmap_windows(bm))
    assert len(windows) == 30 - 1 - 8
    w = windows[0]
    assert w["input_ids"].shape == (8,)
    # constant 250ms gaps -> constant delta token
    assert len(set(w["input_ids"].tolist())) == 1
    assert w["label"] == w["input_ids"][0]


def test_webui_descriptor_merge_and_validation():
    from beatheritage_tpu.apps.webui import build_overrides, validate_path_kind
    cfg, overrides = build_overrides({
        "config": "tiny", "audio_path": "/a.mp3",
        "descriptor_select": ["clean", "geometric"],
        "descriptors": "geometric, messy",
        "negative_descriptors": "chaotic",
    })
    assert cfg == "tiny"
    assert "descriptors=[clean,geometric,messy]" in overrides  # deduped
    assert "negative_descriptors=[chaotic]" in overrides
    ok, why = validate_path_kind("/definitely/missing.mp3", "file")
    assert not ok and "exist" in why
