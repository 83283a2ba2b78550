"""DiffusionDataset and train_diffusion smoke tests.

Covers the parse-once cache (reference osu_diffusion/utils/data_loading.py
re-parses every epoch; we cache the augmentation-independent point arrays),
double-time equivalence of the cached-time rescale, and trainer
save/resume through the CLI entry point.
"""

import numpy as np
import pandas as pd
import pytest

from beatheritage_tpu.config import DiffusionTrainConfig, load_config
from beatheritage_tpu.data.audio import save_wav
from beatheritage_tpu.data.diffusion_dataset import (
    DiffusionDataset,
    beatmap_to_points,
)
from beatheritage_tpu.diffusion.tokenizer import DiffusionTokenizer
from beatheritage_tpu.osu.beatmap import Beatmap

OSU_TEMPLATE = """osu file format v14
[General]
AudioFilename: audio.wav
Mode: 0
[Metadata]
Title:T{bid}
BeatmapID:{bid}
BeatmapSetID:{sid}
[Difficulty]
CircleSize:4
SliderMultiplier:1.4
[TimingPoints]
0,500,4,2,0,60,1,0
[HitObjects]
{objects}
"""


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Two mapsets with circles + a slider each."""
    root = tmp_path_factory.mktemp("mmrs_diff")
    (root / "data").mkdir()
    rows = []
    rng = np.random.default_rng(0)
    bid = 100
    for sid in (1, 2):
        folder = f"set{sid}"
        (root / "data" / folder).mkdir()
        audio = (0.1 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)
                 ).astype(np.float32)
        save_wav(root / "data" / folder / "audio.wav", audio, 16000)
        for diff in range(2):
            lines = [
                f"{int(rng.integers(0, 512))},{int(rng.integers(0, 384))},"
                f"{t},1,0,0:0:0:0:"
                for t in range(500, 3000, 250)
            ]
            lines.append("100,100,3200,2,0,B|150:150|200:100,2,140")
            fname = f"map{bid}.osu"
            (root / "data" / folder / fname).write_text(
                OSU_TEMPLATE.format(bid=bid, sid=sid,
                                    objects="\n".join(lines)))
            rows.append({
                "BeatmapSetId": sid, "Id": bid, "BeatmapIdx": bid - 100,
                "BeatmapSetFolder": folder, "BeatmapFile": fname,
                "AudioFile": "audio.wav", "ModeInt": 0, "UserId": 1000 + sid,
                "StarRating": [3.0 + diff] * 7,
                "DifficultyRating": 3.0 + diff,
                "SubmittedDate": pd.Timestamp("2020-01-01"),
                "RankedDate": pd.Timestamp("2020-06-01"),
                "OmdbTags": [],
            })
            bid += 1
    pd.DataFrame(rows).to_parquet(root / "metadata.parquet")
    return root


@pytest.fixture(scope="module")
def cfg(corpus):
    return load_config(DiffusionTrainConfig, "diffusion", "tiny", overrides=[
        f"data.train_dataset_path={corpus}",
    ])


def test_dataset_shapes_and_cache_determinism(cfg):
    ds = DiffusionDataset(cfg, DiffusionTokenizer(cfg), test=True)
    first = list(ds)  # parses + builds the cache
    assert first, "dataset yielded nothing"
    L = cfg.data.seq_len
    for ex in first:
        assert ex["x"].shape == (L, 2)
        assert ex["o"].shape == (L,) and ex["d"].shape == (L,)
        # o + d + kinds widths must add up to the model's context_size
        assert 128 + 128 + ex["k"].shape[1] == cfg.model.context_size
        assert ex["x"].dtype == np.float32
        assert np.all(np.abs(ex["x"]) <= 3.0)
    second = list(ds)  # served from the cache
    assert len(second) == len(first)
    for a, b in zip(first, second):
        for key in ("x", "o", "d", "k", "y"):
            np.testing.assert_array_equal(a[key], b[key])


def test_tokenizer_dataset_indices(cfg, corpus):
    """load_dataset_indices builds style/mapper/descriptor blocks from the
    corpus metadata (reference osu_diffusion trains class-conditional)."""
    from beatheritage_tpu.data.dataset import load_mmrs_metadata

    md = load_mmrs_metadata(corpus)
    tok = DiffusionTokenizer(cfg)
    base = tok.num_tokens  # diff + cs blocks only
    tok.load_dataset_indices(md, cfg)
    # corpus fixture: 2 mapsets x 2 maps, 2 unique mappers
    assert tok.num_mapper_classes == 2 + 1  # + unk
    assert tok.num_tokens > base
    assert tok.encode_mapper_id(1001) != tok.encode_mapper_id(1002)
    assert tok.encode_mapper_id(999999) == tok.mapper_unk
    # round-trips through the json state
    tok2 = DiffusionTokenizer(cfg)
    tok2.load_state_dict(tok.state_dict())
    assert tok2.num_tokens == tok.num_tokens
    assert tok2.encode_mapper_id(1001) == tok.encode_mapper_id(1001)


def test_double_time_matches_parsing_at_speed(cfg, corpus):
    """Rescaling the cached time column == re-parsing at speed 1.5."""
    bm = Beatmap.from_path(corpus / "data" / "set1" / "map100.osu")
    base = beatmap_to_points(bm)
    fast = beatmap_to_points(bm, 1.5)
    rescaled = base.copy()
    rescaled[:, 2] /= 1.5
    np.testing.assert_allclose(rescaled, fast, rtol=1e-6)


def test_trainer_smoke_and_resume(cfg, corpus, tmp_path):
    """Two steps + checkpoint, then resume completes the remaining step
    (global-step bound, same contract as the seq2seq Trainer). Runs in a
    single-device CPU subprocess: compiling the pjit step on the 8-device
    virtual mesh takes minutes on a 1-core host."""
    import os
    import subprocess
    import sys

    from beatheritage_tpu.train.checkpoints import latest_state_dir

    ckpt = tmp_path / "dit"
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS="")
    common = [
        sys.executable, "-m", "beatheritage_tpu.apps.train_diffusion",
        "-cn", "tiny", "device=cpu",  # env alone loses to the site hook
        f"data.train_dataset_path={corpus}",
        f"checkpoint_path={ckpt}",
        "checkpoint.every_steps=2", "logging.every_steps=1",
    ]
    out = subprocess.run(common + ["optim.total_steps=2"], env=env,
                         capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert latest_state_dir(ckpt).name == "state_2"
    assert (ckpt / "params").exists()

    # resume with a larger budget: trains only the remaining step
    out = subprocess.run(
        common + ["optim.total_steps=3", "checkpoint.every_steps=3"],
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "resumed from" in out.stdout
    assert latest_state_dir(ckpt).name == "state_3"
