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


def test_class_vector_conditioning_reaches_model(cfg, corpus):
    """VERDICT r3 item 2 infrastructure: with corpus tables loaded, the
    dataset's y vectors carry real (non-unk) style/diff/mapper/cs entries,
    and dit_forward output actually depends on them (a DiT trained on
    these y's is conditioned, unlike the r3 class_size=48 run)."""
    import jax
    import jax.numpy as jnp

    from beatheritage_tpu.data.dataset import load_mmrs_metadata
    from beatheritage_tpu.models.dit import (DiTDims, dit_forward,
                                             init_dit_params)

    tok = DiffusionTokenizer(cfg)
    tok.load_dataset_indices(load_mmrs_metadata(corpus), cfg)
    ds = DiffusionDataset(cfg, tok, test=True)  # test mode: no dropout
    ex = next(iter(ds))
    y = ex["y"]
    assert y.shape == (tok.num_tokens,)
    hot = set(np.flatnonzero(y).tolist())
    unks = {tok.style_unk, tok.diff_unk, tok.mapper_unk,
            tok.descriptor_unk, tok.cs_unk}
    # diff, mapper and cs (+ style when the config has a style block) must
    # be REAL classes; the fixture corpus has no descriptor tags so
    # descriptor falls to unk by design
    want_real = 3 + (1 if tok.num_classes > 0 else 0)
    assert len(hot - unks) >= want_real, \
        f"class vector mostly unk: {sorted(hot)} vs unks {sorted(unks)}"

    dims = DiTDims.from_name("DiT-test", context_size=cfg.model.context_size,
                             class_size=tok.num_tokens)
    params = init_dit_params(jax.random.PRNGKey(0), dims)
    # adaLN-Zero zero-inits the modulation MLPs, making the INIT output
    # conditioning-independent by design — perturb every zero leaf so the
    # conditioning path is live, as it is after any training
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
              if np.all(np.asarray(l) == 0) else l
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    L = cfg.data.seq_len
    x = jnp.asarray(ex["x"])[None]
    t = jnp.zeros((1,), jnp.int32) + 5
    c = jnp.concatenate([
        np.zeros((L, 128), np.float32), np.zeros((L, 128), np.float32),
        ex["k"].astype(np.float32)], axis=-1)[None]
    out_real = dit_forward(params, dims, x, t, c, jnp.asarray(y)[None])
    y_unk = np.zeros_like(y)
    for u in unks:
        y_unk[u] = 1
    out_unk = dit_forward(params, dims, x, t, c, jnp.asarray(y_unk)[None])
    diff = float(np.max(np.abs(np.asarray(out_real) - np.asarray(out_unk))))
    assert diff > 1e-6, "dit_forward ignores the class vector"
