"""Training dataset pipeline tests on a synthetic MMRS corpus."""

import numpy as np
import pandas as pd
import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.data.audio import save_wav
from beatheritage_tpu.data.dataset import (
    LABEL_IGNORE_ID,
    MmrsDataset,
    SharedTrainState,
    batch_iterator,
    filter_mmrs_metadata,
)
from beatheritage_tpu.data.parser import BeatmapParser
from beatheritage_tpu.events import EventType
from beatheritage_tpu.tokenizer import Tokenizer

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
    """Two mapsets, two difficulties each, 4s of audio per set."""
    root = tmp_path_factory.mktemp("mmrs")
    (root / "data").mkdir()
    rows = []
    rng = np.random.default_rng(0)
    bid = 100
    for sid in (1, 2):
        folder = f"set{sid}"
        (root / "data" / folder).mkdir()
        audio = (0.1 * np.sin(2 * np.pi * 220 * np.arange(4 * 16000) / 16000)).astype(np.float32)
        save_wav(root / "data" / folder / "audio.wav", audio, 16000)
        for diff in range(2):
            objects = "\n".join(
                f"{int(rng.integers(0, 512))},{int(rng.integers(0, 384))},{t},1,0,0:0:0:0:"
                for t in range(500, 3500, 250))
            fname = f"map{bid}.osu"
            (root / "data" / folder / fname).write_text(
                OSU_TEMPLATE.format(bid=bid, sid=sid, objects=objects))
            rows.append({
                "BeatmapSetId": sid, "Id": bid, "BeatmapIdx": bid - 100,
                "BeatmapSetFolder": folder, "BeatmapFile": fname,
                "AudioFile": "audio.wav", "ModeInt": 0, "UserId": 1000 + sid,
                "StarRating": [3.0 + diff] * 7,
                "DifficultyRating": 3.0 + diff,
                "SubmittedDate": pd.Timestamp("2020-01-01"),
                "RankedDate": pd.Timestamp("2020-06-01"),
                "OmdbTags": ["jump aim"] if diff else [],
            })
            bid += 1
    df = pd.DataFrame(rows)
    df.to_parquet(root / "metadata.parquet")
    return root


@pytest.fixture(scope="module")
def cfg(corpus):
    return load_config(TrainConfig, "train", "tiny", overrides=[
        f"data.train_dataset_path={corpus}",
        "data.train_dataset_start=0", "data.train_dataset_end=2",
        "data.dt_augment_prob=0", "data.frame_offset_augment_prob=0",
        "data.cycle_length=1", "data.per_track=true",
    ])


@pytest.fixture(scope="module")
def pieces(cfg):
    tok = Tokenizer(cfg)
    tok.load_dataset_indices(__import__(
        "beatheritage_tpu.data.dataset", fromlist=["load_mmrs_metadata"]
    ).load_mmrs_metadata(cfg.data.train_dataset_path))
    parser = BeatmapParser(cfg, tok)
    return tok, parser


def test_metadata_filtering(corpus):
    from beatheritage_tpu.data.dataset import load_mmrs_metadata
    df = load_mmrs_metadata(corpus)
    assert len(df) == 4
    assert len(filter_mmrs_metadata(df, start=0, end=1)) == 2
    assert len(filter_mmrs_metadata(df, gamemodes=[3])) == 0


def test_dataset_yields_valid_examples(cfg, pieces):
    tok, parser = pieces
    ds = MmrsDataset(cfg.data, parser, tok, shared=SharedTrainState())
    examples = []
    for ex in ds:
        examples.append(ex)
        if len(examples) >= 6:
            break
    assert len(examples) >= 4
    ex = examples[0]
    assert ex["frames"].shape == ((cfg.data.src_seq_len - 1) * cfg.data.hop_length,)
    assert ex["decoder_input_ids"].shape == (cfg.data.tgt_seq_len,)
    assert ex["labels"].shape == (cfg.data.tgt_seq_len,)
    # labels must contain the EOS exactly where the sequence ends
    assert tok.eos_id in ex["labels"]
    # tokens must be within vocab
    assert ex["decoder_input_ids"].max() < tok.vocab_size_in
    valid_labels = ex["labels"][ex["labels"] != LABEL_IGNORE_ID]
    assert valid_labels.max() < tok.vocab_size_out
    assert ex["song_position"].shape == (2,)


def test_labels_are_shifted_inputs(cfg, pieces):
    """Where labels are not ignored, label[i] must equal input[i+1]
    (teacher forcing alignment), except the final EOS."""
    tok, parser = pieces
    ds = MmrsDataset(cfg.data, parser, tok)
    ex = next(iter(ds))
    ids, labels = ex["decoder_input_ids"], ex["labels"]
    for i in np.nonzero(labels != LABEL_IGNORE_ID)[0][:-1]:
        if labels[i] == tok.eos_id:
            continue
        assert labels[i] == ids[i + 1], f"label mismatch at {i}"


def test_sos_present_and_out_context_types(cfg, pieces):
    tok, parser = pieces
    ds = MmrsDataset(cfg.data, parser, tok)
    ex = next(iter(ds))
    ids = ex["decoder_input_ids"]
    assert tok.sos_id in ids
    # tiny config has add_out_context_types: the out-context SOS marker
    # appears right after the global SOS
    sos_pos = int(np.nonzero(ids == tok.sos_id)[0][0])
    assert ids[sos_pos + 1] in set(tok.context_sos.values())


def test_batch_iterator_shapes(cfg, pieces):
    tok, parser = pieces
    ds = MmrsDataset(cfg.data, parser, tok)
    batch = next(batch_iterator(ds, batch_size=2))
    assert batch["decoder_input_ids"].shape == (2, cfg.data.tgt_seq_len)
    assert batch["frames"].shape[0] == 2


def test_dataset_feeds_train_step(cfg, pieces):
    """The full loop closes: corpus -> batches -> one jitted train step."""
    import jax.numpy as jnp
    from beatheritage_tpu.models import ModelDims, init_params
    from beatheritage_tpu.parallel import build_mesh
    from beatheritage_tpu.train import (
        build_optimizer, build_schedule, init_train_state, make_train_step)
    import jax

    tok, parser = pieces
    dims = ModelDims.from_config(cfg, tok)
    params = init_params(jax.random.PRNGKey(0), dims)
    schedule = build_schedule(cfg.optim)
    optimizer = build_optimizer(cfg.optim, schedule)
    mesh = build_mesh(1, 1, devices=jax.devices()[:1])
    step = make_train_step(dims, cfg, optimizer, mesh, dtype=jnp.float32)
    state = init_train_state(params, optimizer)

    ds = MmrsDataset(cfg.data, parser, tok)
    batch = next(batch_iterator(ds, batch_size=2))
    batch.pop("sample_weights", None)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["accuracy"]) >= 0


def test_classifier_dataset_token_only_mode(cfg, pieces):
    """use_audio=False: no audio IO, windows span the event range, and the
    windows feed the token-only classifier loss (the FID instrument)."""
    import jax

    from beatheritage_tpu.data.classifier_dataset import ClassifierDataset
    from beatheritage_tpu.models.classifier import (
        ClassifierDims, init_token_classifier_params, token_classifier_loss)

    tok, parser = pieces
    # the fixture audio is 4 s < the 8.192 s window, so audio mode yields
    # nothing — token mode must still produce one window per difficulty
    ds_audio = ClassifierDataset(cfg.data, parser, tok, test=True)
    assert len(list(ds_audio)) == 0
    ds = ClassifierDataset(cfg.data, parser, tok, test=True, use_audio=False,
                           max_tokens=64)
    items = list(ds)
    assert len(items) == 4
    for item in items:
        assert "audio" not in item
        assert item["tokens"].shape == (64,)
        assert (item["tokens"] >= 0).all()
        assert item["label"] >= 0

    batch = next(batch_iterator(ds, batch_size=4))
    dims = ClassifierDims(d_model=32, num_heads=2, d_ff=64, encoder_layers=1,
                          decoder_layers=0, vocab_size=tok.vocab_size_in,
                          num_classes=4, proj_size=8)
    params = init_token_classifier_params(jax.random.PRNGKey(0), dims)
    loss, aux = token_classifier_loss(params, dims, batch["tokens"],
                                      batch["label"], pad_id=tok.pad_id)
    assert np.isfinite(float(loss))
