"""Tests for scripts/embedding_tools.py (the reference's embedding dev
tooling: find_similar_beatmaps / plot_embeddings / embedding_svm /
plot_difficulties)."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import embedding_tools  # noqa: E402
from make_synth_corpus import main as make_corpus  # noqa: E402

from beatheritage_tpu.config import DiffusionTrainConfig, load_config
from beatheritage_tpu.data.dataset import load_mmrs_metadata
from beatheritage_tpu.diffusion.tokenizer import DiffusionTokenizer
from beatheritage_tpu.models.dit import DiTDims, init_dit_params
from beatheritage_tpu.train.checkpoints import save_params


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mmrs_emb")
    argv = sys.argv
    sys.argv = ["make_synth_corpus", "--out", str(root), "--sets", "6",
                "--styles", "3", "--seed", "0"]
    try:
        make_corpus()
    finally:
        sys.argv = argv
    return root


@pytest.fixture(scope="module")
def ckpt(corpus, tmp_path_factory):
    """A DiT checkpoint whose class_size matches the corpus tables."""
    cfg = load_config(DiffusionTrainConfig, "diffusion", "tiny", overrides=[
        f"data.train_dataset_path={corpus}"])
    tok = DiffusionTokenizer(cfg)
    tok.load_dataset_indices(load_mmrs_metadata(corpus))
    dims = DiTDims.from_name("DiT-S", context_size=cfg.model.context_size,
                             class_size=tok.num_tokens)
    params = init_dit_params(jax.random.PRNGKey(0), dims)
    path = tmp_path_factory.mktemp("ckpt") / "dit"
    save_params(str(path), {"params": params, "ema": params})
    return str(path)


def _beatmap_id(corpus):
    return int(load_mmrs_metadata(corpus).reset_index()["Id"].iloc[0])


def test_similar_lists_nearest_styles(corpus, ckpt, capsys):
    rc = embedding_tools.main([
        "similar", "--config", "tiny", "--ckpt", ckpt,
        "--dataset", str(corpus), "--beatmap-id", str(_beatmap_id(corpus)),
        "-k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out) >= 2
    assert out[0]["distance"] == pytest.approx(0.0, abs=1e-6)
    assert all("beatmap_id" in row for row in out)
    dists = [row["distance"] for row in out]
    assert dists == sorted(dists)


def test_similar_rejects_mismatched_checkpoint(corpus, ckpt, tmp_path):
    """An unconditioned checkpoint (class_size < style count) must fail
    loudly, not return garbage neighbours."""
    cfg = load_config(DiffusionTrainConfig, "diffusion", "tiny", overrides=[
        f"data.train_dataset_path={corpus}"])
    dims = DiTDims.from_name("DiT-S", context_size=cfg.model.context_size,
                             class_size=4)
    params = init_dit_params(jax.random.PRNGKey(0), dims)
    save_params(str(tmp_path / "small"), {"params": params, "ema": params})
    with pytest.raises(SystemExit, match="mismatch"):
        embedding_tools.main([
            "similar", "--config", "tiny", "--ckpt", str(tmp_path / "small"),
            "--dataset", str(corpus),
            "--beatmap-id", str(_beatmap_id(corpus))])


def test_difficulties_histogram(corpus, tmp_path, capsys):
    out = tmp_path / "diffs.png"
    rc = embedding_tools.main([
        "difficulties", "--dataset", str(corpus), "--out", str(out)])
    assert rc == 0
    assert out.is_file() and out.stat().st_size > 0


def test_tsne_plot(corpus, ckpt, tmp_path):
    out = tmp_path / "emb.png"
    rc = embedding_tools.main([
        "tsne", "--config", "tiny", "--ckpt", ckpt,
        "--dataset", str(corpus), "--out", str(out)])
    assert rc == 0
    assert out.is_file() and out.stat().st_size > 0
