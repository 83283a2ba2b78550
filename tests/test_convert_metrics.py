"""Checkpoint conversion + eval metric tests."""

import numpy as np
import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.tokenizer import Tokenizer
from beatheritage_tpu.train.metrics import (
    Averager,
    acc_range,
    context_buckets,
    fuzzy_acc_range,
    get_stats,
)


def _fake_reference_state_dict(dims):
    """Synthesize a torch-layout state dict matching the reference naming."""
    import torch
    sd = {}
    d, ff = dims.d_model, dims.d_ff
    mels = dims.encoder_input_dim

    def lin(prefix, i, o, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i) * 0.02
        if bias:
            sd[f"{prefix}.bias"] = torch.zeros(o)

    def ln(prefix, n):
        sd[f"{prefix}.weight"] = torch.ones(n)
        sd[f"{prefix}.bias"] = torch.zeros(n)

    enc = "transformer.model.encoder"
    dec = "transformer.model.decoder"
    # tiny config projects the encoder input first, so conv1 sees d_model
    lin("encoder_embedder", mels, d)
    sd[f"{enc}.conv1.weight"] = torch.randn(d, d, 3) * 0.02
    sd[f"{enc}.conv1.bias"] = torch.zeros(d)
    sd[f"{enc}.conv2.weight"] = torch.randn(d, d, 3) * 0.02
    sd[f"{enc}.conv2.bias"] = torch.zeros(d)
    for i in range(dims.encoder_layers):
        p = f"{enc}.layers.{i}"
        ln(f"{p}.self_attn_layer_norm", d)
        lin(f"{p}.self_attn.q_proj", d, d)
        lin(f"{p}.self_attn.k_proj", d, d, bias=False)
        lin(f"{p}.self_attn.v_proj", d, d)
        lin(f"{p}.self_attn.out_proj", d, d)
        ln(f"{p}.final_layer_norm", d)
        lin(f"{p}.fc1", d, ff)
        lin(f"{p}.fc2", ff, d)
    ln(f"{enc}.layer_norm", d)
    for i in range(dims.decoder_layers):
        p = f"{dec}.layers.{i}"
        ln(f"{p}.self_attn_layer_norm", d)
        lin(f"{p}.self_attn.q_proj", d, d)
        lin(f"{p}.self_attn.k_proj", d, d, bias=False)
        lin(f"{p}.self_attn.v_proj", d, d)
        lin(f"{p}.self_attn.out_proj", d, d)
        ln(f"{p}.encoder_attn_layer_norm", d)
        lin(f"{p}.encoder_attn.q_proj", d, d)
        lin(f"{p}.encoder_attn.k_proj", d, d, bias=False)
        lin(f"{p}.encoder_attn.v_proj", d, d)
        lin(f"{p}.encoder_attn.out_proj", d, d)
        ln(f"{p}.final_layer_norm", d)
        lin(f"{p}.fc1", d, ff)
        lin(f"{p}.fc2", ff, d)
    ln(f"{dec}.layer_norm", d)
    sd["decoder_embedder.weight"] = torch.randn(dims.vocab_size_in, d) * 0.02
    sd["transformer.proj_out.weight"] = torch.randn(dims.vocab_size_out, d) * 0.02
    return sd


def test_convert_reference_checkpoint_runs_forward():
    import jax.numpy as jnp
    from beatheritage_tpu.models import ModelDims
    from beatheritage_tpu.models.transformer import decode_train, encode
    from beatheritage_tpu.train.convert import convert_reference_state_dict

    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    sd = _fake_reference_state_dict(dims)
    params = convert_reference_state_dict(sd, dims)

    # shapes line up with our init layout and the model runs
    assert params["encoder"]["layers"]["q"]["w"].shape == (
        dims.encoder_layers, dims.d_model, dims.d_model)
    assert "b" not in params["encoder"]["layers"]["k"]
    assert params["lm_head"].shape == (dims.d_model, tok.vocab_size_out)

    params = __import__("jax").tree.map(jnp.asarray, params)
    audio = jnp.zeros((1, (cfg.data.src_seq_len - 1) * cfg.data.hop_length))
    enc_out = encode(params, dims, cfg, audio, dtype=jnp.float32)
    logits = decode_train(params, dims, jnp.ones((1, 8), jnp.int32), enc_out,
                          dtype=jnp.float32)
    assert logits.shape == (1, 8, tok.vocab_size_out)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_convert_tied_embeddings_head():
    from beatheritage_tpu.models import ModelDims
    from beatheritage_tpu.train.convert import convert_reference_state_dict

    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    dims = ModelDims.from_config(cfg, tok)
    sd = _fake_reference_state_dict(dims)
    del sd["transformer.proj_out.weight"]
    params = convert_reference_state_dict(sd, dims)
    assert params["lm_head"].shape == (dims.d_model, tok.vocab_size_out)


def test_acc_range_and_fuzzy():
    labels = np.array([5, 6, 7, 100])
    preds = np.array([5, 8, 7, 100])
    accs = acc_range(preds, labels, 5, 10)
    assert accs.tolist() == [1.0, 0.0, 1.0]
    fuzzy = fuzzy_acc_range(preds, labels, 5, 10, fuzzyness=2)
    assert fuzzy.tolist() == [1.0, 1.0, 1.0]


def test_averager_weighted_by_count():
    a = Averager()
    a.update({"acc": np.array([1.0, 0.0])})
    a.update({"acc": np.array([1.0, 1.0, 1.0, 1.0])})
    assert a.average()["acc"] == pytest.approx(5 / 6)


def test_context_buckets():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    from beatheritage_tpu.events import ContextType
    sos = tok.context_sos[ContextType.NONE]
    ids = np.full((3, 8), tok.pad_id)
    ids[0, 2] = sos  # row 0 has the NONE in-context marker
    ids[1, 3] = sos
    buckets = context_buckets(ids, tok, cfg)
    assert "none" in buckets
    assert buckets["none"].tolist() == [True, True, False]


def test_get_stats_keys():
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    preds = np.array([[tok.event_start["t" == "t" and __import__(
        "beatheritage_tpu.events", fromlist=["EventType"]).EventType.TIME_SHIFT]]])
    labels = preds.copy()
    stats = get_stats(1.0, preds, labels, tok, cfg)
    assert stats["loss"] == 1.0
    assert "timing_acc" in stats and "position_acc" in stats
    assert "column_acc" in stats and "scroll_speed_acc" in stats


def test_time_in_window_and_offset_histogram():
    from beatheritage_tpu.train.metrics import (
        time_in_window_accuracy, timeshift_offset_histogram)
    from beatheritage_tpu.events import EventType
    cfg = load_config(TrainConfig, "train", "tiny")
    tok = Tokenizer(cfg)
    start = tok.event_start[EventType.TIME_SHIFT]
    end = tok.event_end[EventType.TIME_SHIFT]
    labels = np.array([start, start + 50, end - 1, 0])
    preds = np.array([start, start + 52, end - 1, 0])
    bins = time_in_window_accuracy(preds, labels, tok, bins=10)
    assert any(k.startswith("time_bin_") for k in bins)
    hist = timeshift_offset_histogram(preds, labels, tok)
    assert hist["timeshift_offset_+0"] == pytest.approx(2 / 3)
    assert hist["timeshift_offset_+2"] == pytest.approx(1 / 3)
    assert hist["timeshift_offset_other"] == 0.0
