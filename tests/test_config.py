"""Config composition + override grammar tests."""

import pytest

from beatheritage_tpu.config import (
    InferenceConfig,
    TrainConfig,
    load_config,
)
from beatheritage_tpu.events import ContextType


def test_compose_tiny_train():
    cfg = load_config(TrainConfig, "train", "tiny")
    assert cfg.model.arch.d_model == 64
    assert cfg.data.src_seq_len == 128
    assert cfg.optim.name == "adamw"
    assert cfg.data.types_first is True


def test_defaults_chain_beatheritage_v1():
    cfg = load_config(TrainConfig, "train", "beatheritage_v1")
    # from v31
    assert cfg.data.tgt_seq_len == 8192
    assert cfg.data.gamemodes == [0, 1, 2, 3]
    # overridden by beatheritage_v1
    assert cfg.data.position_precision == 5
    assert cfg.optim.base_lr == pytest.approx(3e-3)
    assert cfg.optim.total_steps == 80000
    # from model config
    assert cfg.model.arch.d_model == 768
    assert cfg.model.spectrogram.n_mels == 80


def test_cross_group_compose_inference():
    cfg = load_config(InferenceConfig, "inference", "beatheritage_v1")
    assert cfg.temperature == pytest.approx(0.85)
    assert cfg.top_k == 50
    assert cfg.train.data.position_precision == 5
    assert cfg.diffusion.model.model == "DiT-B"
    assert cfg.output_type == [ContextType.MAP]
    assert cfg.timesteps[0] == 10


def test_cli_overrides():
    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        "optim.base_lr=5e-4",
        "data.src_seq_len=256",
        "model.arch.num_heads=8",
        "data.gamemodes=[0,3]",
    ])
    assert cfg.optim.base_lr == pytest.approx(5e-4)
    assert cfg.data.src_seq_len == 256
    assert cfg.model.arch.num_heads == 8
    assert cfg.data.gamemodes == [0, 3]


def test_inference_overrides_public_surface():
    cfg = load_config(InferenceConfig, "inference", "tiny", overrides=[
        "gamemode=3", "difficulty=5.5", "mapper_id=12345",
        "descriptors=[jump aim,stream]", "cfg_scale=1.5",
        "in_context=[timing]", "super_timing=true",
    ])
    assert cfg.gamemode == 3
    assert cfg.difficulty == 5.5
    assert cfg.mapper_id == 12345
    assert cfg.descriptors == ["jump aim", "stream"]
    assert cfg.cfg_scale == 1.5
    assert cfg.in_context == [ContextType.TIMING]
    assert cfg.super_timing is True


def test_unknown_config_raises():
    with pytest.raises(FileNotFoundError):
        load_config(TrainConfig, "train", "nonexistent_config")
