"""Every versioned config in the zoo must compose and structure cleanly.

The reference ships 126 YAMLs spanning v1..v31 + BeatHeritage-V1 (reference:
configs/train/v29.yaml etc., configs/legacy/, web-ui.py:146-549 model
dropdown); this repo transcribes all of them
(scripts/import_reference_configs.py). These tests pin that the whole model
zoo stays loadable.
"""

from pathlib import Path

import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.config.schema import InferenceConfig

CONFIGS = Path(__file__).resolve().parent.parent / "beatheritage_tpu" / "configs"

TRAIN_NAMES = sorted(p.stem for p in (CONFIGS / "train").glob("*.yaml")
                     if p.stem != "default")
INFER_NAMES = sorted(p.stem for p in (CONFIGS / "inference").glob("*.yaml")
                     if p.stem != "default")
LEGACY_NAMES = sorted(p.stem for p in (CONFIGS / "legacy").glob("*.yaml"))

# the versions the reference web UI offers in its model dropdown
WEBUI_VERSIONS = ["v28", "v29", "v30", "v31", "beatheritage_v1"]


@pytest.mark.parametrize("name", TRAIN_NAMES)
def test_train_config_loads(name):
    cfg = load_config(TrainConfig, "train", name)
    assert cfg.model.arch.d_model > 0
    assert cfg.data.tgt_seq_len > 0


@pytest.mark.parametrize("name", INFER_NAMES)
def test_inference_config_loads(name):
    cfg = load_config(InferenceConfig, "inference", name)
    assert cfg.train.model.arch.d_model > 0


@pytest.mark.parametrize("name", LEGACY_NAMES)
def test_legacy_config_loads(name):
    schema = TrainConfig if name.startswith("train") else InferenceConfig
    load_config(schema, "legacy", name)


@pytest.mark.parametrize("name", WEBUI_VERSIONS)
def test_webui_versions_resolve_model_dims(name):
    """Each dropdown version must fully resolve tokenizer + dims
    (reference web-ui.py model dropdown; inference composes the exact train
    config of the target model, configs/inference/v30.yaml:1-5)."""
    from beatheritage_tpu.models import ModelDims
    from beatheritage_tpu.tokenizer import Tokenizer

    cfg = load_config(InferenceConfig, "inference", name)
    tok = Tokenizer(cfg.train)
    dims = ModelDims.from_config(cfg.train, tok)
    assert dims.vocab_size_out > 100
    assert dims.d_model in (384, 512, 768, 1024)


def test_backbone_families_cover_the_zoo():
    """model.name in every versioned config maps to a convertible backbone
    family (train/convert.py::backbone_from_name semantics, adapted to our
    shortened names)."""
    families = set()
    for name in ["v19", "v20", "v27", "v29", "v30"]:
        cfg = load_config(TrainConfig, "train", name)
        model_name = cfg.model.name
        assert any(model_name.startswith(p) for p in
                   ("whisper", "ropewhisper", "nwhisper", "t5")), model_name
        families.add(model_name.split("-")[0])
    assert families == {"whisper", "ropewhisper", "nwhisper"}


def test_beatheritage_v1_pins_reference_quality_controls():
    """The flagship preset carries the reference V1 QC/advanced set
    (reference configs/inference/beatheritage_v1.yaml:28-40)."""
    from beatheritage_tpu.config import InferenceConfig, load_config

    cfg = load_config(InferenceConfig, "inference", "beatheritage_v1")
    assert cfg.temperature == 0.85 and cfg.top_k == 50
    assert cfg.repetition_penalty == 1.1
    qc = cfg.quality_control
    assert qc.min_distance_threshold == 20
    assert qc.max_overlap_ratio == 0.15
    assert qc.enable_auto_correction and qc.enable_flow_optimization
    adv = cfg.advanced_features
    assert adv.enable_pattern_variety and adv.enable_style_preservation
    assert adv.enable_context_aware_generation and adv.enable_difficulty_scaling
