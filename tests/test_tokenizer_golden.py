"""Tokenizer vocab-layout parity against the ACTUAL reference tokenizer.

Constructs the reference `osuT5.osuT5.tokenizer.Tokenizer` (read-only import
of public reference code, heavy deps stubbed) and ours from the same config +
metadata, then diffs the complete id layout: special tokens, per-context
SOS/EOS, every EventType's id block, input-only vocab, and the typed
encoders. This systematically pins bit-compatibility instead of hand-written
spot cases (reference: osuT5/osuT5/tokenizer.py:21).
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REFERENCE = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REFERENCE.is_dir(),
                                reason="reference tree not mounted")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)


@pytest.fixture(scope="module")
def ref_tokenizer_cls():
    sys.path.insert(0, str(REFERENCE))

    class ConfigStore:
        @staticmethod
        def instance():
            class _I:
                def store(self, *a, **k):
                    pass
            return _I()

    class OmegaConf:
        @staticmethod
        def register_new_resolver(*a, **k):
            pass

    _stub("hydra")
    _stub("hydra.core")
    _stub("hydra.core.config_store", ConfigStore=ConfigStore)
    _stub("omegaconf", OmegaConf=OmegaConf, MISSING="???")
    _stub("pydub", AudioSegment=object)
    slider_attrs = {n: type(n, (), {}) for n in (
        "Beatmap", "Circle", "Slider", "Spinner", "HoldNote", "TimingPoint",
        "Position", "Curve", "Linear", "Catmull", "Perfect", "MultiBezier")}
    _stub("slider", **slider_attrs)
    _stub("slider.beatmap", **slider_attrs)
    _stub("slider.curve", **slider_attrs)
    _stub("slider.mod", **slider_attrs)
    _stub("slider.timing", **slider_attrs)
    from osuT5.osuT5.tokenizer import Tokenizer as RefTokenizer
    return RefTokenizer


def _write_metadata(path: Path) -> None:
    rows = []
    for i in range(6):
        rows.append({
            "BeatmapSetId": 100 + i // 2,
            "Id": 1000 + i,
            "ModeInt": 0,
            "RankedDate": pd.Timestamp(2015 + i, 3, 1),
            "DifficultyRating": 2.0 + i * 0.7,
            "UserId": 50 + (i % 3),
            "OmdbTags": np.array(["jump", "stream"] if i % 2 else ["tech"]),
        })
    (path / "data").mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_parquet(path / "metadata.parquet")


def _ns(**kw):
    return types.SimpleNamespace(**kw)


_DATA_FIELDS = [
    # every args.data.* the reference tokenizer reads (grep of tokenizer.py)
    "add_cs_token", "add_descriptors", "add_diff_token", "add_distances",
    "add_gamemode_token", "add_global_sv_token", "add_hitsounded_token",
    "add_hold_note_ratio_token", "add_keycount_token", "add_kiai",
    "add_kiai_special_token", "add_mapper_token", "add_out_context_types",
    "add_positions", "add_pre_tokens", "add_pre_tokens_at_step",
    "add_scroll_speed_ratio_token", "add_song_length_token",
    "add_song_position_token", "add_style_token", "add_timing_points",
    "add_year_token", "dataset_type", "gamemodes", "max_diff",
    "max_difficulty", "max_year", "min_difficulty", "min_year", "num_classes",
    "num_cs_classes", "num_diff_classes", "position_precision",
    "position_range", "position_split_axes", "src_seq_len",
]


def _ref_args_from_cfg(cfg, dataset_path: Path):
    data_kw = {}
    for f in _DATA_FIELDS:
        if hasattr(cfg.data, f):
            data_kw[f] = getattr(cfg.data, f)
    data_kw["context_types"] = [
        {"in": list(c["in"]), "out": list(c["out"])} if not isinstance(c, str)
        else c for c in cfg.data.context_types]
    data_kw.update(train_dataset_path=str(dataset_path),
                   train_dataset_start=0, train_dataset_end=3,
                   dataset_type="mmrs")
    spec = cfg.model.spectrogram
    return _ns(data=_ns(**data_kw),
               model=_ns(spectrogram=_ns(hop_length=spec.hop_length,
                                         sample_rate=spec.sample_rate),
                         do_style_embed=getattr(cfg.model, "do_style_embed", False),
                         do_mapper_embed=getattr(cfg.model, "do_mapper_embed", False)))


@pytest.fixture(scope="module")
def pair(ref_tokenizer_cls, tmp_path_factory):
    from beatheritage_tpu.config import TrainConfig, load_config
    from beatheritage_tpu.data.dataset import load_mmrs_metadata
    from beatheritage_tpu.tokenizer import Tokenizer

    dataset = tmp_path_factory.mktemp("mmrs")
    _write_metadata(dataset)

    cfg = load_config(TrainConfig, "train", "tiny", overrides=[
        f"data.train_dataset_path={dataset}",
        "data.train_dataset_start=0", "data.train_dataset_end=3",
        # turn on the ranges tiny leaves off so the whole surface is compared
        "data.add_style_token=true", "data.add_mapper_token=true"])
    ours = Tokenizer(cfg)
    ours.load_dataset_indices(load_mmrs_metadata(str(dataset)))

    ref = ref_tokenizer_cls(_ref_args_from_cfg(cfg, dataset))
    return ours, ref


def test_vocab_sizes_match(pair):
    ours, ref = pair
    assert ours.vocab_size_out == ref.vocab_size_out
    assert ours.vocab_size_in == ref.vocab_size_in


def test_special_and_context_ids_match(pair):
    ours, ref = pair
    assert (ours.pad_id, ours.sos_id, ours.eos_id) == (
        ref.pad_id, ref.sos_id, ref.eos_id)
    assert ({k.value: v for k, v in ours.context_sos.items()}
            == {k.value: v for k, v in ref.context_sos.items()})
    assert ({k.value: v for k, v in ours.context_eos.items()}
            == {k.value: v for k, v in ref.context_eos.items()})


def test_every_event_type_block_matches(pair):
    """The full id layout: each EventType's [start, end) must be identical."""
    ours, ref = pair
    ours_layout = {k.value: (ours.event_start[k], ours.event_end[k])
                   for k in ours.event_start}
    ref_layout = {k.value: (ref.event_start[k], ref.event_end[k])
                  for k in ref.event_start}
    assert ours_layout == ref_layout


def test_event_range_min_values_match(pair):
    """Same block + same min_value pins encode() bijectively per type."""
    ours, ref = pair
    ours_ranges = {r.type.value: (r.min_value, r.max_value)
                   for r in list(ours.event_ranges) + list(ours.input_event_ranges)}
    ref_ranges = {r.type.value: (r.min_value, r.max_value)
                  for r in list(ref.event_ranges) + list(ref.input_event_ranges)}
    assert ours_ranges == ref_ranges


def test_typed_encoders_match(pair):
    ours, ref = pair
    checks = [
        ("gamemode", lambda t: [t.encode_gamemode(g) for g in (0, 1, 2, 3)]),
        ("diff", lambda t: [t.encode_diff(d) for d in (0.0, 3.7, 9.9)]),
        ("diff_unk", lambda t: t.diff_unk),
        ("style_idx", lambda t: t.encode_style_idx(2)),
        ("style_unk", lambda t: t.style_unk),
        ("mapper", lambda t: t.encode_mapper(1001)),
        ("mapper_id", lambda t: t.encode_mapper_id(51)),
        ("mapper_unk", lambda t: t.mapper_unk),
        ("cs", lambda t: [t.encode_cs(c) for c in (0.0, 4.2, 10.0)]),
        ("cs_unk", lambda t: t.cs_unk),
        ("descriptor", lambda t: t.encode_descriptor(1001)),
        ("descriptor_name", lambda t: t.encode_descriptor_name("jump")),
        ("descriptor_unk", lambda t: t.descriptor_unk),
        ("year", lambda t: [t.encode_year(y) for y in (2010, 2023)]),
        ("year_unk", lambda t: t.year_unk),
        ("hold_note_ratio", lambda t: [t.encode_hold_note_ratio(r)
                                       for r in (None, 0.0, 0.37, 1.0)]),
        ("scroll_speed_ratio", lambda t: [t.encode_scroll_speed_ratio(r)
                                          for r in (None, 0.0, 0.63, 1.0)]),
        ("song_length", lambda t: [t.encode_song_length(v)
                                   for v in (0.0, 183_456.0, 900_000.0)]),
        ("song_position", lambda t: [t.encode_song_position(p, 183_456.0)
                                     for p in (0.0, 42_000.0, 183_456.0)]),
        ("global_sv", lambda t: [t.encode_global_sv(v)
                                 for v in (0.3, 1.4, 3.9)]),
    ]
    for name, fn in checks:
        try:
            expect = fn(ref)
        except (ValueError, KeyError):
            # range absent under this config — ours must reject it too
            with pytest.raises((ValueError, KeyError)):
                fn(ours)
            continue
        assert fn(ours) == expect, f"typed encoder mismatch: {name}"


def test_event_wrappers_match(pair):
    """The Event-returning encoder variants mirror the reference surface."""
    ours, ref = pair
    for name, args in [("encode_diff_event", (4.2,)),
                       ("encode_style_event", (1001,)),
                       ("encode_mapper_event", (1001,)),
                       ("encode_cs_event", (4.2,)),
                       ("encode_song_length_event", (183_456.0,)),
                       ("encode_song_position_event", (42_000.0, 183_456.0))]:
        a = getattr(ours, name)(*args)   # Event construction never needs the
        b = getattr(ref, name)(*args)    # range to exist, unlike encode()
        assert (a.type.value, a.value) == (b.type.value, b.value), name
    a_list = ours.encode_descriptor_events(1001)
    b_list = ref.encode_descriptor_events(1001)
    assert [(e.type.value, e.value) for e in a_list] == \
        [(e.type.value, e.value) for e in b_list]
