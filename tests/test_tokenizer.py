"""Tokenizer vocab-layout and round-trip tests."""

import pytest

from beatheritage_tpu.config import TrainConfig, load_config
from beatheritage_tpu.events import ContextType, Event, EventType
from beatheritage_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def tiny_cfg():
    return load_config(TrainConfig, "train", "tiny")


@pytest.fixture(scope="module")
def tok(tiny_cfg):
    return Tokenizer(tiny_cfg)


def test_special_ids(tok):
    assert tok.pad_id == 0 and tok.sos_id == 1 and tok.eos_id == 2


def test_context_sos_eos_allocation(tok):
    # tiny config declares in: none, out: timing/kiai/map/sv with
    # add_out_context_types -> ids allocated in declaration order from 3
    assert tok.context_sos[ContextType.NONE] == 3
    assert tok.context_eos[ContextType.NONE] == 4
    assert tok.context_sos[ContextType.TIMING] == 5
    assert tok.context_eos[ContextType.TIMING] == 6
    assert tok.context_sos[ContextType.KIAI] == 7
    assert tok.context_sos[ContextType.MAP] == 9
    assert tok.context_sos[ContextType.SV] == 11
    assert tok.offset == 13


def test_time_shift_range_derives_from_src_seq_len(tok, tiny_cfg):
    # (128-1) * 128 * 1000 / 16000 / 10 = 101.6 -> 101
    er = tok.event_range[EventType.TIME_SHIFT]
    assert er.min_value == 0
    assert er.max_value == 101


def test_encode_decode_roundtrip_all_ranges(tok):
    for er in tok.event_ranges + tok.input_event_ranges:
        for value in {er.min_value, 0 if er.min_value <= 0 <= er.max_value else er.min_value, er.max_value}:
            event = Event(er.type, value)
            assert tok.decode(tok.encode(event)) == event


def test_vocab_is_contiguous_and_sized(tok):
    # every id in [offset, vocab_size_in) decodes to exactly one event
    for tid in range(tok.offset, tok.vocab_size_in):
        tok.decode(tid)
    with pytest.raises(ValueError):
        tok.decode(tok.vocab_size_in)
    assert tok.vocab_size_out < tok.vocab_size_in


def test_output_ranges_before_input_ranges(tok):
    max_out_end = max(tok.event_end[er.type] for er in tok.event_ranges)
    min_in_start = min(tok.event_start[er.type] for er in tok.input_event_ranges)
    assert max_out_end == tok.vocab_size_out
    assert min_in_start >= tok.vocab_size_out


def test_typed_encoders(tok):
    assert tok.decode(tok.encode_gamemode(3)) == Event(EventType.GAMEMODE, 3)
    # difficulty 6.0 with 24 classes over max 12 -> class 12
    assert tok.decode(tok.encode_diff(6.0)) == Event(EventType.DIFFICULTY, 12)
    assert tok.decode_diff(tok.encode_diff(6.0)) == pytest.approx(6.0)
    assert tok.decode(tok.diff_unk).value == tok.num_diff_classes
    assert tok.decode(tok.encode_year(2023)) == Event(EventType.YEAR, 2023)
    assert tok.decode(tok.year_unk) == Event(EventType.YEAR, 2077)
    # ratio sentinel semantics
    assert tok.decode(tok.encode_hold_note_ratio(0.0)).value == -1
    assert tok.decode(tok.encode_hold_note_ratio(1.0)).value == 11
    assert tok.decode(tok.encode_hold_note_ratio(0.5)).value == 5
    assert tok.decode(tok.encode_hold_note_ratio(None)).value == 12
    assert tok.decode(tok.encode_song_length(125000)) == Event(EventType.SONG_LENGTH, 12)
    assert tok.decode(tok.encode_song_position(50000, 100000)).value == 50
    assert tok.decode(tok.encode_global_sv(1.4)).value == 140


def test_event_type_range(tok):
    lo, hi = tok.event_type_range(EventType.TIME_SHIFT)
    assert tok.decode(lo) == Event(EventType.TIME_SHIFT, 0)
    assert tok.decode(hi) == Event(EventType.TIME_SHIFT, 101)


def test_state_dict_roundtrip(tok, tmp_path):
    tok.save_pretrained(tmp_path)
    tok2 = Tokenizer.from_pretrained(tmp_path)
    assert tok2.vocab_size_in == tok.vocab_size_in
    assert tok2.vocab_size_out == tok.vocab_size_out
    assert tok2.offset == tok.offset
    assert tok2.event_start == tok.event_start
    assert tok2.event_end == tok.event_end
    assert tok2.context_sos == tok.context_sos
    for tid in range(tok.offset, tok.vocab_size_in):
        assert tok2.decode(tid) == tok.decode(tid)


def test_default_tokenizer_no_args():
    tok = Tokenizer()
    assert tok.decode(tok.encode(Event(EventType.TIME_SHIFT, -512))).value == -512
    assert tok.vocab_size_out == tok.vocab_size_in  # no input-only ranges
