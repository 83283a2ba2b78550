"""Static token-id tables derived from a Tokenizer, used by the jitted
decode loop (all plain numpy; baked into the compiled program as constants).

(reference: osuT5/osuT5/inference/logit_processors.py:13-33 token groups,
server.py:28-36 get_eos_token_id)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..events import ContextType, EventType, TIMED_EVENTS

MILISECONDS_PER_STEP = 10


@dataclasses.dataclass(frozen=True)
class TokenTables:
    vocab_size_out: int
    pad_id: int
    sos_id: int
    eos_id: int
    time_start: int
    time_end: int
    # token groups for conditional temperature (types_first grouping)
    beat_type_tokens: tuple  # BEAT/MEASURE/TIMING_POINT type ids
    mania_type_tokens: tuple  # CIRCLE/HOLD_NOTE/HOLD_NOTE_END type ids
    scroll_speed_tokens: tuple  # full SCROLL_SPEED range
    sos_ids: tuple  # sos + all context sos ids
    context_eos: dict  # ContextType -> id
    timed_token_mask: np.ndarray  # (V,) bool: type tokens of TIMED_EVENTS
    eos_prob_ids: tuple  # eos + all context eos (for lookback bias mass)

    def __hash__(self):  # usable as a static jit arg
        return hash((self.vocab_size_out, self.time_start, self.time_end,
                     self.beat_type_tokens, self.mania_type_tokens,
                     self.sos_ids))

    def __eq__(self, other):
        return isinstance(other, TokenTables) and hash(self) == hash(other)

    @classmethod
    def from_tokenizer(cls, tokenizer) -> "TokenTables":
        es, ee = tokenizer.event_start, tokenizer.event_end

        beat = [es[EventType.BEAT], es[EventType.MEASURE]]
        if EventType.TIMING_POINT in es:
            beat.append(es[EventType.TIMING_POINT])

        mania = ([es[EventType.CIRCLE], es[EventType.HOLD_NOTE],
                  es[EventType.HOLD_NOTE_END]]
                 if EventType.HOLD_NOTE_END in es else [])

        scroll = (tuple(range(es[EventType.SCROLL_SPEED], ee[EventType.SCROLL_SPEED]))
                  if EventType.SCROLL_SPEED in es else ())

        timed_mask = np.zeros(tokenizer.vocab_size_out, dtype=bool)
        for et in TIMED_EVENTS:
            if et in es:
                timed_mask[es[et]:ee[et]] = True

        return cls(
            vocab_size_out=tokenizer.vocab_size_out,
            pad_id=tokenizer.pad_id,
            sos_id=tokenizer.sos_id,
            eos_id=tokenizer.eos_id,
            time_start=es[EventType.TIME_SHIFT],
            time_end=ee[EventType.TIME_SHIFT],
            beat_type_tokens=tuple(beat),
            mania_type_tokens=tuple(mania),
            scroll_speed_tokens=scroll,
            sos_ids=tuple([tokenizer.sos_id] + list(tokenizer.context_sos.values())),
            context_eos=dict(tokenizer.context_eos),
            timed_token_mask=timed_mask,
            eos_prob_ids=tuple([tokenizer.eos_id] + list(tokenizer.context_eos.values())),
        )

    def eos_token_mask(self, lookback_time: float = 0.0, lookahead_time: float = 0.0,
                       context_type: ContextType | None = None) -> np.ndarray:
        """(V,) bool mask of ids that terminate generation: EOS, the window's
        context EOS, and boundary timeshift ranges that act as EOS when a
        lookback/lookahead margin is configured (server.py:28-36)."""
        mask = np.zeros(self.vocab_size_out, dtype=bool)
        mask[self.eos_id] = True
        if context_type is not None and context_type in self.context_eos:
            mask[self.context_eos[context_type]] = True
        if lookback_time > 0:
            n = int(lookback_time / MILISECONDS_PER_STEP)
            mask[self.time_start:self.time_start + n] = True
        if lookahead_time > 0:
            n = int(lookahead_time / MILISECONDS_PER_STEP)
            mask[self.time_end - n:self.time_end] = True
        return mask
