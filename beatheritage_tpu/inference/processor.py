"""Windowed seamless generation engine (host orchestration).

Re-design of the reference Processor (reference:
osuT5/osuT5/inference/processor.py:74) around the jitted decode engine:

- per-window prompt assembly from in/out contexts + class (conditioning)
  tokens + special tokens + SOS (get_prompt semantics, processor.py:1116)
- sequential mode feeds prior windows' decoded tokens as decoder prefill
  with 90% window overlap; boundary time tokens act as EOS and get trimmed
  (processor.py:308, 993)
- parallel mode batches whole windows through the engine at once
  (processor.py:366)
- teacher-forced surprisal pass for MaiMod (processor.py:416)

Device work happens in exactly two jitted programs per window batch: the
encoder (audio -> hidden states) and the decode loop. Prompt lengths are
bucketed to powers of two to bound recompilation.
"""

from __future__ import annotations

import dataclasses
import functools
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.event_utils import (
    get_hitsounded_status,
    get_hold_note_ratio,
    get_scroll_speed_ratio,
    remove_events_of_type,
    update_event_times,
)
from ..data.parser import BeatmapParser
from ..decode.engine import SamplerSettings, generate as engine_generate
from ..decode.tables import TokenTables
from ..events import ContextType, Event, EventType
from ..models.transformer import ModelDims, encode as model_encode
from ..osu.beatmap import Beatmap
from ..tokenizer import Tokenizer

MILISECONDS_PER_SECOND = 1000
MILISECONDS_PER_STEP = 10


@dataclasses.dataclass
class GenerationConfig:
    """Per-run conditioning. Field names/defaults are behavior-pinned to the
    reference's public config surface (reference processor.py:26
    GenerationConfig) — they ARE the CLI/API contract being matched."""

    gamemode: int = 0
    beatmap_id: Optional[int] = None
    difficulty: Optional[float] = None
    mapper_id: Optional[int] = None
    year: Optional[int] = None
    hitsounded: bool = True
    hp_drain_rate: Optional[float] = None
    circle_size: Optional[float] = None
    overall_difficulty: Optional[float] = None
    approach_rate: Optional[float] = None
    slider_multiplier: float = 1.4
    slider_tick_rate: Optional[float] = None
    keycount: int = 4
    hold_note_ratio: Optional[float] = None
    scroll_speed_ratio: Optional[float] = None
    descriptors: Optional[list] = None
    negative_descriptors: Optional[list] = None


def generation_config_from_beatmap(beatmap: Beatmap, tokenizer: Tokenizer) -> GenerationConfig:
    gamemode = int(beatmap.mode)
    return GenerationConfig(
        gamemode=gamemode,
        beatmap_id=beatmap.beatmap_id,
        difficulty=None,  # no star-rating calculator; callers may override
        mapper_id=tokenizer.beatmap_mapper.get(beatmap.beatmap_id, None),
        hp_drain_rate=beatmap.hp_drain_rate,
        circle_size=beatmap.circle_size,
        overall_difficulty=beatmap.overall_difficulty,
        approach_rate=beatmap.approach_rate,
        slider_multiplier=beatmap.slider_multiplier,
        slider_tick_rate=beatmap.slider_tick_rate,
        hitsounded=get_hitsounded_status(beatmap),
        keycount=int(beatmap.circle_size) if gamemode == 3 else 4,
        hold_note_ratio=get_hold_note_ratio(beatmap) if gamemode == 3 else None,
        scroll_speed_ratio=get_scroll_speed_ratio(beatmap) if gamemode in (1, 3) else None,
        descriptors=[tokenizer.descriptor_name(i)
                     for i in tokenizer.beatmap_descriptors.get(beatmap.beatmap_id, [])]
        if beatmap.beatmap_id in tokenizer.beatmap_descriptors else None,
    )


_WARMUP_DONE: set = set()  # process-level Processor.warmup dedupe

# (train_cfg, dims, dtype) -> shared jitted encoder. Keys hold a strong
# reference to the cfg object (id() alone could be recycled after gc).
_ENCODE_JIT_MEMO: dict = {}


def _get_encode_jit(train_cfg, dims, dtype):
    key = (id(train_cfg), dims, str(dtype))
    hit = _ENCODE_JIT_MEMO.get(key)
    if hit is not None and hit[0] is train_cfg:
        return hit[1]
    fn = jax.jit(functools.partial(model_encode, dims=dims, cfg=train_cfg,
                                   dtype=dtype))
    _ENCODE_JIT_MEMO[key] = (train_cfg, fn)
    return fn


def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _bucket_windows(b: int) -> int:
    """Window-batch bucket: 1, 2, 4, then multiples of 4.

    The encoder and decode programs specialize on the window count, so every
    previously-unseen song length used to pay a fresh compile (~15 s per new
    song through the remote-compile tunnel). Padding the batch to a few
    bucket sizes makes all songs share a handful of programs; padded rows
    duplicate row 0 (same EOS timing, so they never extend the decode) and
    are dropped before returning."""
    if b <= 1:
        return 1
    if b <= 2:
        return 2
    return -(-b // 4) * 4


class Processor:
    def __init__(self, args, params, tokenizer: Tokenizer,
                 cfg_scale: Optional[float] = None, verbose: bool = True,
                 client=None):
        """args is an InferenceConfig; params the model pytree; `client` is
        an optional InferenceClient that routes engine calls to the warm IPC
        server instead of running them in-process (reference server.py)."""
        self.args = args
        self.params = params
        self.tokenizer = tokenizer
        self.verbose = verbose
        self.client = client
        d = args.train.data

        self.dims = ModelDims.from_config(args.train, tokenizer)
        self.tables = TokenTables.from_tokenizer(tokenizer)
        self.dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

        # multi-chip inference: shard the window batch over the data axis
        # (SURVEY §5 long-context plan: pure DP over windows in parallel
        # mode; XLA SPMD propagates the batch sharding through the fused
        # decode program, gradients-free so no collectives beyond layout)
        self.mesh = None
        self._params_replicated = False
        if getattr(args, "data_parallel_windows", False):
            import jax as _jax  # noqa: PLC0415
            n = len(_jax.devices())
            if n > 1:
                from ..parallel import build_mesh  # noqa: PLC0415
                self.mesh = build_mesh(data=n, model=1)

        self.tgt_seq_len = d.tgt_seq_len
        # optional decode-program length cap (set by the super-timing
        # generator, timer_max_len): timing-only decodes emit <=~100 tokens,
        # so a tgt_seq_len-sized KV cache pays ~8x the HBM traffic per beam
        # reorder step — and fixed_prompt_pad a tgt/2 prefill — for nothing
        self.max_len_override: Optional[int] = None
        self.frame_seq_len = d.src_seq_len - 1
        self.frame_size = args.train.model.spectrogram.hop_length
        self.sample_rate = args.train.model.spectrogram.sample_rate
        self.samples_per_sequence = self.frame_seq_len * self.frame_size
        self.miliseconds_per_sequence = (self.samples_per_sequence
                                         * MILISECONDS_PER_SECOND / self.sample_rate)
        self.lookback_time = args.lookback * self.miliseconds_per_sequence
        self.lookahead_max_time = (1 - args.lookahead) * self.miliseconds_per_sequence
        self.lookahead_time = args.lookahead * self.miliseconds_per_sequence
        self.eos_time = (1 - d.lookahead) * self.miliseconds_per_sequence
        self.center_pad_decoder = d.center_pad_decoder

        for name in ("add_out_context_types", "add_gamemode_token", "add_style_token",
                     "add_diff_token", "add_mapper_token", "add_year_token",
                     "add_hitsounded_token", "add_song_length_token",
                     "add_global_sv_token", "add_cs_token", "add_keycount_token",
                     "add_hold_note_ratio_token", "add_scroll_speed_ratio_token",
                     "add_descriptors", "add_sv_special_token",
                     "add_kiai_special_token", "add_song_position_token",
                     "add_kiai", "max_pre_token_len", "add_pre_tokens",
                     "add_gd_context", "add_timing", "add_positions", "add_sv",
                     "add_mania_sv", "types_first"):
            setattr(self, name, getattr(d, name))

        self.parser = BeatmapParser(args.train, tokenizer)
        m = args.train.model
        self.do_style_embed = m.do_style_embed
        self.do_difficulty_embed = m.do_difficulty_embed
        self.do_mapper_embed = m.do_mapper_embed
        self.do_song_position_embed = m.do_song_position_embed
        self.context_types = [
            {k: [ContextType(t) if isinstance(t, str) else t for t in v]
             for k, v in ct.items()}
            for ct in d.context_types]
        self.add_to_beatmap = args.add_to_beatmap
        self.start_time = args.start_time
        self.end_time = args.end_time

        if self.add_positions:
            self.position_precision = d.position_precision
            x_min, x_max, y_min, y_max = d.position_range
            self.x_min = x_min // self.position_precision
            self.x_max = x_max // self.position_precision
            self.y_min = y_min // self.position_precision
            self.y_max = y_max // self.position_precision
            self.x_count = self.x_max - self.x_min + 1

        self.cfg_scale = cfg_scale if cfg_scale is not None else args.cfg_scale
        self.parallel = args.parallel
        self.max_batch_size = args.max_batch_size
        self.num_beams = args.num_beams
        self.fixed_prompt_pad = getattr(args, "fixed_prompt_pad", True)
        self.settings_base = dict(
            temperature=args.temperature,
            timing_temperature=args.timing_temperature,
            mania_column_temperature=args.mania_column_temperature,
            taiko_hit_temperature=args.taiko_hit_temperature,
            top_p=args.top_p, top_k=args.top_k,
            repetition_penalty=args.repetition_penalty,
            timeshift_bias=args.timeshift_bias,
            cfg_scale=self.cfg_scale,
            types_first=self.types_first,
            do_sample=args.do_sample,
        )

        seed = args.seed if args.seed is not None else 0
        self._key = jax.random.PRNGKey(seed)

        # the jitted encoder is shared ACROSS Processor instances: the
        # pipeline builds a fresh Processor per song, and a per-instance
        # jax.jit wrapper would re-trace (and possibly recompile) the
        # encoder for every song
        self._encode_jit = _get_encode_jit(args.train, self.dims, self.dtype)

    # -- device helpers ------------------------------------------------------

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _encode_kwargs(self, b: int, cond: dict) -> dict:
        kwargs = {}
        if self.do_style_embed:
            kwargs["beatmap_idx"] = jnp.asarray(cond.get(
                "beatmap_idx", np.full(b, self.dims.num_classes)), jnp.int32)
        if self.do_difficulty_embed:
            kwargs["difficulty"] = jnp.asarray(cond.get(
                "difficulty", np.full(b, 5.0)), jnp.float32)
        if self.do_mapper_embed:
            kwargs["mapper_idx"] = jnp.asarray(cond.get(
                "mapper_idx", np.full(b, -1)), jnp.int32)
        if self.do_song_position_embed:
            kwargs["song_position"] = jnp.asarray(cond.get(
                "song_position", np.zeros((b, 2))), jnp.float32)
        return kwargs

    def _aot_dir(self) -> str:
        aot_dir = getattr(self.args, "aot_cache_dir", "") or ""
        if aot_dir == "auto":
            from ..decode.aot import default_cache_dir  # noqa: PLC0415
            aot_dir = default_cache_dir()
        return aot_dir

    def encode_audio(self, frames: np.ndarray, cond: dict) -> jnp.ndarray:
        """Run the jitted encoder over a batch of audio windows (through the
        AOT executable cache: later processes skip the encoder compile)."""
        kwargs = self._encode_kwargs(frames.shape[0], cond)
        from ..decode.aot import aot_call  # noqa: PLC0415
        return aot_call(self._encode_jit, self._aot_dir(), self.params,
                        audio=jnp.asarray(frames), **kwargs)

    def warmup(self, max_windows: Optional[int] = None) -> dict:
        """Precompile (or load from the AOT executable cache) the decode
        program for every window-batch bucket up to `max_windows`.

        The decode program specializes on the (bucketed) window count, so
        each previously-unseen song length pays one fresh compile — ~15 s
        through the remote-compile tunnel (docs/ROUND_NOTES round 3). This
        front-loads all of them at server start: for each bucket the engine
        program is lowered with shape-only placeholders and compiled (or
        loaded from the cross-process AOT cache) WITHOUT executing, for both
        lookback settings a song can hit. Returns {(kind, batch): status}
        with status in "loaded"/"compiled"/"bypass".

        No-op under a mesh: sharded programs bake input placements that
        shape-only warming cannot reproduce.
        """
        from ..decode.aot import warm_cache  # noqa: PLC0415

        if self.mesh is not None:
            return {}
        aot_dir = self._aot_dir()
        max_windows = int(max_windows or self.max_batch_size or 16)
        max_len = int(self.max_len_override or self.tgt_seq_len)
        # pipeline.generate builds a fresh Processor per song, so warmup runs
        # per call — dedupe at process level (compilation state is process-
        # global too; param VALUES don't affect program identity)
        done_key = (aot_dir, max_windows, self.samples_per_sequence,
                    max_len, self.cfg_scale > 1, str(self.dtype),
                    repr(sorted(self.settings_base.items())),
                    self.num_beams, getattr(self.args, "speculative_k", 0),
                    getattr(self.args, "decode_unroll_layers", False),
                    getattr(self.args, "decode_kv_quant", False))
        if done_key in _WARMUP_DONE:
            return {}
        buckets, b = [], 1
        while True:
            bb = _bucket_windows(b)
            if bb not in buckets:
                buckets.append(bb)
            if bb >= max_windows:
                break
            b = bb + 1

        # fixed prompt-pad bucket (mirrors _run_engine exactly)
        p = min(_bucket(2), max_len)
        if self.fixed_prompt_pad:
            p = max(p, max_len // 2)
        p = max(min(p, max_len - 64), 16)
        cfg_on = self.cfg_scale > 1

        report = {}
        for bb in buckets:
            frames = jax.ShapeDtypeStruct(
                (bb, self.samples_per_sequence), jnp.float32)
            enc_kwargs = self._encode_kwargs(bb, {})
            report[("encode", bb)] = warm_cache(
                self._encode_jit, aot_dir, self.params, audio=frames,
                **enc_kwargs)
            enc_struct = jax.eval_shape(
                functools.partial(self._encode_jit, self.params,
                                  **enc_kwargs), audio=frames)
            bm = 2 * bb if cfg_on else bb
            enc_hidden = jax.ShapeDtypeStruct(
                (bm,) + tuple(enc_struct.shape[1:]), enc_struct.dtype)
            prompt = jax.ShapeDtypeStruct((bm, p), jnp.int32)
            mask = jax.ShapeDtypeStruct((bm, p), jnp.bool_)
            eos_mask = jnp.zeros(self.tables.vocab_size_out, dtype=bool)
            lookback_mask = jnp.zeros(self.tables.vocab_size_out, dtype=bool)
            kv_quant = getattr(self.args, "decode_kv_quant", False)
            for use_lookback in (False, True):
                settings = SamplerSettings(
                    use_lookback=use_lookback,
                    **{**self.settings_base,
                       "cfg_scale": self.cfg_scale if cfg_on else 1.0})
                # mirror _run_engine's engine selection so warming follows
                # the instance's actual configuration (e.g. the super-timing
                # generator flips num_beams/do_sample after construction)
                if self.num_beams > 1 and not settings.do_sample and not cfg_on:
                    from ..decode.engine import beam_generate  # noqa: PLC0415
                    report[("beam", bb, use_lookback)] = warm_cache(
                        beam_generate, aot_dir,
                        self.params, self.dims, settings, self.tables,
                        enc_hidden, prompt, mask, eos_mask,
                        max_len=max_len,
                        num_beams=self.num_beams, dtype=self.dtype,
                        kv_quant=kv_quant)
                elif getattr(self.args, "speculative_k", 0) > 0:
                    from ..decode.speculative import generate_speculative  # noqa: PLC0415
                    report[("speculative", bb, use_lookback)] = warm_cache(
                        generate_speculative, aot_dir,
                        self.params, self.dims, settings, self.tables,
                        enc_hidden, prompt, mask, eos_mask, self._next_key(),
                        max_len=max_len,
                        draft_k=int(self.args.speculative_k),
                        dtype=self.dtype, lookback_mask=lookback_mask)
                else:
                    report[("decode", bb, use_lookback)] = warm_cache(
                        engine_generate, aot_dir,
                        self.params, self.dims, settings, self.tables,
                        enc_hidden, prompt, mask, eos_mask, self._next_key(),
                        max_len=max_len, dtype=self.dtype,
                        lookback_mask=lookback_mask,
                        unroll_layers=getattr(self.args,
                                              "decode_unroll_layers", False),
                        kv_quant=kv_quant)
        _WARMUP_DONE.add(done_key)
        if self.verbose:
            n_new = sum(1 for v in report.values() if v == "compiled")
            print(f"warmup: {len(report)} encode/decode programs ready "
                  f"({n_new} freshly compiled) for window buckets {buckets}")
        return report

    def _dispatch(self, frames: np.ndarray, wcond: dict,
                  cond_prompt: np.ndarray, uncond_prompt: Optional[np.ndarray],
                  lookback_time: float, lookahead_time: float,
                  context_type: Optional[ContextType]) -> list[np.ndarray]:
        """Run a window batch locally, or through the IPC server when a
        client is attached."""
        if self.client is not None:
            model_kwargs = dict(wcond, frames=frames, cond_prompt=cond_prompt,
                                uncond_prompt=uncond_prompt)
            generate_kwargs = dict(lookback_time=lookback_time,
                                   lookahead_time=lookahead_time,
                                   context_type=context_type)
            return self.client.generate(model_kwargs, generate_kwargs)
        b_raw = frames.shape[0]
        b_tgt = _bucket_windows(b_raw)
        if b_tgt > b_raw:
            reps = b_tgt - b_raw

            def pad0(a):
                a = np.asarray(a)
                return np.concatenate([a, np.repeat(a[:1], reps, axis=0)])

            frames = pad0(frames)
            cond_prompt = pad0(cond_prompt)
            if uncond_prompt is not None:
                uncond_prompt = pad0(uncond_prompt)
            wcond = {k: pad0(v)
                     if np.ndim(v) >= 1 and np.shape(v)[0] == b_raw else v
                     for k, v in wcond.items()}
        enc = self.encode_audio(frames, wcond)
        outs = self._run_engine(enc, cond_prompt, uncond_prompt,
                                lookback_time, lookahead_time, context_type)
        return outs[:b_raw]

    def _run_engine(self, enc_hidden, cond_prompt: np.ndarray,
                    uncond_prompt: Optional[np.ndarray],
                    lookback_time: float, lookahead_time: float,
                    context_type: Optional[ContextType]) -> list[np.ndarray]:
        """One engine invocation over a window batch. Returns the generated
        (post-prompt) token arrays per row, EOS trimmed by the caller."""
        b, p_raw = cond_prompt.shape
        max_len = int(self.max_len_override or self.tgt_seq_len)
        p = min(_bucket(p_raw + 1), max_len)
        if self.fixed_prompt_pad:
            # one prefill shape for all windows -> one decode compile
            p = max(p, max_len // 2)
        # always reserve decode budget: a prompt whose bucket reaches
        # max_len would otherwise generate nothing (the reference keeps
        # the raw prompt length and generates tgt - p_raw tokens); drop the
        # oldest context instead
        p = max(min(p, max_len - 64), 16)
        cfg_on = self.cfg_scale > 1 and uncond_prompt is not None

        if self.mesh is not None:
            # window data-parallelism: pad the window batch so each half of
            # the (possibly CFG-doubled) batch divides the data axis; padded
            # rows duplicate row 0 and are dropped on return
            n = int(self.mesh.devices.size)
            b_pad = (-b) % n
            if b_pad:
                cond_prompt = np.concatenate(
                    [cond_prompt, np.repeat(cond_prompt[:1], b_pad, axis=0)])
                if uncond_prompt is not None:
                    uncond_prompt = np.concatenate(
                        [uncond_prompt,
                         np.repeat(uncond_prompt[:1], b_pad, axis=0)])
                enc_hidden = jnp.concatenate(
                    [enc_hidden, jnp.repeat(enc_hidden[:1], b_pad, axis=0)])

        def left_pad(x):
            out = np.full((x.shape[0], p), self.tokenizer.pad_id, np.int32)
            k = min(x.shape[1], p)
            out[:, p - k:] = x[:, -k:]
            return out

        prompt = left_pad(cond_prompt)
        if cfg_on:
            prompt = np.concatenate([prompt, left_pad(uncond_prompt)], axis=0)
            enc_hidden = jnp.concatenate([enc_hidden, enc_hidden], axis=0)

        # lookback/lookahead enter as DYNAMIC arrays (eos + lookback masks)
        # so every window shares one compiled decode program; only the
        # use_lookback bool is part of the jit cache key
        settings = SamplerSettings(
            use_lookback=lookback_time > 0,
            **{**self.settings_base,
               "cfg_scale": self.cfg_scale if cfg_on else 1.0})
        eos_mask = jnp.asarray(self.tables.eos_token_mask(
            lookback_time=lookback_time, lookahead_time=lookahead_time,
            context_type=context_type))
        lb_tokens = int(lookback_time / MILISECONDS_PER_STEP)
        lookback_mask = np.zeros(self.tables.vocab_size_out, dtype=bool)
        lookback_mask[self.tables.time_start:
                      self.tables.time_start + lb_tokens] = True
        lookback_mask = jnp.asarray(lookback_mask)

        prompt_j, mask_j = jnp.asarray(prompt), jnp.asarray(prompt != self.tokenizer.pad_id)
        if self.mesh is not None:
            import jax as _jax  # noqa: PLC0415
            from jax.sharding import NamedSharding, PartitionSpec as _P  # noqa: PLC0415
            batch_s = NamedSharding(self.mesh, _P("data"))
            rep = NamedSharding(self.mesh, _P())
            prompt_j = _jax.device_put(prompt_j, batch_s)
            mask_j = _jax.device_put(mask_j, batch_s)
            enc_hidden = _jax.device_put(enc_hidden, batch_s)
            eos_mask = _jax.device_put(eos_mask, rep)
            lookback_mask = _jax.device_put(lookback_mask, rep)
            if not self._params_replicated:
                self.params = _jax.device_put(self.params, rep)
                self._params_replicated = True

        # AOT executable cache: later processes load the serialized decode
        # program instead of paying the remote compile (decode/aot.py)
        from ..decode.aot import aot_call, default_cache_dir  # noqa: PLC0415
        aot_dir = getattr(self.args, "aot_cache_dir", "") or ""
        if aot_dir == "auto":
            aot_dir = default_cache_dir()

        if (self.num_beams > 1 and not settings.do_sample and not cfg_on):
            from ..decode.engine import beam_generate  # noqa: PLC0415
            out = aot_call(
                beam_generate, aot_dir,
                self.params, self.dims, settings, self.tables, enc_hidden,
                prompt_j, mask_j, eos_mask,
                max_len=max_len, num_beams=self.num_beams,
                dtype=self.dtype,
                kv_quant=getattr(self.args, "decode_kv_quant", False))
        elif getattr(self.args, "speculative_k", 0) > 0:
            from ..decode.speculative import generate_speculative  # noqa: PLC0415
            out = aot_call(
                generate_speculative, aot_dir,
                self.params, self.dims, settings, self.tables, enc_hidden,
                prompt_j, mask_j, eos_mask, self._next_key(),
                max_len=max_len,
                draft_k=int(self.args.speculative_k), dtype=self.dtype,
                lookback_mask=lookback_mask)
        else:
            out = aot_call(
                engine_generate, aot_dir,
                self.params, self.dims, settings, self.tables, enc_hidden,
                prompt_j, mask_j, eos_mask, self._next_key(),
                max_len=max_len, dtype=self.dtype,
                lookback_mask=lookback_mask,
                unroll_layers=getattr(self.args, "decode_unroll_layers",
                                      False),
                kv_quant=getattr(self.args, "decode_kv_quant", False))
        tokens = np.asarray(out["tokens"])
        length = int(out["length"])
        return [tokens[i, p:length] for i in range(b)]

    def _teacher_forced_logits(self, enc_hidden, prompts: np.ndarray) -> np.ndarray:
        """Teacher-forced logits over left-padded prompts (B, P) -> (B, P, V),
        through the cached decoder (position-transparent left padding)."""
        import jax  # noqa: PLC0415
        from ..decode.engine import decoder_cached_forward  # noqa: PLC0415
        from ..decode.kv_cache import init_self_cache, precompute_cross_kv  # noqa: PLC0415

        b, p = prompts.shape
        mask = prompts != self.tokenizer.pad_id
        cache = init_self_cache(self.dims, b, p, self.dtype)
        ck, cv = precompute_cross_kv(self.params, self.dims, enc_hidden, self.dtype)
        positions = jnp.clip(jnp.cumsum(jnp.asarray(mask, jnp.int32), axis=1) - 1, 0)
        logits, _ = decoder_cached_forward(
            self.params, self.dims, jnp.asarray(prompts, jnp.int32), cache, ck,
            cv, positions, 0, jnp.asarray(mask), p, self.dtype)
        return np.asarray(logits, np.float32)

    def ai_mod(self, *, sequences, generation_config: GenerationConfig,
               beatmap_path=None, verbose: bool = True) -> list[dict]:
        """Teacher-forced surprisal pass for MaiMod (processor.py:416):
        runs the full beatmap through the model as decoder input and records
        per-token relative surprisal + the argmax suggestion."""
        gen_in, gen_out, req_special = self._get_viable_template(
            gamemode=generation_config.gamemode)
        song_length = sequences[2]
        in_data = self.get_in_context(
            in_context=gen_in, beatmap_path=beatmap_path, song_length=song_length)
        out_data = self.get_out_context(
            out_context=gen_out, generation_config=generation_config,
            given_context=gen_out, beatmap_path=beatmap_path,
            song_length=song_length, verbose=verbose)
        cond = self.model_conditioning(generation_config)

        windows, window_times = sequences[0], sequences[1]
        n = len(windows)
        prompts, song_positions = [], []
        for w in range(n):
            frame_time = float(window_times[w])
            cp, _ = self.get_prompts(
                self.prepare_context_sequences(in_data, frame_time, False, req_special),
                self.prepare_context_sequences(out_data, frame_time, True, req_special))
            prompts.append(cp)
            song_positions.append(self._window_song_position(frame_time, song_length)[0])
        max_p = max(len(p) for p in prompts)
        padded = np.full((n, max_p), self.tokenizer.pad_id, np.int32)
        for i, p in enumerate(prompts):
            padded[i, max_p - len(p):] = p

        for context in out_data:
            context["surprisals"] = np.zeros(len(context["events"]), np.float32)
            context["expected_events"] = np.array(context["events"], dtype=object)

        bsz = max(1, self.max_batch_size)
        iterator = range(0, n, bsz)
        if verbose:
            from tqdm import tqdm  # noqa: PLC0415
            iterator = tqdm(list(iterator))
        for start in iterator:
            stop = min(start + bsz, n)
            wcond = {k: np.repeat(v, stop - start, axis=0) for k, v in cond.items()}
            if self.do_song_position_embed:
                wcond["song_position"] = np.stack(song_positions[start:stop])
            enc = self.encode_audio(windows[start:stop], wcond)
            logits_batch = self._teacher_forced_logits(enc, padded[start:stop])
            for row, w in enumerate(range(start, stop)):
                self._ai_mod_score_window(
                    out_data, prompts[w], logits_batch[row], max_p,
                    float(window_times[w]), w, n)
        return out_data

    def _ai_mod_score_window(self, out_data, seq_prompt, logits, max_p,
                             frame_time, w, n_windows):
        padding = max_p - len(seq_prompt)
        trim_lookback = w != 0
        trim_lookahead = w != n_windows - 1
        for context in out_data:
            s, e = self._get_events_time_range(
                context["event_times"], frame_time,
                frame_time + self.miliseconds_per_sequence)
            events = context["events"][s:e]
            tokens = np.asarray(self._encode(events, frame_time))
            window_start_t = frame_time + self.lookback_time if trim_lookback else frame_time
            window_end_t = (frame_time + self.lookahead_max_time if trim_lookahead
                            else frame_time + self.miliseconds_per_sequence)
            s2, e2 = self._get_events_time_range(
                context["event_times"][s:e], window_start_t, window_end_t)
            if self.add_out_context_types:
                cs, ce = self._get_token_context(
                    np.asarray(seq_prompt),
                    self.tokenizer.context_sos[context["context_type"]],
                    self.tokenizer.context_eos[context["context_type"]])
            else:
                cs, ce = self._get_token_context(
                    np.asarray(seq_prompt), self.tokenizer.sos_id, self.tokenizer.eos_id)
            # logits at position i predict token i+1: shift back by one
            win_logits = logits[cs + padding - 1:ce + padding - 1]
            if len(win_logits) != len(events):
                continue  # prompt was trimmed by halving; skip this window
            tokens = tokens[s2:e2]
            win_logits = win_logits[s2:e2]
            if len(tokens) == 0:
                continue
            x = win_logits - win_logits.max(axis=-1, keepdims=True)
            probs = np.exp(x)
            probs /= probs.sum(axis=-1, keepdims=True)
            entropy = -np.sum(probs * np.log2(probs + 1e-10), axis=-1)
            token_probs = probs[np.arange(len(tokens)), tokens]
            surprisal = -np.log2(token_probs + 1e-10)
            relative = np.where(entropy > 0, surprisal / entropy, 0.0)
            suggested = self._decode(np.argmax(win_logits, axis=-1), frame_time,
                                     allow_non_events=True)
            context["surprisals"][s:e][s2:e2] = relative
            context["expected_events"][s:e][s2:e2] = np.array(suggested, dtype=object)[:len(tokens)]

    # -- template/context selection (processor.py:575) ------------------------

    def _get_viable_template(self, in_context=None, out_context=None,
                             extra_in_context=None, gamemode: int = 0):
        in_context = list(in_context or [])
        out_context = list(out_context or [])
        if extra_in_context is not None:
            for ct in extra_in_context:
                if ct not in in_context:
                    in_context.append(ct)

        viable = [ct for ct in self.context_types
                  if all(oc in ct["out"] for oc in out_context)
                  and all(ic in in_context or ic == ContextType.NONE for ic in ct["in"])]
        if not viable:
            raise ValueError(
                "No viable template found for the given context types. "
                f"Candidates are: {self.context_types}")
        template = max(viable, key=lambda ct: sum(1 for ic in ct["in"]
                                                  if ic != ContextType.NONE))
        all_out = template["out"]
        gen_out = list(all_out)
        gen_in = list(template["in"])
        req_special = self._required_special_tokens(all_out)
        if gamemode != 3 and ContextType.SV in gen_out:
            gen_out.remove(ContextType.SV)
        # Generate only up to the LAST requested context (the model emits
        # contexts in template order, so later ones are pure waste for e.g.
        # a timing-only pass). Divergence from the reference, which always
        # generates the full template and discards the unrequested tail
        # (reference processor.py:618-620). Filter against gen_out (not
        # all_out) so the non-mania SV suppression above is respected even
        # when SV itself is requested.
        requested = [oc for oc in out_context if oc in gen_out] or gen_out
        count = max(all_out.index(oc) for oc in requested) + 1
        return gen_in, all_out[:count], req_special

    def _required_special_tokens(self, all_out: list[ContextType]) -> list[str]:
        result = []
        if ContextType.KIAI in all_out or (self.add_kiai and any(
                c in all_out for c in (ContextType.GD, ContextType.MAP))):
            result.append("last_kiai")
        if ContextType.SV in all_out or ((self.add_sv or self.add_mania_sv) and any(
                c in all_out for c in (ContextType.GD, ContextType.MAP))):
            result.append("last_sv")
        if self.add_song_position_token:
            result.append("song_position")
        return result

    # -- context construction (processor.py:763) -------------------------------

    def get_context(self, context: ContextType, *, beatmap_path=None,
                    extra_in_context=None, song_length=None, add_type=False,
                    add_class=False, finished=False, partial=False,
                    parser: Optional[BeatmapParser] = None) -> dict:
        if (context != ContextType.NONE and finished
                and (extra_in_context is None or context not in extra_in_context)):
            if beatmap_path is None or not Path(beatmap_path).is_file():
                raise FileNotFoundError(f"Beatmap file {beatmap_path} not found.")

        data: dict[str, Any] = {
            "events": [], "event_times": [], "context_type": context,
            "add_type": add_type, "add_class": add_class,
            "add_pre_tokens": False, "song_length": song_length,
            "finished": finished,
        }
        if not (finished or partial):
            return data

        parser = parser or self.parser
        if extra_in_context is not None and context in extra_in_context:
            value = extra_in_context[context]
            if context == ContextType.TIMING and isinstance(value, list):
                data["events"], data["event_times"] = parser.parse_timing(
                    value, song_length=song_length)
            elif len(value) == 2:
                data["events"], data["event_times"] = value
            else:
                data["events"], data["event_times"], data["class"] = value
        elif context == ContextType.NONE:
            pass
        elif context == ContextType.TIMING:
            bm = Beatmap.from_path(beatmap_path)
            data["events"], data["event_times"] = parser.parse_timing(
                bm, song_length=song_length)
        elif context in (ContextType.MAP, ContextType.GD):
            bm = Beatmap.from_path(beatmap_path)
            data["events"], data["event_times"] = parser.parse(bm, song_length=song_length)
            if add_class:
                data["class"] = self.class_tokens(
                    generation_config_from_beatmap(bm, self.tokenizer), song_length)
        elif context == ContextType.NO_HS:
            bm = Beatmap.from_path(beatmap_path)
            ev, et = parser.parse(bm, song_length=song_length)
            data["events"], data["event_times"] = remove_events_of_type(
                ev, et, [EventType.HITSOUND, EventType.VOLUME])
        elif context == ContextType.KIAI:
            data["events"], data["event_times"] = parser.parse_kiai(
                Beatmap.from_path(beatmap_path))
        elif context == ContextType.SV:
            data["events"], data["event_times"] = parser.parse_scroll_speeds(
                Beatmap.from_path(beatmap_path))
        else:
            raise ValueError(f"Invalid context type {context}")

        if not finished and partial:
            self._trim_events_after_time(data["events"], data["event_times"],
                                         self.start_time - 1)
        return data

    def get_in_context(self, *, in_context, beatmap_path, extra_in_context=None,
                       song_length) -> list[dict]:
        contexts = [self.get_context(
            c, beatmap_path=beatmap_path, extra_in_context=extra_in_context,
            song_length=song_length, add_type=True, add_class=True,
            finished=True) for c in in_context]
        if self.add_gd_context:
            contexts.append(self.get_context(
                ContextType.GD, beatmap_path=beatmap_path,
                extra_in_context=extra_in_context, song_length=song_length,
                add_type=False, add_class=True, finished=True))
        return contexts

    def get_out_context(self, *, out_context, generation_config, given_context,
                        beatmap_path, extra_in_context=None, song_length,
                        verbose=True) -> list[dict]:
        out = []
        for i, context in enumerate(out_context):
            data = self.get_context(
                context, beatmap_path=beatmap_path,
                extra_in_context=extra_in_context, song_length=song_length,
                add_type=self.add_out_context_types, add_class=False,
                finished=context in given_context,
                partial=self.add_to_beatmap and self.start_time is not None)
            if i == 0:
                gc = generation_config
                data["class"] = self.class_tokens(gc, song_length, verbose=verbose)
                neg_has_mapper = ((gc.descriptors and len(gc.descriptors) > 0)
                                  or (gc.negative_descriptors and len(gc.negative_descriptors) > 0))
                data["negative_class"] = self.class_tokens(dataclasses.replace(
                    gc, beatmap_id=None,
                    mapper_id=gc.mapper_id if neg_has_mapper else None,
                    descriptors=gc.negative_descriptors,
                    negative_descriptors=None), song_length)
                data["add_pre_tokens"] = self.add_pre_tokens
            out.append(data)
        return out

    # -- conditioning tokens (processor.py:916 get_class_vector) ----------------

    def class_tokens(self, config: GenerationConfig, song_length: float,
                     verbose: bool = False) -> list[int]:
        tok = self.tokenizer
        out: list[int] = []
        if self.add_gamemode_token:
            out.append(tok.encode_gamemode(config.gamemode))
        if self.add_style_token:
            out.append(tok.encode_style(config.beatmap_id)
                       if config.beatmap_id is not None else tok.style_unk)
        if self.add_diff_token:
            out.append(tok.encode_diff(config.difficulty)
                       if config.difficulty is not None else tok.diff_unk)
        if self.add_mapper_token:
            out.append(tok.encode_mapper_id(config.mapper_id)
                       if config.mapper_id is not None else tok.mapper_unk)
        if self.add_year_token:
            out.append(tok.encode_year(config.year)
                       if config.year is not None else tok.year_unk)
        if self.add_hitsounded_token:
            out.append(tok.encode(Event(EventType.HITSOUNDED, int(config.hitsounded))))
        if self.add_song_length_token:
            out.append(tok.encode_song_length(song_length))
        if self.add_global_sv_token and self.add_sv and config.gamemode in (0, 2):
            out.append(tok.encode_global_sv(config.slider_multiplier))
        if self.add_cs_token and config.gamemode in (0, 2):
            out.append(tok.encode_cs(config.circle_size)
                       if config.circle_size is not None else tok.cs_unk)
        if config.gamemode == 3:
            if self.add_keycount_token:
                out.append(tok.encode(Event(EventType.MANIA_KEYCOUNT, config.keycount)))
            if self.add_hold_note_ratio_token:
                out.append(tok.encode_hold_note_ratio(config.hold_note_ratio))
        if self.add_scroll_speed_ratio_token and config.gamemode in (1, 3):
            out.append(tok.encode_scroll_speed_ratio(config.scroll_speed_ratio))
        if self.add_descriptors:
            added = 0
            for desc in config.descriptors or []:
                if isinstance(desc, str):
                    if desc not in tok.descriptor_idx:
                        if verbose:
                            print(f"Descriptor class {desc} not found. Skipping.")
                        continue
                    out.append(tok.encode_descriptor_name(desc))
                    added += 1
                elif isinstance(desc, int):
                    er = tok.event_range[EventType.DESCRIPTOR]
                    if not er.min_value <= desc <= er.max_value:
                        if verbose:
                            print(f"Descriptor idx {desc} out of range. Skipping.")
                        continue
                    out.append(tok.encode_descriptor_idx(desc))
                    added += 1
            if added == 0:
                out.append(tok.descriptor_unk)
        return out

    def model_conditioning(self, config: GenerationConfig) -> dict:
        """Continuous-conditioning arrays for the encoder
        (processor.py:623 _get_model_cond_kwargs)."""
        cond: dict[str, np.ndarray] = {}
        if self.do_style_embed:
            idx = (self.tokenizer.beatmap_idx.get(config.beatmap_id, self.dims.num_classes)
                   if config.beatmap_id is not None else self.dims.num_classes)
            cond["beatmap_idx"] = np.array([idx], np.int32)
        if self.do_difficulty_embed:
            cond["difficulty"] = np.array(
                [config.difficulty if config.difficulty is not None else 5.0], np.float32)
        if self.do_mapper_embed:
            idx = (self.tokenizer.get_mapper_idx(config.mapper_id)
                   if config.mapper_id is not None else -1)
            cond["mapper_idx"] = np.array([idx], np.int32)
        return cond

    # -- tokenization helpers ---------------------------------------------------

    def _encode(self, events: list[Event], frame_time: float) -> list[int]:
        er = self.tokenizer.event_range[EventType.TIME_SHIFT]
        out = []
        for event in events:
            if event.type == EventType.TIME_SHIFT:
                value = int((event.value - frame_time) / MILISECONDS_PER_STEP)
                event = Event(event.type, int(np.clip(value, er.min_value, er.max_value)))
            out.append(self.tokenizer.encode(event))
        return out

    def _decode(self, tokens, frame_time: float,
                allow_non_events: bool = False) -> list[Event]:
        events = []
        for token in np.asarray(tokens).tolist():
            if token == self.tokenizer.eos_id and not allow_non_events:
                break
            try:
                event = self.tokenizer.decode(token)
            except ValueError:
                if allow_non_events:
                    events.append(Event(EventType.CONTROL, token))
                continue
            if event.type == EventType.TIME_SHIFT:
                event.value = frame_time + event.value * MILISECONDS_PER_STEP
            events.append(event)
        return events

    @staticmethod
    def _get_events_time_range(event_times, start_time, end_time):
        s = 0
        for i in range(len(event_times) - 1, -1, -1):
            if event_times[i] < start_time:
                s = i + 1
                break
        e = 0
        for i in range(len(event_times) - 1, -1, -1):
            if event_times[i] < end_time:
                e = i + 1
                break
        return s, e

    @staticmethod
    def _trim_events_before_time(events, event_times, time):
        for i in range(len(event_times) - 1, -1, -1):
            if event_times[i] < time:
                del events[i]
                del event_times[i]

    @staticmethod
    def _trim_events_after_time(events, event_times, time):
        for i in range(len(event_times) - 1, -1, -1):
            if event_times[i] > time:
                del events[i]
                del event_times[i]
            else:
                break

    # -- special (last kiai / last sv / song position) tokens -------------------

    def _default_special_event(self, name: str) -> Event:
        if name == "last_kiai":
            return Event(EventType.KIAI, 0)
        if name == "last_sv":
            return Event(EventType.SCROLL_SPEED, 100)
        raise ValueError(f"Invalid special event name {name}.")

    def _event_before_time(self, events, event_times, etype, time, default):
        for i in range(len(events) - 1, -1, -1):
            if events[i].type == etype and event_times[i] < time:
                return events[i]
        return default

    def prepare_context_sequence(self, context: dict, frame_time: float) -> dict:
        result = dict(context)
        result["frame_time"] = frame_time
        if context["add_pre_tokens"]:
            s, e = self._get_events_time_range(
                context["event_times"], frame_time - self.miliseconds_per_sequence,
                frame_time)
            pre = self._encode(context["events"][s:e], frame_time)
            if 0 <= self.max_pre_token_len < len(pre):
                pre = pre[-self.max_pre_token_len:]
            result["pre_tokens"] = pre
        s, e = self._get_events_time_range(
            context["event_times"], frame_time,
            frame_time + self.miliseconds_per_sequence)
        result["tokens"] = self._encode(context["events"][s:e], frame_time)

        extra: dict[str, Event] = {}
        ct = context["context_type"]
        if self.add_kiai_special_token and (
                ct == ContextType.KIAI
                or (self.add_kiai and ct in (ContextType.GD, ContextType.MAP))):
            extra["last_kiai"] = self._event_before_time(
                context["events"], context["event_times"], EventType.KIAI,
                frame_time, self._default_special_event("last_kiai"))
        if self.add_sv_special_token and (
                ct == ContextType.SV
                or ((self.add_sv or self.add_mania_sv) and ct in (ContextType.GD, ContextType.MAP))):
            extra["last_sv"] = self._event_before_time(
                context["events"], context["event_times"], EventType.SCROLL_SPEED,
                frame_time, self._default_special_event("last_sv"))
        if self.add_song_position_token and "class" in context:
            extra["song_position"] = self.tokenizer.decode(
                self.tokenizer.encode_song_position(frame_time, context["song_length"]))
        result["extra_special_events"] = extra
        return result

    def prepare_context_sequences(self, contexts: list[dict], frame_time,
                                  out_context: bool,
                                  req_special_tokens: list[str]) -> list[dict]:
        results = [self.prepare_context_sequence(c, frame_time)
                   for c in contexts]
        if out_context and results:
            # fold every context's special events onto the head context
            # (later contexts win ties), then fill required defaults
            head = results[0]["extra_special_events"]
            for result in results[1:]:
                head.update(result.pop("extra_special_events"))
            for k in req_special_tokens:
                if k not in head:
                    head[k] = self._default_special_event(k)
        order = ["last_kiai", "last_sv", "song_position"]
        for result in results:
            if "extra_special_events" not in result:
                continue
            events = [result["extra_special_events"][k] for k in order
                      if k in result["extra_special_events"]]
            result["extra_special_tokens"] = self._encode(events, result["frame_time"])
        return results

    # -- prompt assembly (processor.py:1091-1156) --------------------------------

    def get_context_tokens(self, context: dict, max_token_length=None,
                           add_type_end=True) -> list[int]:
        tokens = context["tokens"]
        if max_token_length is not None and len(tokens) > max_token_length:
            tokens = tokens[-max_token_length:]
        out: list[int] = []
        if context["add_type"]:
            out.append(self.tokenizer.context_sos[context["context_type"]])
        if context["add_class"]:
            if "class" in context:
                out.extend(context["class"])
            if "extra_special_tokens" in context:
                out.extend(context["extra_special_tokens"])
        out.extend(tokens)
        if context["add_type"] and add_type_end:
            out.append(self.tokenizer.context_eos[context["context_type"]])
        return out

    def get_prompt(self, in_context, out_context, negative=False,
                   max_token_length=None) -> list[int]:
        head = out_context[0]
        user_prompt = head["negative_class"] if negative else head["class"]
        extra = head.get("extra_special_tokens", [])
        pre_tokens = head.get("pre_tokens", [])
        if max_token_length is not None:
            pre_tokens = pre_tokens[-max_token_length:]

        prefix: list[int] = []
        for context in in_context:
            prefix.extend(self.get_context_tokens(context, max_token_length))
        prefix.extend(user_prompt)
        prefix.extend(extra)
        prefix.extend(pre_tokens)
        if self.center_pad_decoder:
            pad_n = self.tgt_seq_len // 2 - len(prefix)
            prefix = [self.tokenizer.pad_id] * max(pad_n, 0) + prefix
        prompt = prefix + [self.tokenizer.sos_id]
        for i, context in enumerate(out_context):
            prompt.extend(self.get_context_tokens(
                context, max_token_length, i != len(out_context) - 1))
        return prompt

    def get_prompts(self, in_context, out_context):
        cond = self.get_prompt(in_context, out_context)
        uncond = (self.get_prompt(in_context, out_context, negative=True)
                  if self.cfg_scale > 1 else None)
        i = 0
        max_length = self.tgt_seq_len
        while len(cond) >= self.tgt_seq_len:
            i += 1
            if i > 10:
                raise ValueError("Prompt is too long.")
            max_length = max_length // 2
            cond = self.get_prompt(in_context, out_context, max_token_length=max_length)
            uncond = (self.get_prompt(in_context, out_context, negative=True,
                                      max_token_length=max_length)
                      if self.cfg_scale > 1 else None)
        return cond, uncond

    # -- result handling (processor.py:993) ---------------------------------------

    def add_predicted_tokens_to_context(self, context: dict, predicted_tokens,
                                        frame_time, trim_lookback=False,
                                        trim_lookahead=False) -> None:
        tok = self.tokenizer
        predicted_tokens = list(np.asarray(predicted_tokens).tolist())
        ct = context["context_type"]
        while predicted_tokens and (
                predicted_tokens[-1] == tok.eos_id
                or (ct in tok.context_eos and predicted_tokens[-1] == tok.context_eos[ct])
                or predicted_tokens[-1] == tok.pad_id):
            predicted_tokens.pop()

        lookback_end = tok.event_start[EventType.TIME_SHIFT] + int(
            self.lookback_time / MILISECONDS_PER_STEP)
        lookahead_start = tok.event_end[EventType.TIME_SHIFT] - int(
            self.lookahead_time / MILISECONDS_PER_STEP)
        if predicted_tokens:
            last = predicted_tokens[-1]
            hit_lookahead = trim_lookahead and lookahead_start <= last < tok.event_end[EventType.TIME_SHIFT]
            hit_lookback = trim_lookback and tok.event_start[EventType.TIME_SHIFT] <= last < lookback_end
            if hit_lookahead or hit_lookback:
                predicted_tokens = predicted_tokens[:-2 if self.types_first else -1]

        result = self._decode(predicted_tokens, frame_time)
        context["events"] += result
        update_event_times(context["events"], context["event_times"],
                           frame_time + self.eos_time, self.types_first)
        if trim_lookahead:
            self._trim_events_after_time(context["events"], context["event_times"],
                                         frame_time + self.lookahead_max_time)

    # -- top-level generate --------------------------------------------------------

    def generate(self, *, sequences, generation_config: GenerationConfig,
                 in_context=None, out_context=None, beatmap_path=None,
                 extra_in_context=None, verbose=True) -> list[tuple[list[Event], list[int]]]:
        """sequences = (windows (N, samples), window_times (N,), song_length)."""
        gen_in, gen_out, req_special = self._get_viable_template(
            in_context=in_context, out_context=out_context,
            extra_in_context=extra_in_context, gamemode=generation_config.gamemode)
        out_context = out_context or [ContextType.MAP]

        song_length = sequences[2]
        in_data = self.get_in_context(
            in_context=gen_in, beatmap_path=beatmap_path,
            extra_in_context=extra_in_context, song_length=song_length)
        out_data = self.get_out_context(
            out_context=gen_out, generation_config=generation_config,
            given_context=in_context or [], beatmap_path=beatmap_path,
            extra_in_context=extra_in_context, song_length=song_length,
            verbose=verbose)

        cond = self.model_conditioning(generation_config)
        if self.parallel:
            self._generate_parallel(sequences, in_data, out_data, cond,
                                    req_special, song_length, verbose)
        else:
            self._generate_sequential(sequences, in_data, out_data, cond,
                                      req_special, song_length, verbose)

        return self._finalize_out_data(
            out_data, out_context, generation_config, beatmap_path,
            extra_in_context, song_length)

    def generate_many(self, *, jobs, in_context=None, out_context=None,
                      verbose=True) -> list[list[tuple[list[Event], list[int]]]]:
        """Batch several independent generation passes into shared engine
        batches: different songs (serving), or offset passes over one song
        (super timing). Every pass's windows are flattened into one row
        stream and chunked at max_batch_size, so N small passes fill the
        device batch instead of issuing N under-sized decodes.

        Each job is a dict with keys: ``sequences``, ``generation_config``,
        and optionally ``beatmap_path`` / ``extra_in_context``. Returns one
        generate() result per job, in order. Parallel mode only; sequential
        mode (windows chained through decoder prefill) cannot cross-batch
        and falls back to per-job generate()."""
        if not self.parallel:
            return [self.generate(in_context=in_context,
                                  out_context=out_context, verbose=verbose,
                                  **job) for job in jobs]
        prepared = []
        all_rows: list[dict] = []
        for job in jobs:
            sequences = job["sequences"]
            gc = job["generation_config"]
            beatmap_path = job.get("beatmap_path")
            extra_in_context = job.get("extra_in_context")
            gen_in, gen_out, req_special = self._get_viable_template(
                in_context=in_context, out_context=out_context,
                extra_in_context=extra_in_context, gamemode=gc.gamemode)
            oc = out_context or [ContextType.MAP]
            song_length = sequences[2]
            in_data = self.get_in_context(
                in_context=gen_in, beatmap_path=beatmap_path,
                extra_in_context=extra_in_context, song_length=song_length)
            out_data = self.get_out_context(
                out_context=gen_out, generation_config=gc,
                given_context=in_context or [], beatmap_path=beatmap_path,
                extra_in_context=extra_in_context, song_length=song_length,
                verbose=verbose)
            cond = self.model_conditioning(gc)
            rows = self._parallel_rows(sequences, in_data, out_data, cond,
                                       req_special, song_length)
            prepared.append((job, oc, out_data, rows, song_length))
            all_rows.extend(rows)

        all_tokens = self._decode_rows(all_rows, verbose=verbose)

        results, i = [], 0
        for job, oc, out_data, rows, song_length in prepared:
            self._split_parallel_tokens(all_tokens[i:i + len(rows)], rows,
                                        out_data)
            i += len(rows)
            results.append(self._finalize_out_data(
                out_data, oc, job["generation_config"],
                job.get("beatmap_path"), job.get("extra_in_context"),
                song_length))
        return results

    def _finalize_out_data(self, out_data, out_context, generation_config,
                           beatmap_path, extra_in_context,
                           song_length) -> list[tuple[list[Event], list[int]]]:
        for context in out_data:
            context["event_times"] = []
            update_event_times(context["events"], context["event_times"],
                               song_length, self.types_first)
            if self.start_time is not None:
                self._trim_events_before_time(context["events"],
                                              context["event_times"],
                                              self.start_time - 10)
            if self.end_time is not None:
                self._trim_events_after_time(context["events"],
                                             context["event_times"],
                                             self.end_time + 10)
            if context["context_type"] == ContextType.MAP and self.add_positions:
                context["events"], context["event_times"] = self._rescale_positions(
                    context["events"], context["event_times"])

        if self.add_to_beatmap and (self.start_time is not None or self.end_time is not None):
            ref_parser = BeatmapParser(self.args.train, self.tokenizer)
            ref_parser.position_precision = 1
            ref_parser.position_split_axes = True
            for context in out_data:
                ref = self.get_context(
                    context["context_type"], beatmap_path=beatmap_path,
                    extra_in_context=extra_in_context, finished=True,
                    parser=ref_parser, song_length=song_length)
                if self.start_time is not None:
                    ev, et = list(ref["events"]), list(ref["event_times"])
                    self._trim_events_after_time(ev, et, self.start_time - 1)
                    context["events"] = ev + context["events"]
                    context["event_times"] = et + context["event_times"]
                if self.end_time is not None:
                    ev, et = list(ref["events"]), list(ref["event_times"])
                    self._trim_events_before_time(ev, et, self.end_time + 1)
                    context["events"] += ev
                    context["event_times"] += et

        for context in out_data:
            if (context["context_type"] == ContextType.MAP
                    and generation_config.gamemode == 3):
                context["events"], context["event_times"] = self._convert_column_to_position(
                    context["events"], context["event_times"], generation_config.keycount)

        return [(c["events"], c["event_times"]) for c in out_data
                if c["context_type"] in out_context]

    def _window_song_position(self, frame_time, song_length):
        return np.array([[frame_time / song_length,
                          (frame_time + self.miliseconds_per_sequence) / song_length]],
                        np.float32)

    def _generate_sequential(self, sequences, in_data, out_data, cond,
                             req_special, song_length, verbose):
        windows, window_times = sequences[0], sequences[1]
        for i, context in enumerate(out_data):
            if context["finished"]:
                continue
            if verbose:
                print(f"Generating {context['context_type'].value}")
            iterator = range(len(windows))
            if verbose:
                from tqdm import tqdm  # noqa: PLC0415
                iterator = tqdm(iterator)
            for w in iterator:
                frame_time = float(window_times[w])
                trim_lookback = w != 0 and self.types_first and self.lookback_time > 0
                trim_lookahead = w != len(windows) - 1

                cond_prompt, uncond_prompt = self.get_prompts(
                    self.prepare_context_sequences(in_data, frame_time, False, req_special),
                    self.prepare_context_sequences(out_data[:i + 1], frame_time, True, req_special))

                wcond = dict(cond)
                if self.do_song_position_embed:
                    wcond["song_position"] = self._window_song_position(frame_time, song_length)
                results = self._dispatch(
                    windows[w:w + 1], wcond, np.asarray([cond_prompt], np.int32),
                    np.asarray([uncond_prompt], np.int32) if uncond_prompt else None,
                    self.lookback_time if trim_lookback else 0.0,
                    self.lookahead_time if trim_lookahead else 0.0,
                    context["context_type"])
                self.add_predicted_tokens_to_context(
                    context, results[0], frame_time, trim_lookback, trim_lookahead)

    def _generate_parallel(self, sequences, in_data, out_data, cond,
                           req_special, song_length, verbose):
        """One batched decode for ALL out-contexts: prompts end at the first
        context's sos/class, the model emits every context in one stream
        ([timing]..[/timing][kiai]..[/kiai][map]..  eos — the training-target
        layout, dataset.py add_context), and each context's tokens are split
        from prompt+continuation by its context sos/eos — the reference
        protocol (processor.py:366 generate_parallel, :726
        _get_token_context). The decode stops only at the global EOS
        (context_type=None): stopping at the first context's eos is what
        truncated the stream to one context before commit 33084f7.
        Divergence from the reference: finished (given) contexts are skipped
        at split time so given timing/kiai is never re-added from the
        prompt; without add_out_context_types only the single head context
        is split out, as in the reference."""
        rows = self._parallel_rows(sequences, in_data, out_data, cond,
                                   req_special, song_length)
        all_tokens = self._decode_rows(rows, verbose=verbose)
        self._split_parallel_tokens(all_tokens, rows, out_data)

    def _stop_context(self, out_data) -> Optional[ContextType]:
        """The decode can stop at the LAST requested out-context's eos token
        instead of the global EOS: the training layout emits contexts in
        template order ([timing]..[/timing][kiai]..[/kiai][map].. eos), so
        everything after the last requested context's eos is unwanted. For a
        timing-only pass (super timing) this skips the whole kiai+map tail —
        the dominant token cost of the sweep."""
        if not self.add_out_context_types or not out_data:
            return None
        ct = out_data[-1]["context_type"]
        return ct if ct in self.tokenizer.context_eos else None

    def _parallel_rows(self, sequences, in_data, out_data, cond, req_special,
                       song_length) -> list[dict]:
        """Assemble one self-contained decode row per window: audio, prompt,
        negative prompt, and per-row encoder conditioning. Rows from
        different passes/songs can be freely interleaved in one batch."""
        windows, window_times = sequences[0], sequences[1]
        stop_ct = self._stop_context(out_data)
        rows: list[dict] = []
        for w in range(len(windows)):
            frame_time = float(window_times[w])
            cp, up = self.get_prompts(
                self.prepare_context_sequences(in_data, frame_time, False,
                                               req_special),
                self.prepare_context_sequences(out_data[:1], frame_time, True,
                                               req_special))
            row_cond = {k: v[0] for k, v in cond.items()}
            if self.do_song_position_embed:
                row_cond["song_position"] = self._window_song_position(
                    frame_time, song_length)[0]
            rows.append({"window": np.asarray(windows[w]), "prompt": cp,
                         "uncond_prompt": up, "cond": row_cond,
                         "frame_time": frame_time, "stop_context": stop_ct})
        return rows

    def _decode_rows(self, rows: list[dict], verbose=False) -> list[np.ndarray]:
        """Chunked batched decode over heterogeneous window rows. All chunks
        share one prompt pad length (one compiled program); returns the
        generated token array per row, in order."""
        if not rows:
            return []
        max_p = max(len(r["prompt"]) for r in rows)
        if self.cfg_scale > 1:
            max_p = max(max_p, max(len(r["uncond_prompt"]) for r in rows))

        def stack(ps):
            arr = np.full((len(ps), max_p), self.tokenizer.pad_id, np.int32)
            for j, p in enumerate(ps):
                arr[j, max_p - len(p):] = p
            return arr

        # a single early-stop context applies per engine call; rows from
        # jobs with differing stop contexts fall back to the global EOS
        stop_cts = {r.get("stop_context") for r in rows}
        stop_ct = stop_cts.pop() if len(stop_cts) == 1 else None

        bsz = max(1, self.max_batch_size // (2 if self.cfg_scale > 1 else 1))
        all_tokens: list[np.ndarray] = []
        iterator = range(0, len(rows), bsz)
        if verbose:
            from tqdm import tqdm  # noqa: PLC0415
            iterator = tqdm(list(iterator))
        for start in iterator:
            chunk = rows[start:start + bsz]
            frames = np.stack([r["window"] for r in chunk])
            cond_arr = stack([r["prompt"] for r in chunk])
            uncond_arr = (stack([r["uncond_prompt"] for r in chunk])
                          if self.cfg_scale > 1 else None)
            wcond = {k: np.stack([r["cond"][k] for r in chunk])
                     for k in chunk[0]["cond"]}
            all_tokens.extend(self._dispatch(
                frames, wcond, cond_arr, uncond_arr, 0.0, 0.0, stop_ct))
        return all_tokens

    def _split_parallel_tokens(self, all_tokens, rows, out_data) -> None:
        tok = self.tokenizer
        for row, seq in zip(rows, all_tokens):
            frame_time = row["frame_time"]
            full = np.concatenate(
                [np.asarray(row["prompt"], np.int32),
                 np.asarray(seq, np.int32).reshape(-1)])
            if self.add_out_context_types:
                for context in out_data:
                    if context["finished"]:
                        continue
                    ct = context["context_type"]
                    starts = np.nonzero(full == tok.context_sos[ct])[0]
                    if len(starts) == 0:
                        continue  # model never opened this context
                    s = int(starts[0]) + 1
                    ends = np.nonzero(full[s:] == tok.context_eos[ct])[0]
                    e = s + int(ends[0]) if len(ends) else len(full)
                    self.add_predicted_tokens_to_context(
                        context, full[s:e], frame_time)
            else:
                s, e = self._get_token_context(full, tok.sos_id, tok.eos_id)
                self.add_predicted_tokens_to_context(
                    out_data[0], full[s:e], frame_time)

    @staticmethod
    def _get_token_context(tokens, sos, eos):
        """[start, end) of one context's tokens inside a teacher-forced
        prompt that contains explicit context sos/eos markers (ai_mod)."""
        tokens = np.asarray(tokens)
        starts = np.nonzero(tokens == sos)[0]
        start = int(starts[0]) + 1 if len(starts) > 0 else 1
        ends = np.nonzero(tokens == eos)[0]
        end = int(ends[0]) if len(ends) > 0 else len(tokens)
        return start, end

    # -- position unpacking (processor.py:1231) -------------------------------------

    def _rescale_positions(self, events, event_times):
        new_events, new_times = [], []
        offset = self.position_precision // 2 if self.position_precision > 1 else 0
        for i, event in enumerate(events):
            if event.type in (EventType.POS_X, EventType.POS_Y):
                new_events.append(Event(event.type, event.value * self.position_precision))
                new_times.append(event_times[i])
            elif event.type == EventType.POS:
                x = ((event.value % self.x_count) + self.x_min) * self.position_precision + offset
                y = ((event.value // self.x_count) + self.y_min) * self.position_precision + offset
                new_events.append(Event(EventType.POS_X, x))
                new_events.append(Event(EventType.POS_Y, y))
                new_times.extend([event_times[i], event_times[i]])
            else:
                new_events.append(event)
                new_times.append(event_times[i])
        return new_events, new_times

    @staticmethod
    def _convert_column_to_position(events, event_times, key_count):
        new_events, new_times = [], []
        for i, event in enumerate(events):
            if event.type == EventType.MANIA_COLUMN:
                x = int((event.value + 0.5) * 512 / key_count)
                new_events.append(Event(EventType.POS_X, x))
                new_events.append(Event(EventType.POS_Y, 192))
                new_times.extend([event_times[i], event_times[i]])
            else:
                new_events.append(event)
                new_times.append(event_times[i])
        return new_events, new_times
