"""Diffusion coordinate refinement pipeline.

Re-design of the reference DiffisionPipeline (reference:
diffusion_pipeline.py:38): events -> 20-feature vectorized sequence ->
chunked respaced DDPM sampling with banded attention, CFG dual batch,
in-paint masking, and per-step slider-end recomputation (the geometry runs
on host through jax.pure_callback; everything else is one jitted scan).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.event_utils import get_groups, update_event_times
from ..events import Event, EventType
from ..models.dit import (
    DiTDims,
    banded_attention_mask,
    dit_forward_cfg,
    init_dit_params,
    sinusoidal_embedding,
)
from ..osu.geometry import SliderPath
from .sampler import p_sample_segment
from .schedule import DiffusionSchedule
from .tokenizer import DiffusionTokenizer

PLAYFIELD = np.array([512.0, 384.0])

# one-hot feature index per group type (reference diffusion_pipeline.py:302)
EVENT_INDEX = {
    EventType.CIRCLE: 0,
    EventType.SPINNER: 2,
    EventType.SPINNER_END: 3,
    EventType.SLIDER_HEAD: 4,
    EventType.BEZIER_ANCHOR: 6,
    EventType.PERFECT_ANCHOR: 7,
    EventType.CATMULL_ANCHOR: 8,
    EventType.RED_ANCHOR: 9,
    EventType.LAST_ANCHOR: 10,
    EventType.SLIDER_END: 11,
}
NC_TYPES = (EventType.CIRCLE, EventType.SLIDER_HEAD)


def repeat_type(repeats: int) -> int:
    """Slide-count bucket (reference osu_diffusion/utils/data_loading.py:43)."""
    if repeats < 4:
        return repeats - 1
    return 3 if repeats % 2 == 0 else 4


@dataclasses.dataclass
class DiffusionSlider:
    seq_indices: np.ndarray
    end_index: int
    curve_type: Optional[str]
    length: Optional[float]


_SEG_SAMPLER_CACHE: dict = {}


class DiffusionPipeline:
    def __init__(self, args, params=None, tokenizer: Optional[DiffusionTokenizer] = None,
                 refine_params=None):
        self.args = args
        if tokenizer is None and args.diff_ckpt:
            # prefer the table saved beside the checkpoint: class_size must
            # match the trained params, not whatever the live config says
            from ..train.checkpoints import resolve_ckpt_dir  # noqa: PLC0415
            tok_file = resolve_ckpt_dir(args.diff_ckpt) / "diffusion_tokenizer.json"
            if tok_file.exists():
                tokenizer = DiffusionTokenizer.from_pretrained(tok_file)
        self.tokenizer = tokenizer or DiffusionTokenizer(args.diffusion)
        self.dims = DiTDims.from_name(
            args.diffusion.model.model,
            context_size=args.diffusion.model.context_size,
            class_size=max(self.tokenizer.num_tokens, 1))
        if params is None:
            params = init_dit_params(jax.random.PRNGKey(args.seed or 0), self.dims)
        self.params = params
        self.refine_params = refine_params
        self.diffusion_steps = args.diffusion.model.diffusion_steps
        self.noise_schedule = args.diffusion.model.noise_schedule
        self.seq_len = args.diffusion.data.seq_len
        self.max_seq_len = args.max_seq_len
        self.overlap_buffer = args.overlap_buffer
        self.timesteps = args.timesteps
        self.cfg_scale = args.diff_cfg_scale
        self.refine_entry = getattr(args, "refine_entry", 0)
        # px moved per px of spacing error per step (diffusion/guidance.py);
        # 0 = off = reference-exact sampling
        self.distance_consistency = getattr(args, "distance_consistency", 0.0)
        self.refine_iters = args.refine_iters
        self.random_init = args.random_init
        self.types_first = args.train.data.types_first
        self.start_time = args.start_time
        self.end_time = args.end_time
        self.has_sv = args.train.data.add_sv
        self._key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
        self._seg_sampler = None  # one jitted program for every chunk

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- conditioning ------------------------------------------------------------

    def class_vector(self, config) -> np.ndarray:
        """(num_tokens,) multi-hot class vector (diffusion_pipeline.py:66)."""
        tok = self.tokenizer
        v = np.zeros(max(tok.num_tokens, 1), np.float32)
        if tok.num_classes > 0:
            v[tok.encode_style(config.beatmap_id)
              if config.beatmap_id is not None else tok.style_unk] = 1
        if tok.num_diff_classes > 0:
            v[tok.encode_diff(config.difficulty)
              if config.difficulty is not None else tok.diff_unk] = 1
        if tok.num_mapper_classes > 0:
            v[tok.encode_mapper_id(config.mapper_id)
              if config.mapper_id is not None else tok.mapper_unk] = 1
        if tok.num_descriptor_classes > 0:
            found = False
            for descriptor in config.descriptors or []:
                if descriptor in tok.descriptor_idx:
                    v[tok.encode_descriptor_name(descriptor)] = 1
                    found = True
            if not found:
                v[tok.descriptor_unk] = 1
        if tok.num_cs_classes > 0:
            v[tok.encode_cs(config.circle_size)
              if config.circle_size is not None else tok.cs_unk] = 1
        return v

    # -- vectorization (diffusion_pipeline.py:289 events_to_sequence) --------------

    def events_to_sequence(self, events: list[Event], timing,
                           slider_multiplier: float):
        event_times: list[int] = []
        update_event_times(events, event_times, types_first=self.types_first)
        groups, group_indices = get_groups(events, event_times=event_times,
                                           types_first=self.types_first)

        seq_indices: dict[int, int] = {}
        pending: list[int] = []
        rows: list[np.ndarray] = []
        head_time = 0.0
        last_anchor_time = 0.0
        last_pos = (256.0, 192.0)
        for i, group in enumerate(groups):
            pending.extend(group_indices[i])
            if group.event_type not in EVENT_INDEX:
                continue
            index = EVENT_INDEX[group.event_type]
            if group.event_type in NC_TYPES and group.new_combo:
                index += 1
            if group.event_type == EventType.SLIDER_END:
                span = last_anchor_time - head_time
                total = group.time - head_time
                repeats = max(int(round(total / span)), 1) if span > 0 else 1
                index += repeat_type(repeats)
            elif group.event_type == EventType.SLIDER_HEAD:
                head_time = group.time
            elif group.event_type == EventType.LAST_ANCHOR:
                last_anchor_time = group.time

            if not group.x or not group.y:
                group.x, group.y = 256, 192
            pos = (group.x, group.y)
            if not group.distance:
                group.distance = float(np.hypot(pos[0] - last_pos[0],
                                                pos[1] - last_pos[1]))
            row = np.zeros(20, np.float32)
            row[0], row[1] = pos
            row[2] = group.time
            row[3] = group.distance
            row[index + 4] = 1.0
            rows.append(row)
            for j in pending:
                seq_indices[j] = len(rows) - 1
            pending = []
            last_pos = pos
        for j in pending:
            seq_indices[j] = len(rows) - 1

        if not rows:
            return (np.zeros((0, 2), np.float32), np.zeros(0, np.float32),
                    np.zeros((0, self.dims.context_size), np.float32),
                    np.zeros(0, np.float32), 0, {}, [])

        seq = np.stack(rows)  # (T, 20)
        seq_x = seq[:, :2] / PLAYFIELD * 2 - 1
        seq_o = seq[:, 2]
        seq_d = seq[:, 3]
        emb_o = np.asarray(sinusoidal_embedding(jnp.asarray(seq_o * 0.1), 128))
        emb_d = np.asarray(sinusoidal_embedding(jnp.asarray(seq_d), 128))
        seq_c = np.concatenate([emb_o, emb_d, seq[:, 4:]], axis=-1)

        sliders = self._collect_sliders(groups, group_indices, seq_indices,
                                        timing, slider_multiplier)
        return (seq_x.astype(np.float32), seq_o, seq_c.astype(np.float32),
                seq_d.astype(np.float32), len(rows), seq_indices, sliders)

    def _collect_sliders(self, groups, group_indices, seq_indices, timing,
                         slider_multiplier) -> list[DiffusionSlider]:
        """Sliders whose length pins their end position during denoising
        (diffusion_pipeline.py:389-436)."""
        sliders: list[DiffusionSlider] = []
        if not self.has_sv or timing is None:
            return sliders
        slider_head = None
        last_anchor = None
        anchor_info: list[tuple[str, int]] = []
        for i, group in enumerate(groups):
            ht = group.event_type
            if ht == EventType.SLIDER_HEAD:
                anchor_info = [("Bezier", seq_indices[group_indices[i][0]])]
                slider_head = group
                last_anchor = None
            elif ht == EventType.BEZIER_ANCHOR:
                anchor_info.append(("Bezier", seq_indices[group_indices[i][0]]))
            elif ht == EventType.PERFECT_ANCHOR:
                anchor_info.append(("PerfectCurve", seq_indices[group_indices[i][0]]))
            elif ht == EventType.CATMULL_ANCHOR:
                anchor_info.append(("Catmull", seq_indices[group_indices[i][0]]))
            elif ht == EventType.RED_ANCHOR:
                anchor_info.append(("Bezier", seq_indices[group_indices[i][0]]))
                anchor_info.append(("Bezier", seq_indices[group_indices[i][0]]))
            elif ht == EventType.LAST_ANCHOR:
                anchor_info.append(("Bezier", seq_indices[group_indices[i][0]]))
                last_anchor = group
            elif ht == EventType.SLIDER_END and slider_head is not None and last_anchor is not None:
                curve_type = anchor_info[1][0] if len(anchor_info) > 1 else "Bezier"
                span = last_anchor.time - slider_head.time
                tp = self._timing_point_at(int(round(slider_head.time)), timing)
                redline = tp if tp.parent is None else tp.parent
                if slider_head.scroll_speed is not None and span > 0:
                    length = (slider_head.scroll_speed * span * 100
                              / redline.ms_per_beat * slider_multiplier)
                    sliders.append(DiffusionSlider(
                        np.array([a[1] for a in anchor_info]),
                        seq_indices[group_indices[i][0]], curve_type, length))
                slider_head = None
                last_anchor = None
                anchor_info = []
        return sliders

    @staticmethod
    def _timing_point_at(time, timing):
        for tp in reversed(timing):
            if tp.offset <= time:
                return tp
        return timing[0]

    # -- sampling ------------------------------------------------------------------

    def generate(self, events: list[Event], generation_config, timing,
                 verbose: bool = False, return_positions: bool = False):
        """events -> events with refined positions. With
        return_positions=True also returns the raw (T, 2) px position
        array and the input sequence rows (for eval scripts)."""
        (seq_x, seq_o, seq_c, seq_d, seq_len, seq_indices,
         sliders) = self.events_to_sequence(
            events, timing, generation_config.slider_multiplier)
        # distance-guidance targets: row i's distance from row i-1; row 0
        # has no predecessor pair -> sentinel -1 (guidance.py skips it)
        d_tgt = seq_d.copy()
        if len(d_tgt):
            d_tgt[0] = -1.0
        if verbose:
            print(f"diffusion seq len {seq_len}")
        if seq_len == 0:
            if return_positions:
                return events, np.zeros((0, 2), np.float32), seq_x
            return events

        schedule = DiffusionSchedule.create(
            noise_schedule=self.noise_schedule,
            diffusion_steps=self.diffusion_steps,
            respacing=self.timesteps)

        class_vec = self.class_vector(generation_config)
        null_vec = self.class_vector(dataclasses.replace(
            generation_config, beatmap_id=None, mapper_id=None,
            descriptors=generation_config.negative_descriptors))
        y = jnp.asarray(np.stack([class_vec, null_vec]))  # (2, class)

        full_band = banded_attention_mask(seq_len, self.seq_len)
        z_full = np.repeat(seq_x[None], 2, axis=0)  # (2, T, 2)
        if self.random_init:
            z_full = np.asarray(jax.random.normal(self._next_key(), z_full.shape))
        c_full = np.repeat(seq_c[None], 2, axis=0)

        full_samples = z_full.copy()
        stride = self.max_seq_len - self.overlap_buffer * 2
        for i in range(0, max(seq_len - self.overlap_buffer * 2, 1), max(stride, 1)):
            end = min(i + self.max_seq_len, seq_len)
            if i > 0:
                lo = i + self.overlap_buffer
                hi = i + self.overlap_buffer * 2
                full_samples[:, lo:hi] = z_full[:, lo:hi]
            part = self._sample_part(
                schedule, full_samples[:, i:end], c_full[:, i:end],
                seq_o[i:end], y, full_band[i:end, i:end],
                z_full[:, i:end], sliders, i, end,
                start_mask_size=self.overlap_buffer if i > 0 else 0,
                d_tgt=d_tgt[i:end])
            full_samples[:, i:end] = part
            if end >= seq_len:
                break

        positions = (full_samples[0] + 1) / 2 * PLAYFIELD  # (T, 2)
        out_events = self.events_with_pos(events, positions, seq_indices)
        if return_positions:
            return out_events, positions, (seq_x + 1) / 2 * PLAYFIELD
        return out_events

    def _unified_sampler(self, schedule):
        """The one jitted chunk-sampling program, reused for every chunk of
        every song/run: all chunk-varying tensors (x, conditioning, band,
        in-paint mask, reference positions) arrive as same-shaped padded
        arguments, so the scan compiles once per process and AOT-persists.
        `schedule` is captured on first use — it is fixed per pipeline
        (derived from args.timesteps). Memoized at module level so callers
        that build a fresh pipeline per song (generate()) still reuse the
        traced/compiled program."""
        if self._seg_sampler is None:
            dims, cfg_scale = self.dims, self.cfg_scale
            cache_key = (dims, cfg_scale, self.noise_schedule,
                         self.diffusion_steps, tuple(self.timesteps),
                         self.distance_consistency)
            cached = _SEG_SAMPLER_CACHE.get(cache_key)
            if cached is not None:
                self._seg_sampler = cached
                return cached

            from .guidance import distance_guide  # noqa: PLC0415
            from .slider_jax import project_slider_ends  # noqa: PLC0415
            dc_weight = self.distance_consistency

            def seg_fn(params, x, key, ts, c, y, band, mask, z_ref, tables,
                       d_tgt):
                def inpaint(xx):
                    # spacing guidance first (no-op at weight 0), then the
                    # in-paint freeze re-pins every non-generated row, then
                    # the slider-end projection restores exact geometry
                    xx = distance_guide(xx, d_tgt, dc_weight)
                    xx = jnp.where(mask, xx, z_ref)
                    # per-step slider-end projection ON DEVICE (the
                    # reference runs this as a host callback every step;
                    # empty tables are the identity)
                    return project_slider_ends(xx, tables)

                def model_fn(xx, tt):
                    return dit_forward_cfg(params, dims, xx, tt, c, y,
                                           cfg_scale, attn_mask=band)

                return p_sample_segment(schedule, model_fn, x, key, ts,
                                        clip_denoised=True,
                                        denoised_fn=inpaint)

            self._seg_sampler = jax.jit(seg_fn)
            _SEG_SAMPLER_CACHE[cache_key] = self._seg_sampler
        return self._seg_sampler

    def _sample_part(self, schedule, z_part, c_part, o_part, y, band,
                     z_ref, sliders, start, end, start_mask_size,
                     d_tgt=None):
        """Sample one chunk. mask True = generate; in-painted elsewhere."""
        t_len = z_part.shape[1]
        if d_tgt is None:
            d_tgt = np.full(t_len, -1.0, np.float32)
        else:
            d_tgt = np.asarray(d_tgt, np.float32).copy()
            # the chunk's first row pairs with a row outside the chunk
            d_tgt[0] = -1.0
        mask = np.zeros_like(z_part, dtype=bool)
        mask[:, start_mask_size:] = True
        if self.start_time is not None:
            idx = int(np.searchsorted(o_part, self.start_time, side="left"))
            mask[:, :idx] = False
        if self.end_time is not None:
            idx = int(np.searchsorted(o_part, self.end_time, side="right"))
            mask[:, idx:] = False
        if not mask.any():
            return z_part

        chunk_sliders = [s for s in sliders
                         if not (np.any((s.seq_indices < start) | (s.seq_indices >= end))
                                 or s.end_index < start or s.end_index >= end)]

        def host_fix_slider_ends(x_np: np.ndarray) -> np.ndarray:
            pos = (x_np[0] + 1) / 2 * PLAYFIELD
            for s in chunk_sliders:
                path = SliderPath(s.curve_type, pos[s.seq_indices - start])
                max_length = path.distance
                if max_length == 0:
                    continue
                pos[s.end_index - start] = path.position_at(s.length / max_length)
            fixed = pos / PLAYFIELD * 2 - 1
            return np.repeat(fixed[None].astype(x_np.dtype), x_np.shape[0], axis=0)

        # host callbacks are unsupported on this image's TPU backend (axon
        # PJRT reports backend 'tpu' but rejects pure_callback); keep the
        # exact-geometry callback path for CPU/GPU and the unified program
        # with the device-side projection (slider_jax) on TPU.
        # BH_UNIFIED_SAMPLER=1 forces the unified path (tests/A-B).
        import os  # noqa: PLC0415
        callbacks_ok = (jax.default_backend() not in ("axon", "tpu")
                        and os.environ.get("BH_UNIFIED_SAMPLER") != "1")

        x0 = np.where(mask, np.asarray(z_part, np.float32),
                      np.asarray(z_ref, np.float32))
        if chunk_sliders:
            x0 = host_fix_slider_ends(x0)

        # refinement enters the chain low (see InferenceConfig.refine_entry)
        entry = schedule.num_steps
        if not self.random_init and self.refine_entry:
            entry = max(1, min(int(self.refine_entry), entry))

        if chunk_sliders and callbacks_ok:
            mask_j = jnp.asarray(mask)
            z_ref_j = jnp.asarray(z_ref)
            d_tgt_j = jnp.asarray(d_tgt)
            from .guidance import distance_guide  # noqa: PLC0415

            def denoised_fn(x):
                x = distance_guide(x, d_tgt_j, self.distance_consistency)
                x = jnp.where(mask_j, x, z_ref_j)
                return jax.pure_callback(
                    host_fix_slider_ends,
                    jax.ShapeDtypeStruct(x.shape, x.dtype), x)

            def model_fn(x, t):
                return dit_forward_cfg(self.params, self.dims, x, t,
                                       jnp.asarray(c_part), y, self.cfg_scale,
                                       attn_mask=jnp.asarray(band))

            samples = np.asarray(p_sample_segment(
                schedule, model_fn, jnp.asarray(x0), self._next_key(),
                jnp.arange(entry - 1, -1, -1),
                clip_denoised=True, denoised_fn=denoised_fn))
        else:
            # ONE padded jitted program for every chunk of every song (see
            # _unified_sampler): chunk-varying tensors are arguments, pad
            # rows are frozen by the in-paint mask and excluded from the
            # attention band. Slider-end projection happens on device every
            # step inside the scan (slider_jax.py), replacing the r3 host
            # round-trips (~50-100 ms each through the device tunnel).
            S = max(self.max_seq_len, t_len)
            pad = S - t_len

            def pad_t(a):
                if not pad:
                    return np.asarray(a)
                widths = ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2)
                return np.pad(np.asarray(a), widths)

            mask_p = jnp.asarray(pad_t(mask))  # pad rows False -> frozen
            zref_p = jnp.asarray(pad_t(np.asarray(z_ref, np.float32)))
            c_p = jnp.asarray(pad_t(np.asarray(c_part, np.float32)))
            band_p = np.zeros((S, S), dtype=bool)
            band_p[:t_len, :t_len] = np.asarray(band)
            band_p = jnp.asarray(band_p)

            seg = self._unified_sampler(schedule)
            # slider-end projection runs inside the jitted scan every step
            # (diffusion/slider_jax.py) — no host round-trips mid-chain;
            # indices stay valid under the padded length (all < t_len)
            from .slider_jax import build_slider_tables  # noqa: PLC0415
            tables = {k: jnp.asarray(v) for k, v in build_slider_tables(
                chunk_sliders, start, t_len).items()}
            # pad rows carry the skip sentinel so the pad/real boundary
            # pair never pulls the last real object toward the pad origin
            d_p = np.full(S, -1.0, np.float32)
            d_p[:t_len] = d_tgt
            x = jnp.asarray(pad_t(x0))
            ts = jnp.arange(entry - 1, -1, -1)
            x = seg(self.params, x, self._next_key(), ts,
                    c_p, y, band_p, mask_p, zref_p, tables,
                    jnp.asarray(d_p))
            samples = np.asarray(x)[:, :t_len]
            if chunk_sliders:
                # final projection stays on host: exact osu! geometry
                samples = host_fix_slider_ends(samples)

        if self.refine_params is not None:
            mask_j = jnp.asarray(mask)
            z_ref_j = jnp.asarray(z_ref)
            from .slider_jax import build_slider_tables  # noqa: PLC0415
            rtables = {k: jnp.asarray(v) for k, v in build_slider_tables(
                chunk_sliders, start, t_len).items()}
            from .slider_jax import project_slider_ends  # noqa: PLC0415

            from .guidance import distance_guide  # noqa: PLC0415
            d_tgt_j = jnp.asarray(d_tgt)

            def inpaint_r(x):
                x = distance_guide(x, d_tgt_j, self.distance_consistency)
                return project_slider_ends(
                    jnp.where(mask_j, x, z_ref_j), rtables)

            def refine_fn(x, t):
                return dit_forward_cfg(self.refine_params, self.dims, x, t,
                                       jnp.asarray(c_part), y, self.cfg_scale,
                                       attn_mask=jnp.asarray(band))

            from .sampler import p_sample_step  # noqa: PLC0415
            samples_j = jnp.asarray(samples)
            for _ in range(self.refine_iters):
                samples_j = p_sample_step(
                    schedule, refine_fn, samples_j,
                    jnp.zeros((), jnp.int32), self._next_key(),
                    clip_denoised=True, denoised_fn=inpaint_r)
            samples = np.asarray(samples_j)
            if chunk_sliders:
                samples = host_fix_slider_ends(samples)
        return np.asarray(samples, np.float32)

    @staticmethod
    def events_with_pos(events: list[Event], positions: np.ndarray,
                        seq_indices: dict[int, int]) -> list[Event]:
        new_events = []
        for i, event in enumerate(events):
            if event.type == EventType.DISTANCE:
                idx = seq_indices[i]
                new_events.append(Event(EventType.POS_X, int(round(positions[idx, 0]))))
                new_events.append(Event(EventType.POS_Y, int(round(positions[idx, 1]))))
            elif event.type == EventType.POS_X:
                new_events.append(Event(EventType.POS_X,
                                        int(round(positions[seq_indices[i], 0]))))
            elif event.type == EventType.POS_Y:
                new_events.append(Event(EventType.POS_Y,
                                        int(round(positions[seq_indices[i], 1]))))
            else:
                new_events.append(event)
        return new_events
