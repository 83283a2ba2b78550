"""Top-level inference orchestrator: audio file -> .osu beatmap.

(reference: inference.py:323 generate, :449 load_model, :272 get_config)
Flow: preprocess audio into windows -> (optional) timing pre-pass or super
timing -> windowed token generation -> timing inference + resnap ->
(optional) diffusion coordinate refinement -> postprocess to .osu.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from ..config import InferenceConfig, as_dict
from ..data.event_utils import events_of_type, merge_events
from ..events import ContextType, TIMING_TYPES
from ..models.transformer import ModelDims, init_params
from ..osu.beatmap import Beatmap
from ..tokenizer import Tokenizer
from .postprocessor import BeatmapConfig, Postprocessor
from .preprocessor import Preprocessor
from .processor import GenerationConfig, Processor


def _resolve(path):
    """Checkpoint path with durable-artifact-mirror fallback (the /tmp
    scratch copies do not survive VM restarts)."""
    from ..train.checkpoints import resolve_ckpt_dir  # noqa: PLC0415
    return resolve_ckpt_dir(path)


def load_tokenizer(args: InferenceConfig) -> Tokenizer:
    path = _resolve(args.model_path) if args.model_path else None
    if path is not None and (path / "tokenizer.json").is_file():
        return Tokenizer.from_pretrained(path)
    return Tokenizer(args.train)


def load_model(args: InferenceConfig, tokenizer: Tokenizer):
    """Load model params from an orbax checkpoint dir, or initialize randomly
    when no checkpoint is given (useful for pipeline testing before
    training)."""
    dims = ModelDims.from_config(args.train, tokenizer)
    path = _resolve(args.model_path) if args.model_path else None
    if path is not None and path.is_dir() and (
            (path / "params").exists()
            or any(p.name.startswith("state_") for p in path.iterdir())):
        from ..train.checkpoints import restore_params  # noqa: PLC0415
        return restore_params(path, dims), dims
    if path is not None and (path.is_file() or (path.is_dir() and any(
            (path / n).exists() for n in ("pytorch_model.bin", "model.safetensors")))):
        # reference-format PyTorch checkpoint: convert in place
        from ..train.convert import load_reference_checkpoint  # noqa: PLC0415
        import jax.numpy as jnp  # noqa: PLC0415
        params = jax.tree.map(jnp.asarray, load_reference_checkpoint(path, dims))
        return params, dims
    seed = args.seed if args.seed is not None else 0
    params = init_params(jax.random.PRNGKey(seed), dims)
    return params, dims


_DIFF_MODEL_CACHE: dict = {}


def load_diffusion_model(args: InferenceConfig):
    """Load DiT coordinate-model params from args.diff_ckpt and, when
    position_refinement is enabled, the separate refine-model params from
    args.diff_refine_ckpt (reference: inference.py diff_ckpt/diff_refine_ckpt
    + osu_diffusion DiT checkpoints). Either may be absent -> None (the
    DiffusionPipeline falls back to random init, useful for smoke tests).

    Loads are memoized per (ckpt paths, model name): restoring DiT-B re-uploads
    ~0.5 GB to the device, which must not happen per generated song (callers
    like the web UI and eval loops call generate() repeatedly)."""
    key = (args.diff_ckpt, args.diff_refine_ckpt if args.position_refinement
           else None, args.diffusion.model.model)
    if key in _DIFF_MODEL_CACHE:
        return _DIFF_MODEL_CACHE[key]
    from ..train.checkpoints import restore_params  # noqa: PLC0415

    def _restore(ckpt):
        p = _resolve(ckpt) if ckpt else None
        if p is not None and p.is_dir() and (
                (p / "params").exists()
                or any(q.name.startswith("state_") for q in p.iterdir())):
            tree = restore_params(p)
            # the DiT trainer checkpoints {'params', 'ema'}; sample with the
            # EMA weights like the reference (osu_diffusion train.py:32
            # update_ema; sampling loads the ema state dict)
            if isinstance(tree, dict) and "ema" in tree:
                return tree["ema"]
            if isinstance(tree, dict) and set(tree) == {"params"}:
                return tree["params"]
            return tree
        return None

    diff_params = _restore(args.diff_ckpt)
    refine_params = _restore(args.diff_refine_ckpt) \
        if args.position_refinement else None
    _DIFF_MODEL_CACHE[key] = (diff_params, refine_params)
    return diff_params, refine_params


def build_configs(args: InferenceConfig) -> tuple[GenerationConfig, BeatmapConfig]:
    gen = GenerationConfig(
        gamemode=args.gamemode if args.gamemode is not None else 0,
        beatmap_id=args.beatmap_id,
        difficulty=args.difficulty,
        mapper_id=args.mapper_id,
        year=args.year,
        hitsounded=args.hitsounded if args.hitsounded is not None else True,
        hp_drain_rate=args.hp_drain_rate,
        circle_size=args.circle_size,
        overall_difficulty=args.overall_difficulty,
        approach_rate=args.approach_rate,
        slider_multiplier=args.slider_multiplier or 1.4,
        slider_tick_rate=args.slider_tick_rate or 1,
        keycount=args.keycount if args.keycount is not None else 4,
        hold_note_ratio=args.hold_note_ratio,
        scroll_speed_ratio=args.scroll_speed_ratio,
        descriptors=args.descriptors,
        negative_descriptors=args.negative_descriptors,
    )
    bm = BeatmapConfig(
        title=args.title, artist=args.artist,
        title_unicode=args.title, artist_unicode=args.artist,
        audio_filename=Path(args.audio_path).name if args.audio_path else "",
        hp_drain_rate=args.hp_drain_rate or 5,
        circle_size=(args.keycount if args.gamemode == 3 else args.circle_size) or 4,
        overall_difficulty=args.overall_difficulty or 8,
        approach_rate=args.approach_rate or 9,
        slider_multiplier=args.slider_multiplier or 1.4,
        slider_tick_rate=args.slider_tick_rate or 1,
        creator=args.creator, version=args.version,
        tags=provenance_tags(args),
        background=args.background,
        preview_time=args.preview_time,
        bpm=args.bpm, offset=args.offset,
        mode=args.gamemode or 0,
    )
    return gen, bm


def provenance_tags(args: InferenceConfig) -> str:
    """Non-default inference args embedded in the Tags field for provenance
    (reference inference.py:272-279)."""
    defaults = as_dict(InferenceConfig())
    current = as_dict(args)
    skip = {"train", "diffusion", "model_path", "audio_path", "output_path",
            "beatmap_path", "device", "title", "artist", "creator", "version"}
    tags = []
    for k, v in current.items():
        if k in skip or isinstance(v, dict):
            continue
        if defaults.get(k) != v and v is not None:
            tags.append(f"{k}={v}")
    return " ".join(tags)


def generate(args: InferenceConfig, *, audio_path=None, beatmap_path=None,
             output_path=None,
             generation_config: Optional[GenerationConfig] = None,
             beatmap_config: Optional[BeatmapConfig] = None,
             params=None, tokenizer: Optional[Tokenizer] = None,
             diff_params=None, diff_tokenizer=None,
             verbose: bool = True):
    """Full song -> .osu run. Returns (osu_text, osu_path, osz_path)."""
    audio_path = audio_path or args.audio_path
    beatmap_path = beatmap_path or args.beatmap_path
    output_path = output_path if output_path is not None else args.output_path

    if not Path(audio_path).is_file():
        raise FileNotFoundError(f"Provided audio file path does not exist: {audio_path}")
    if beatmap_path:
        p = Path(beatmap_path)
        if not p.is_file():
            raise FileNotFoundError(f"Provided beatmap file path does not exist: {beatmap_path}")
        if p.suffix.lower() != ".osu":
            raise ValueError(f"Beatmap file must have .osu extension: {beatmap_path}")

    if tokenizer is None:
        tokenizer = load_tokenizer(args)
    if params is None:
        params, _ = load_model(args, tokenizer)
    if generation_config is None or beatmap_config is None:
        gc, bc = build_configs(args)
        generation_config = generation_config or gc
        beatmap_config = beatmap_config or bc
    if not beatmap_config.audio_filename and audio_path:
        beatmap_config.audio_filename = Path(audio_path).name

    preprocessor = Preprocessor(args, parallel=args.parallel)
    client = None
    if args.use_server:
        from .server import InferenceClient  # noqa: PLC0415
        client = InferenceClient(args)
    processor = Processor(args, params, tokenizer, client=client)
    if args.warmup_windows and client is None:
        processor.warmup(args.warmup_windows)
    postprocessor = Postprocessor(args)

    audio = preprocessor.load(audio_path)
    sequences = preprocessor.segment(audio)
    extra_in_context = {}
    output_type = list(args.output_type)

    timing_events = None
    timing = None
    if args.super_timing and ContextType.NONE in args.in_context:
        from .super_timing import SuperTimingGenerator  # noqa: PLC0415
        stg = SuperTimingGenerator(args, params, tokenizer)
        timing_events, _ = stg.generate(audio, generation_config, verbose=verbose)
        timing = postprocessor.generate_timing(timing_events)
        extra_in_context[ContextType.TIMING] = timing
        if ContextType.TIMING in output_type:
            output_type.remove(ContextType.TIMING)
    elif (ContextType.NONE in args.in_context and ContextType.MAP in output_type
          and not any((ContextType.NONE in _ins(ctx) or len(_ins(ctx)) == 0)
                      and ContextType.MAP in _outs(ctx)
                      for ctx in args.train.data.context_types)):
        # the model has no direct none->map template: run a timing pre-pass
        timing_events, timing_times = processor.generate(
            sequences=sequences, generation_config=generation_config,
            in_context=[ContextType.NONE], out_context=[ContextType.TIMING],
            verbose=verbose)[0]
        timing_events, timing_times = events_of_type(
            timing_events, timing_times, TIMING_TYPES)
        timing = postprocessor.generate_timing(timing_events)
        extra_in_context[ContextType.TIMING] = timing
        if ContextType.TIMING in output_type:
            output_type.remove(ContextType.TIMING)
    elif ContextType.TIMING in args.in_context or (
            args.train.data.add_timing and any(
                t in args.in_context for t in (ContextType.GD, ContextType.NO_HS))):
        timing = [tp for tp in Beatmap.from_path(beatmap_path).timing_points
                  if tp.parent is None]

    if output_type:
        result = processor.generate(
            sequences=sequences, generation_config=generation_config,
            in_context=args.in_context, out_context=output_type,
            beatmap_path=beatmap_path, extra_in_context=extra_in_context,
            verbose=verbose)
        events, _ = functools.reduce(merge_events, result)
        if timing is None and (ContextType.TIMING in args.output_type
                               or args.train.data.add_timing):
            timing = postprocessor.generate_timing(events)
        if args.resnap_events and timing is not None:
            events = postprocessor.resnap_events(events, timing)
    else:
        events = timing_events or []

    if (args.generate_positions and (args.gamemode or 0) in (0, 2)
            and ContextType.MAP in output_type):
        try:
            from ..diffusion.pipeline import DiffusionPipeline  # noqa: PLC0415
            refine_params = None
            if diff_params is None:
                diff_params, refine_params = load_diffusion_model(args)
                if verbose and diff_params is not None:
                    print(f"Loaded diffusion model from {args.diff_ckpt}")
                if verbose and refine_params is not None:
                    print(f"Loaded position-refine model from "
                          f"{args.diff_refine_ckpt}")
            if diff_tokenizer is None:
                # the DiT trainer saves its conditioning tables next to the
                # checkpoint (reference inference.py:516 load_diff_model
                # restores the pickled tokenizer); without them the class
                # vector is sized for empty tables and mismatches the params
                from ..diffusion.tokenizer import DiffusionTokenizer  # noqa: PLC0415
                tok_file = _resolve(args.diff_ckpt) / "diffusion_tokenizer.json"
                if tok_file.is_file():
                    diff_tokenizer = DiffusionTokenizer.from_pretrained(
                        tok_file)
            pipeline = DiffusionPipeline(args, diff_params, diff_tokenizer,
                                         refine_params=refine_params)
            events = pipeline.generate(events=events,
                                       generation_config=generation_config,
                                       timing=timing, verbose=verbose)
        except ImportError:
            if verbose:
                print("Diffusion refiner unavailable; keeping decoded positions.")

    result = postprocessor.generate(events=events, beatmap_config=beatmap_config,
                                    timing=timing)

    # BeatHeritage V1 enhancement passes (inference/enhance.py; no-op unless
    # quality_control / advanced_features toggles are set)
    from .enhance import enhance_result  # noqa: PLC0415
    result = enhance_result(result, args, verbose=verbose)

    result_path = None
    osz_path = None
    if args.add_to_beatmap:
        result_path = postprocessor.add_to_beatmap(result, beatmap_path)
        if verbose:
            print(f"Added generated content to {result_path}")
    elif output_path:
        result_path = postprocessor.write_result(result, output_path)
        if verbose:
            print(f"Generated beatmap saved to {result_path}")
    if args.export_osz and result_path:
        osz_path = postprocessor.export_osz(result_path, audio_path, output_path)
        if verbose:
            print(f"Generated .osz saved to {osz_path}")

    return result, result_path, osz_path


VALID_AUDIO_EXTENSIONS = {".mp3", ".wav", ".ogg", ".m4a", ".flac"}


def autofill_paths(args: InferenceConfig) -> dict:
    """Autofill audio/output paths from the reference beatmap
    (reference: inference.py:64). Returns {'success', 'errors'}."""
    errors = []
    beatmap_path = Path(args.beatmap_path) if args.beatmap_path else None
    output_path = Path(args.output_path) if args.output_path else None
    audio_path = Path(args.audio_path) if args.audio_path else None

    def valid_beatmap(p):
        return p is None or (p.exists() and p.suffix.lower() == ".osu")

    if beatmap_path and valid_beatmap(beatmap_path):
        try:
            bm = Beatmap.from_path(beatmap_path)
            if not audio_path:
                audio_path = beatmap_path.parent / bm.audio_filename
            if not output_path:
                output_path = beatmap_path.parent
        except Exception as e:
            errors.append(f"Error reading beatmap file: {e}")
    elif audio_path and audio_path.exists() and not output_path:
        output_path = audio_path.parent

    if not audio_path:
        errors.append("Audio file path is required.")
    elif not audio_path.exists():
        errors.append(f"Audio file not found: {audio_path}")
    elif audio_path.suffix.lower() not in VALID_AUDIO_EXTENSIONS:
        errors.append(f"Audio file must have one of "
                      f"{sorted(VALID_AUDIO_EXTENSIONS)}: {audio_path}")
    if beatmap_path:
        if not beatmap_path.exists():
            errors.append(f"Beatmap file not found: {beatmap_path}")
        elif not valid_beatmap(beatmap_path):
            errors.append(f"Beatmap file must have .osu extension: {beatmap_path}")

    args.audio_path = str(audio_path) if audio_path else ""
    args.output_path = str(output_path) if output_path else ""
    args.beatmap_path = str(beatmap_path) if beatmap_path else ""
    return {"success": not errors, "errors": errors}


def get_args_from_beatmap(args: InferenceConfig, tokenizer: Tokenizer,
                          verbose: bool = True) -> None:
    """Fill unset conditioning args from the reference beatmap's metadata,
    or fair defaults without one (reference: inference.py:127)."""
    from ..events import ContextType as CT  # noqa: PLC0415
    from .processor import generation_config_from_beatmap  # noqa: PLC0415

    result = autofill_paths(args)
    if not result["success"]:
        for error in result["errors"]:
            print(f"Error: {error}")
        raise ValueError("Invalid paths provided. Please check the errors above.")

    def fill(name, value):
        if getattr(args, name) is None:
            setattr(args, name, value)
            if verbose:
                print(f"Using {name.replace('_', ' ')} {value}")

    if not args.beatmap_path:
        fill("gamemode", 0)
        fill("hp_drain_rate", 5)
        fill("circle_size", 4)
        fill("overall_difficulty", 8)
        fill("approach_rate", 9)
        fill("slider_multiplier", 1.4)
        fill("slider_tick_rate", 1)
        fill("hitsounded", True)
        if args.keycount is None and args.gamemode == 3:
            fill("keycount", 4)
        return

    beatmap = Beatmap.from_path(args.beatmap_path)
    if (beatmap.mode not in args.train.data.gamemodes
            and (any(c in (CT.MAP, CT.GD, CT.NO_HS) for c in args.in_context)
                 or args.add_to_beatmap)):
        raise ValueError(
            f"Beatmap mode {beatmap.mode} is not supported by the model. "
            f"Supported modes: {args.train.data.gamemodes}")
    gc = generation_config_from_beatmap(beatmap, tokenizer)
    fill("gamemode", gc.gamemode)
    if args.beatmap_id is None and gc.beatmap_id:
        fill("beatmap_id", gc.beatmap_id)
    if args.mapper_id is None and beatmap.beatmap_id in tokenizer.beatmap_mapper:
        fill("mapper_id", gc.mapper_id)
    if args.descriptors is None and beatmap.beatmap_id in tokenizer.beatmap_descriptors:
        fill("descriptors", gc.descriptors)
    fill("hp_drain_rate", gc.hp_drain_rate)
    fill("circle_size", gc.circle_size)
    fill("overall_difficulty", gc.overall_difficulty)
    fill("approach_rate", gc.approach_rate)
    fill("slider_multiplier", gc.slider_multiplier)
    fill("slider_tick_rate", gc.slider_tick_rate)
    fill("hitsounded", gc.hitsounded)
    if args.gamemode == 3:
        fill("keycount", gc.keycount)
        fill("hold_note_ratio", gc.hold_note_ratio)
    if args.gamemode in (1, 3):
        fill("scroll_speed_ratio", gc.scroll_speed_ratio)
    if not args.title:
        args.title = beatmap.title
    if not args.artist:
        args.artist = beatmap.artist
    if args.preview_time < 0:
        args.preview_time = int(beatmap.preview_time)


def _ins(ctx) -> list:
    vals = ctx.get("in", []) if isinstance(ctx, dict) else []
    return [ContextType(v) if isinstance(v, str) else v for v in vals]


def _outs(ctx) -> list:
    vals = ctx.get("out", []) if isinstance(ctx, dict) else []
    return [ContextType(v) if isinstance(v, str) else v for v in vals]
