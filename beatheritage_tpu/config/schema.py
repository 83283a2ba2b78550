"""Structured config schemas (dataclasses).

Field names preserve the reference's public Hydra CLI surface (reference:
config.py:58 InferenceConfig, osuT5/osuT5/config.py:231 TrainConfig,
osu_diffusion/config.py:81 DiffusionTrainConfig) so command lines like
`gamemode=3 difficulty=5.5 in_context=[timing] cfg_scale=1.2` keep working,
while defaults are adapted for TPU (bf16, jit, mesh axes).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

from ..events import ContextType


@dataclass
class SpectrogramConfig:
    implementation: str = "pallas"  # mel frontend implementation (pallas/xla)
    log_scale: bool = False
    sample_rate: int = 16000
    hop_length: int = 128
    n_fft: int = 1024
    n_mels: int = 388
    f_min: int = 0
    f_max: int = 8000
    pad_mode: str = "constant"


@dataclass
class TransformerConfig:
    """Architecture hyperparameters of the Whisper-style backbone.

    Replaces the reference's HF backbone-name + overwrite-dict mechanism
    (modeling_mapperatorinator.py:19 get_backbone_model) with explicit fields.
    """

    d_model: int = 512
    num_heads: int = 8
    d_ff: int = 2048
    encoder_layers: int = 8
    decoder_layers: int = 8
    dropout: float = 0.0
    activation: str = "gelu"
    # positions: "rope" (ropewhisper-equivalent), "absolute" (whisper)
    position_encoding: str = "rope"
    rope_theta: float = 10000.0


@dataclass
class ModelConfig:
    name: str = "ropewhisper-small"  # informational model identity
    arch: TransformerConfig = field(default_factory=TransformerConfig)
    input_features: bool = True
    project_encoder_input: bool = True
    embed_decoder_input: bool = True
    manual_norm_weights: bool = False
    do_style_embed: bool = False
    do_difficulty_embed: bool = False
    do_mapper_embed: bool = False
    do_song_position_embed: bool = False
    cond_dim: int = 128
    cond_size: int = 0
    rope_type: str = "dynamic"  # RoPE length extension (dynamic/static)
    rope_encoder_scaling_factor: float = 1.0
    rope_decoder_scaling_factor: float = 1.0
    spectrogram: SpectrogramConfig = field(default_factory=SpectrogramConfig)
    overwrite: dict = field(default_factory=dict)
    add_config: dict = field(default_factory=dict)


@dataclass
class DataConfig:
    dataset_type: str = "mmrs"
    train_dataset_path: str = ""
    train_dataset_start: int = 0
    train_dataset_end: int = 38689
    test_dataset_path: str = ""
    test_dataset_start: int = 38689
    test_dataset_end: int = 39389
    src_seq_len: int = 1024
    tgt_seq_len: int = 2048
    sample_rate: int = 16000
    hop_length: int = 128
    # ship train audio windows as int16 PCM (half the host->device bytes;
    # the mel frontend converts on device). Audio sources are 16-bit, so
    # the quantization is at most 3e-5 — but off by default to keep
    # numerics byte-stable for parity tests
    pcm_int16: bool = False
    cycle_length: int = 16
    per_track: bool = True
    only_last_beatmap: bool = False
    center_pad_decoder: bool = False
    num_classes: int = 152680
    num_diff_classes: int = 24
    max_diff: int = 12
    num_cs_classes: int = 21
    class_dropout_prob: float = 0.2
    diff_dropout_prob: float = 0.2
    mapper_dropout_prob: float = 0.2
    cs_dropout_prob: float = 0.2
    year_dropout_prob: float = 0.2
    hold_note_ratio_dropout_prob: float = 0.2
    scroll_speed_ratio_dropout_prob: float = 0.2
    descriptor_dropout_prob: float = 0.2
    add_out_context_types: bool = True
    add_gamemode_token: bool = True
    add_style_token: bool = False
    add_diff_token: bool = True
    add_mapper_token: bool = True
    add_year_token: bool = True
    add_hitsounded_token: bool = True
    add_song_length_token: bool = True
    add_global_sv_token: bool = True
    add_cs_token: bool = True
    add_keycount_token: bool = True
    add_hold_note_ratio_token: bool = True
    add_scroll_speed_ratio_token: bool = True
    add_descriptors: bool = True
    add_sv_special_token: bool = True
    add_kiai_special_token: bool = True
    add_song_position_token: bool = True
    add_empty_sequences: bool = True
    add_empty_sequences_at_step: int = -1
    add_pre_tokens: bool = False
    add_pre_tokens_at_step: int = -1
    max_pre_token_len: int = -1
    timing_random_offset: int = 2
    timing_random_offset_2: int = 0
    timing_random_offset_prob: float = 1.0
    add_gd_context: bool = False
    min_difficulty: float = 0
    max_difficulty: float = 100
    sample_weights_path: str = ""
    rhythm_weight: float = 3.0
    label_smoothing: float = 0.0
    lookback: float = 0
    lookahead: float = 0
    lookback_prob: float = 0.0
    # list of either "context" strings or {"in": [...], "out": [...]} dicts
    context_types: list = field(default_factory=lambda: [
        {"in": ["none"], "out": ["timing", "kiai", "map", "sv"]},
        {"in": ["no_hs"], "out": ["timing", "kiai", "map", "sv"]},
        {"in": ["gd"], "out": ["timing", "kiai", "map", "sv"]},
    ])
    context_weights: list = field(default_factory=lambda: [4, 1, 1])
    descriptors_path: str = ""
    mappers_path: str = ""
    add_timing: bool = False
    add_snapping: bool = True
    add_timing_points: bool = True
    add_hitsounds: bool = True
    add_distances: bool = True
    add_positions: bool = True
    position_precision: int = 32
    position_split_axes: bool = False
    position_range: list = field(default_factory=lambda: [-256, 768, -256, 640])
    dt_augment_prob: float = 0.5
    dt_augment_range: list = field(default_factory=lambda: [1.25, 1.5])
    dt_augment_sqrt: bool = False
    types_first: bool = True
    add_kiai: bool = True
    gamemodes: list = field(default_factory=lambda: [0, 1, 2, 3])
    mania_bpm_normalized_scroll_speed: bool = True
    add_sv: bool = True
    add_mania_sv: bool = False
    min_year: Optional[int] = None
    max_year: Optional[int] = None
    frame_offset_augment_prob: float = 1.0
    normalize_audio: bool = True
    slider_version: int = 1


@dataclass
class DataloaderConfig:
    num_workers: int = 8
    prefetch_factor: int = 2
    drop_last: bool = False


@dataclass
class OptimizerConfig:
    name: str = "adamwscale"
    base_lr: float = 1e-2
    base_lr_2: float = 3e-4
    batch_size: int = 128  # global batch size
    total_steps: int = 65536
    warmup_steps: int = 10000
    sustain_steps: int = 0
    lr_scheduler: str = "cosine"
    weight_decay: float = 0.0
    gradient_clip: float = 1.0
    grad_acc: int = 8
    final_cosine: float = 1e-5
    ema_decay: float = 0.999
    # Muon momentum-buffer storage dtype: 'f32' (default) or 'bf16'. bf16
    # halves the buffer's HBM; the NS iteration casts to bf16 anyway.
    muon_momentum_dtype: str = "f32"


@dataclass
class EvalConfig:
    every_steps: int = 1000
    steps: int = 500


@dataclass
class CheckpointConfig:
    every_steps: int = 5000
    keep: int = 3


@dataclass
class LoggingConfig:
    log_with: str = "tensorboard"
    every_steps: int = 10
    grad_l2: bool = True
    weights_l2: bool = True
    mode: str = "offline"


@dataclass
class ProfileConfig:
    do_profile: bool = False
    early_stop: bool = False
    wait: int = 8
    warmup: int = 8
    active: int = 8
    repeat: int = 1


@dataclass
class MeshConfig:
    """Device mesh for pjit. Axis sizes of -1 mean 'all remaining devices'."""

    data: int = -1   # data-parallel axis (gradients psum over ICI)
    model: int = 1   # tensor-parallel axis (param/activation sharding)


@dataclass
class TrainConfig:
    compile: bool = True
    device: str = "tpu"
    precision: str = "bf16"
    seed: int = 42
    flash_attention: bool = True
    gradient_checkpointing: bool = False
    # per-layer remat policy when gradient_checkpointing is on: '' saves
    # nothing inside the layer (lowest memory, recomputes the matmuls in
    # the backward); 'dots' saves MXU outputs and recomputes only the
    # cheap elementwise ops (jax dots_with_no_batch_dims_saveable) — an
    # MFU/memory trade to A/B on device
    remat_policy: str = ""
    # chunked cross-entropy: compute lm_head+loss per token chunk of this
    # size under remat so (B, T, V) logits never materialize; 0 = off
    loss_chunk_size: int = 0
    # exit cleanly (checkpoint + final save) once this much wall-clock has
    # elapsed; 0 = no limit. A clean exit matters on shared single-chip
    # hosts where killing a TPU process wedges the device claim.
    max_seconds: float = 0.0
    checkpoint_path: str = ""
    pretrained_path: str = ""
    mesh: MeshConfig = field(default_factory=MeshConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    dataloader: DataloaderConfig = field(default_factory=DataloaderConfig)
    optim: OptimizerConfig = field(default_factory=OptimizerConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)
    profile: ProfileConfig = field(default_factory=ProfileConfig)
    mode: str = "train"


# -- diffusion (DiT coordinate refiner) --------------------------------------

@dataclass
class DiffusionModelConfig:
    model: str = "DiT-B"
    noise_schedule: str = "squaredcos_cap_v2"
    l1_loss: bool = False
    diffusion_steps: int = 1000
    max_diffusion_step: int = 100
    context_size: int = 272
    # "uniform" or "loss-second-moment" (Improved-DDPM importance sampling)
    schedule_sampler: str = "uniform"


@dataclass
class DiffusionDataConfig:
    train_dataset_path: str = ""
    start: int = 0
    end: int = 16291
    shuffle: bool = True
    seq_len: int = 128
    stride: int = 16
    cycle_length: int = 64
    beatmap_class: bool = False
    difficulty_class: bool = True
    mapper_class: bool = True
    descriptor_class: bool = True
    circle_size_class: bool = True
    class_dropout_prob: float = 0.2
    diff_dropout_prob: float = 0.2
    mapper_dropout_prob: float = 0.2
    descriptor_dropout_prob: float = 0.2
    cs_dropout_prob: float = 0.2
    descriptors_path: str = ""
    mappers_path: str = ""
    num_diff_classes: int = 26
    max_diff: int = 12
    num_cs_classes: int = 22
    double_time_prob: float = 0.5
    distance_std: float = 0.1


@dataclass
class DiffusionTrainConfig:
    compile: bool = True
    device: str = "tpu"
    precision: str = "bf16"
    seed: int = 0
    checkpoint_path: str = ""
    # exit cleanly (checkpoint + final save) once this much wall-clock has
    # elapsed; 0 = no limit. A clean exit matters on shared single-chip
    # hosts where killing a TPU process wedges the device claim.
    max_seconds: float = 0.0
    model: DiffusionModelConfig = field(default_factory=DiffusionModelConfig)
    data: DiffusionDataConfig = field(default_factory=DiffusionDataConfig)
    dataloader: DataloaderConfig = field(default_factory=DataloaderConfig)
    optim: OptimizerConfig = field(default_factory=lambda: OptimizerConfig(
        name="adamw", base_lr=2e-4, batch_size=256, total_steps=400000,
        warmup_steps=10000, grad_acc=2))
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    logging: LoggingConfig = field(default_factory=LoggingConfig)


# -- inference ----------------------------------------------------------------

@dataclass
class AdvancedFeaturesConfig:
    """BeatHeritage V1 enhancement toggles (reference config.py:45,
    beatheritage_postprocessor.py — implemented in inference/enhance.py)."""
    enable_context_aware_generation: bool = False
    enable_style_preservation: bool = False
    enable_difficulty_scaling: bool = False
    enable_pattern_variety: bool = False


@dataclass
class QualityControlConfig:
    """Position quality-control passes (reference QualityController,
    beatheritage_postprocessor.py:360 — implemented in inference/enhance.py)."""
    min_distance_threshold: float = 10.0
    max_overlap_ratio: float = 0.3
    enable_auto_correction: bool = False
    enable_flow_optimization: bool = False


@dataclass
class InferenceConfig:
    model_path: str = ""
    audio_path: str = ""
    output_path: str = ""
    beatmap_path: str = ""

    # conditional generation
    gamemode: Optional[int] = None
    beatmap_id: Optional[int] = None
    difficulty: Optional[float] = None
    mapper_id: Optional[int] = None
    year: Optional[int] = None
    hitsounded: Optional[bool] = None
    keycount: Optional[int] = None
    hold_note_ratio: Optional[float] = None
    scroll_speed_ratio: Optional[float] = None
    descriptors: Optional[list] = None
    negative_descriptors: Optional[list] = None

    # difficulty settings
    hp_drain_rate: Optional[float] = None
    circle_size: Optional[float] = None
    overall_difficulty: Optional[float] = None
    approach_rate: Optional[float] = None
    slider_multiplier: Optional[float] = None
    slider_tick_rate: Optional[float] = None

    # inference settings
    seed: Optional[int] = None
    device: str = "auto"
    precision: str = "bf16"
    add_to_beatmap: bool = False
    export_osz: bool = False
    start_time: Optional[int] = None
    end_time: Optional[int] = None
    lookback: float = 0.5
    lookahead: float = 0.4
    timing_leniency: int = 20
    in_context: list = field(default_factory=lambda: [ContextType.NONE])
    output_type: list = field(default_factory=lambda: [ContextType.MAP])
    cfg_scale: float = 1.0
    temperature: float = 1.0
    timing_temperature: float = 0.1
    mania_column_temperature: float = 0.5
    taiko_hit_temperature: float = 0.5
    timeshift_bias: float = 0.0
    top_p: float = 0.95
    top_k: int = 0
    repetition_penalty: float = 1.0
    parallel: bool = False
    # shard the window batch over all local devices (pure DP over windows;
    # SURVEY §5: the TPU-native multi-chip inference plan)
    data_parallel_windows: bool = False
    # pad every prompt to tgt_seq_len//2 so the decode program compiles once
    # instead of once per pow2 prompt bucket (XLA recompiles are the dominant
    # cold-start cost on TPU); false restores the tighter bucketed padding
    fixed_prompt_pad: bool = True
    do_sample: bool = True
    num_beams: int = 1
    # speculative decoding: prompt-lookup drafts verified K at a time in one
    # chunk forward (decode/speculative.py). 0 disables; greedy streams are
    # bit-identical, sampled streams equal in distribution
    speculative_k: int = 0
    # unroll the decoder layer loop in the decode engine (static cache
    # indices instead of a scanned carry) — A/B lever for per-step HBM cost
    decode_unroll_layers: bool = False
    # int8 KV cache with per-position scales: halves the dominant per-step
    # HBM read (self + cross KV). Mildly lossy (quantization noise on
    # attention logits); default off pending on-device quality eval
    decode_kv_quant: bool = False
    # AOT executable cache: serialize compiled decode programs so later
    # processes skip the 10-15 min remote compile (decode/aot.py). 'auto'
    # resolves to ~/.cache/beatheritage_tpu/aot; '' disables
    aot_cache_dir: str = "auto"
    # precompile decode programs for every window-batch bucket up to this
    # many windows at Processor/server start (0 = off): removes the ~15 s
    # fresh-song-length compile tail entirely instead of paying it on the
    # first song of each length (Processor.warmup)
    warmup_windows: int = 0
    super_timing: bool = False
    timer_num_beams: int = 2
    timer_bpm_threshold: float = 0.7
    timer_cfg_scale: float = 1.0
    timer_iterations: int = 20
    # decode-program length cap for the timing-only voting passes: timing
    # streams are <=~100 tokens/window, so capping the KV cache / prefill at
    # 256 (vs tgt_seq_len 2048) cuts the per-step beam cache reorder and the
    # fixed_prompt_pad prefill ~8x (0 = uncapped)
    timer_max_len: int = 256
    # batch width for the timer's voting passes: the capped decode program
    # (timer_max_len KV rows) is ~8x smaller than the map-generation
    # program, so it affords a much wider window batch than max_batch_size
    # — fewer sequential device rounds for the ~100-window offset sweep
    # (0 = inherit max_batch_size)
    timer_max_batch_size: int = 64
    use_server: bool = False
    max_batch_size: int = 16
    resnap_events: bool = True
    position_refinement: bool = False

    # metadata
    bpm: int = 120
    offset: int = 0
    title: str = ""
    artist: str = ""
    creator: str = ""
    version: str = ""
    background: Optional[str] = None
    preview_time: int = -1

    # diffusion
    generate_positions: bool = True
    diff_cfg_scale: float = 1.0
    compile: bool = False
    pad_sequence: bool = False
    diff_ckpt: str = ""
    diff_refine_ckpt: str = ""
    refine_iters: int = 10
    random_init: bool = False
    timesteps: list = field(default_factory=lambda: [100, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    max_seq_len: int = 1024
    overlap_buffer: int = 128
    # DEPRECATED no-op (kept for config compatibility): the slider-end
    # projection now runs on device INSIDE the jitted sampler every step
    # (diffusion/slider_jax.py), so there is no host-projection cadence to
    # tune anymore
    slider_fix_steps: int = 5
    # when refining coarse decode positions (random_init=false), enter the
    # reverse chain at this respaced step instead of the top. The coarse
    # input is a lightly-quantized x0, not an x_T: fed to the top of the
    # chain it gets re-noised and the model REGENERATES rather than refines
    # (measured on DiT-B: RMS-to-ground-truth 22.4 px entering at 20/20
    # respaced steps vs 9.5 px at 4/20, with ground-truth-level spacing and
    # preserved stacks). 0 = full chain (the reference's behavior).
    refine_entry: int = 0
    # distance-consistency guidance weight (diffusion/guidance.py): px of
    # correction per px of spacing error per sampling step, pulling jump
    # distances toward the conditioning targets the DiT already receives in
    # context. 0 = off (reference-exact). Counters the refiner's measured
    # spacing compression (EVAL_POS_r03: median jump 75 px vs corpus 98.8).
    distance_consistency: float = 0.0

    # BeatHeritage V1 enhancement layer (inference/enhance.py)
    advanced_features: AdvancedFeaturesConfig = field(
        default_factory=AdvancedFeaturesConfig)
    quality_control: QualityControlConfig = field(
        default_factory=QualityControlConfig)

    train: TrainConfig = field(default_factory=TrainConfig)
    diffusion: DiffusionTrainConfig = field(default_factory=DiffusionTrainConfig)


@dataclass
class FidConfig:
    device: str = "auto"
    compile: bool = True
    num_processes: int = 3
    seed: int = 0
    skip_generation: bool = False
    fid: bool = True
    rhythm_stats: bool = True
    dataset_type: str = "mmrs"
    dataset_path: str = ""
    dataset_start: int = 0
    dataset_end: int = 100
    gamemodes: list = field(default_factory=lambda: [0])
    classifier_ckpt: str = ""
    classifier_batch_size: int = 16
    # train config the classifier/rcomplexion checkpoints were built with
    # (their dims need not match the inference model's — e.g. a 384-dim
    # classifier scoring a 768-dim flagship run); '' = inference.train
    classifier_config: str = ""
    # trained rcomplexion checkpoint: adds mean rhythm complexity
    # (bits/note) for real vs generated maps to the report
    rcomplexion_ckpt: str = ""
    training_set_ids_path: Optional[str] = None
    inference: InferenceConfig = field(default_factory=InferenceConfig)


@dataclass
class MaiModConfig:
    beatmap_path: str = ""
    audio_path: str = ""
    raw_output: bool = False
    precision: str = "bf16"
    inference: InferenceConfig = field(default_factory=InferenceConfig)


def as_dict(cfg: Any) -> dict:
    """Recursively convert a config dataclass to plain dicts/lists."""
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        return {f.name: as_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [as_dict(v) for v in cfg]
    if isinstance(cfg, dict):
        return {k: as_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, ContextType):
        return cfg.value
    return cfg
