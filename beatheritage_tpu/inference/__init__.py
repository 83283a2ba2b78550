"""Inference stack: preprocess -> windowed generation -> postprocess -> .osu."""

from .postprocessor import BeatmapConfig, Postprocessor, beatmap_config_from_beatmap
from .preprocessor import Preprocessor
from .processor import GenerationConfig, Processor, generation_config_from_beatmap

__all__ = [
    "BeatmapConfig", "Postprocessor", "beatmap_config_from_beatmap",
    "Preprocessor", "GenerationConfig", "Processor",
    "generation_config_from_beatmap",
]
