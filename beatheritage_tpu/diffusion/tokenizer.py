"""Diffusion class-conditioning vocabulary (one-hot positions).

(reference: osu_diffusion/utils/tokenizer.py:11) Blocks in order:
style | difficulty | mapper | descriptor | circle size; the last index of
each block is the unknown class.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np


class DiffusionTokenizer:
    def __init__(self, args=None):
        self.beatmap_idx: dict[int, int] = {}
        self.num_classes = 0
        self.num_diff_classes = 0
        self.max_difficulty = 0
        self.beatmap_mapper: dict[int, int] = {}
        self.mapper_idx: dict[int, int] = {}
        self.num_mapper_classes = 0
        self.beatmap_descriptors: dict[int, list[int]] = {}
        self.descriptor_idx: dict[str, int] = {}
        self.num_descriptor_classes = 0
        self.num_cs_classes = 0

        if args is not None:
            d = args.data
            if d.difficulty_class:
                self.num_diff_classes = d.num_diff_classes
                self.max_difficulty = d.max_diff
            if d.circle_size_class:
                self.num_cs_classes = d.num_cs_classes

    # -- block offsets ---------------------------------------------------------

    @property
    def num_tokens(self) -> int:
        return (self.num_classes + self.num_diff_classes + self.num_mapper_classes
                + self.num_descriptor_classes + self.num_cs_classes)

    def encode_style(self, beatmap_id: int) -> int:
        return self.beatmap_idx.get(beatmap_id, self.num_classes - 1)

    @property
    def style_unk(self) -> int:
        return self.num_classes - 1

    def encode_diff(self, diff: float) -> int:
        return self.num_classes + int(np.clip(
            int(diff * (self.num_diff_classes - 2) / self.max_difficulty),
            0, self.num_diff_classes - 2))

    @property
    def diff_unk(self) -> int:
        return self.num_classes + self.num_diff_classes - 1

    def encode_mapper(self, beatmap_id: int) -> int:
        return self.encode_mapper_id(self.beatmap_mapper.get(beatmap_id, -1))

    def encode_mapper_id(self, user_id: int) -> int:
        idx = self.mapper_idx.get(user_id, self.num_mapper_classes - 1)
        return self.num_classes + self.num_diff_classes + idx

    @property
    def mapper_unk(self) -> int:
        return self.num_classes + self.num_diff_classes + self.num_mapper_classes - 1

    def encode_descriptor_name(self, descriptor: str) -> int:
        idx = self.descriptor_idx.get(descriptor, self.num_descriptor_classes)
        return self.encode_descriptor_idx(idx)

    def encode_descriptor_idx(self, idx: int) -> int:
        return (self.num_classes + self.num_diff_classes
                + self.num_mapper_classes + idx)

    @property
    def descriptor_unk(self) -> int:
        return (self.num_classes + self.num_diff_classes
                + self.num_mapper_classes + self.num_descriptor_classes - 1)

    def encode_cs(self, cs: float) -> int:
        return (self.num_classes + self.num_diff_classes + self.num_mapper_classes
                + self.num_descriptor_classes
                + int(np.clip(int(cs * (self.num_cs_classes - 2) / 10),
                              0, self.num_cs_classes - 2)))

    @property
    def cs_unk(self) -> int:
        return self.num_tokens - 1

    def load_dataset_indices(self, metadata, args=None) -> None:
        """Populate style/mapper/descriptor tables from MMRS metadata,
        honoring the DiffusionDataConfig *_class flags (reference
        osu_diffusion/utils/tokenizer.py builds these from the training
        data; without them the refiner can only be conditioned on
        difficulty/CS). The last index of each block is the unknown class."""
        d = args.data if args is not None else None
        flat = metadata.reset_index()
        if d is None or d.beatmap_class:
            self.beatmap_idx = {int(k): int(v) for k, v in
                                flat.set_index("Id")["BeatmapIdx"].items()}
            self.num_classes = (max(self.beatmap_idx.values()) + 2
                                if self.beatmap_idx else 0)
        if d is None or d.mapper_class:
            self.beatmap_mapper = {int(k): int(v) for k, v in
                                   flat.set_index("Id")["UserId"].items()}
            unique_users = sorted({int(u) for u in metadata["UserId"]})
            self.mapper_idx = {u: i for i, u in enumerate(unique_users)}
            self.num_mapper_classes = len(unique_users) + 1  # + unk
        if (d is None or d.descriptor_class) and "OmdbTags" in metadata:
            tags = metadata["OmdbTags"].explode().dropna().unique()
            for name in tags:
                if name not in self.descriptor_idx:
                    self.descriptor_idx[name] = len(self.descriptor_idx)
            self.beatmap_descriptors = {
                int(k): [self.descriptor_idx[t] for t in v]
                for k, v in flat.set_index("Id")["OmdbTags"].items()
                if np.count_nonzero(v)}
            self.num_descriptor_classes = len(self.descriptor_idx) + 1  # + unk

    # -- persistence -------------------------------------------------------------

    def state_dict(self) -> dict:
        return {
            "num_classes": self.num_classes,
            "num_diff_classes": self.num_diff_classes,
            "max_difficulty": self.max_difficulty,
            "beatmap_idx": self.beatmap_idx,
            "beatmap_mapper": self.beatmap_mapper,
            "mapper_idx": self.mapper_idx,
            "num_mapper_classes": self.num_mapper_classes,
            "beatmap_descriptors": self.beatmap_descriptors,
            "descriptor_idx": self.descriptor_idx,
            "num_descriptor_classes": self.num_descriptor_classes,
            "num_cs_classes": self.num_cs_classes,
        }

    def load_state_dict(self, state: dict) -> None:
        self.num_classes = state.get("num_classes", 0)
        self.num_diff_classes = state.get("num_diff_classes", 0)
        self.max_difficulty = state.get("max_difficulty", 0)
        self.beatmap_idx = {int(k): v for k, v in state.get("beatmap_idx", {}).items()}
        self.beatmap_mapper = {int(k): v for k, v in state.get("beatmap_mapper", {}).items()}
        self.mapper_idx = {int(k): v for k, v in state.get("mapper_idx", {}).items()}
        self.num_mapper_classes = state.get("num_mapper_classes", 0)
        self.beatmap_descriptors = {int(k): v for k, v in state.get("beatmap_descriptors", {}).items()}
        self.descriptor_idx = state.get("descriptor_idx", {})
        self.num_descriptor_classes = state.get("num_descriptor_classes", 0)
        self.num_cs_classes = state.get("num_cs_classes", 0)

    def save_pretrained(self, directory) -> None:
        Path(directory).mkdir(parents=True, exist_ok=True)
        with open(Path(directory) / "diffusion_tokenizer.json", "w") as f:
            json.dump(self.state_dict(), f)

    @classmethod
    def from_pretrained(cls, path) -> "DiffusionTokenizer":
        path = Path(path)
        file = path / "diffusion_tokenizer.json" if path.is_dir() else path
        tok = cls()
        with open(file) as f:
            tok.load_state_dict(json.load(f))
        return tok
