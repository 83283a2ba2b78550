"""YAML config composition + CLI override grammar ("hydra-lite").

The reference exposes its public API through Hydra config names and dotted
CLI overrides (`python inference.py -cn beatheritage_v1 gamemode=0 ...`,
reference README "Command-Line Inference"). This module reproduces that
surface without the hydra dependency:

- configs live under `configs/<group>/<name>.yaml`
- a `defaults:` list composes other configs, supporting the reference's
  cross-group syntax `../train@train: v30` (compose configs/train/v30.yaml
  into the `train` subtree; reference configs/inference/v30.yaml:1-5)
- CLI overrides are `dotted.path=yaml_value`
"""

from __future__ import annotations

import copy
import dataclasses
import typing
from pathlib import Path
from typing import Any, Optional, Type, TypeVar

import yaml

from ..events import ContextType

T = TypeVar("T")

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent


def _resolve_config_dir() -> Path:
    """Config root: $BEATHERITAGE_CONFIG_DIR overrides; else the repo-layout
    configs/ next to the package; else a configs/ copy inside the package
    (installed-wheel layout)."""
    import os  # noqa: PLC0415
    env = os.environ.get("BEATHERITAGE_CONFIG_DIR")
    if env:
        return Path(env)
    repo = _REPO_ROOT / "configs"
    if repo.is_dir():
        return repo
    return Path(__file__).resolve().parent.parent / "configs"


DEFAULT_CONFIG_DIR = _resolve_config_dir()


def _read_yaml(path: Path) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def compose_yaml(group: str, name: str, config_dir: Path = DEFAULT_CONFIG_DIR) -> dict:
    """Load configs/<group>/<name>.yaml and resolve its `defaults:` list."""
    path = config_dir / group / f"{name}.yaml"
    if not path.exists():
        raise FileNotFoundError(f"no config '{name}' in group '{group}' ({path})")
    raw = _read_yaml(path)
    defaults = raw.pop("defaults", [])
    merged: dict = {}
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, raw)
            raw = {}
            continue
        if isinstance(entry, str):
            merged = _deep_merge(merged, compose_yaml(group, entry, config_dir))
            continue
        if isinstance(entry, dict):
            for key, value in entry.items():
                if value is None:
                    continue
                # "../train@train": v30 -> compose group 'train' into subtree
                if "@" in key:
                    src, _, dest = key.partition("@")
                    src_group = src.replace("../", "").replace("./", "") or group
                    sub = compose_yaml(src_group, str(value), config_dir)
                    # "../train@: default" (empty dest) merges at the root —
                    # used by legacy configs whose defaults point at the old
                    # root train/inference configs
                    merged = _deep_merge(merged, {dest: sub} if dest else sub)
                else:
                    src_group = key.replace("../", "").replace("./", "")
                    merged = _deep_merge(merged, {src_group: compose_yaml(src_group, str(value), config_dir)})
    return _deep_merge(merged, raw)


def parse_override(arg: str) -> tuple[list[str], Any]:
    """Parse one `a.b.c=value` CLI override into (path, parsed value)."""
    key, _, raw = arg.partition("=")
    key = key.lstrip("+~")
    value = yaml.safe_load(raw) if raw != "" else None
    return key.split("."), value


def _set_path(d: dict, path: list[str], value: Any) -> None:
    node = d
    for key in path[:-1]:
        node = node.setdefault(key, {})
        if not isinstance(node, dict):
            raise ValueError(f"cannot override below non-dict config node '{key}'")
    node[path[-1]] = value


def apply_overrides(data: dict, overrides: list[str]) -> dict:
    data = copy.deepcopy(data)
    for arg in overrides or []:
        if "=" not in arg:
            raise ValueError(f"override '{arg}' is not of the form key=value")
        path, value = parse_override(arg)
        _set_path(data, path, value)
    return data


# -- structured (dataclass) instantiation ------------------------------------

def _coerce(value: Any, hint: Any) -> Any:
    origin = typing.get_origin(hint)
    if hint is Any or hint is None:
        return value
    if origin is typing.Union:
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0]) if len(args) == 1 else value
    if dataclasses.is_dataclass(hint):
        return structure(value, hint) if isinstance(value, dict) else value
    if hint is ContextType or hint == ContextType:
        return ContextType(value.lower()) if isinstance(value, str) else value
    if origin in (list, tuple):
        args = typing.get_args(hint)
        if args and value is not None:
            return [(ContextType(v.lower()) if args[0] is ContextType and isinstance(v, str)
                     else _coerce(v, args[0])) for v in value]
        return value
    if hint is float and isinstance(value, (int, str)):
        # str covers YAML 1.1 parsing "3e-3" as a string (no dot before e)
        return float(value)
    if hint is int and isinstance(value, str):
        return int(float(value))
    if hint is int and isinstance(value, float) and value.is_integer():
        return int(value)
    if hint is bool and isinstance(value, str):
        return value.lower() in ("true", "1", "yes")
    return value


def structure(data: Optional[dict], schema: Type[T]) -> T:
    """Build a dataclass instance from nested dicts, coercing field types."""
    data = data or {}
    hints = typing.get_type_hints(schema)
    kwargs = {}
    for f in dataclasses.fields(schema):
        if f.name not in data:
            continue
        kwargs[f.name] = _coerce(data[f.name], hints.get(f.name, Any))
    obj = schema(**kwargs)
    unknown = set(data) - {f.name for f in dataclasses.fields(schema)}
    if unknown:
        # tolerate extra keys (forward compat) but keep them reachable
        setattr(obj, "_extra", {k: data[k] for k in unknown}) if not isinstance(obj, type) else None
    return obj


def load_config(schema: Type[T], group: str, name: Optional[str] = None,
                overrides: Optional[list[str]] = None,
                config_dir: Path = DEFAULT_CONFIG_DIR) -> T:
    """Compose a config: YAML (if `name` given) + CLI overrides -> dataclass."""
    data: dict = compose_yaml(group, name, config_dir) if name else {}
    data = apply_overrides(data, overrides or [])
    cfg = structure(data, schema)
    _normalize_context_fields(cfg)
    return cfg


def _normalize_context_fields(cfg: Any) -> None:
    """Convert context-type strings into ContextType enums in-place, in the
    fields where the reference uses the `context_type` Hydra resolver
    (osuT5/osuT5/config.py:256)."""
    def to_ct(x):
        return ContextType(x.lower()) if isinstance(x, str) else x

    for attr in ("in_context", "output_type"):
        if hasattr(cfg, attr):
            val = getattr(cfg, attr)
            if isinstance(val, list):
                setattr(cfg, attr, [to_ct(v) for v in val])
    if hasattr(cfg, "train"):
        _normalize_context_fields(cfg.train)
    if hasattr(cfg, "inference"):
        _normalize_context_fields(cfg.inference)
