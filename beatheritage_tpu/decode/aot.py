"""AOT program cache: serialize compiled decode executables across processes.

Cold start dominates first-song latency: the fused decode program takes
10-15 min to compile through the axon remote-compile tunnel, and the
standard JAX persistent compilation cache does not capture remote-compiled
binaries (docs/ROUND_NOTES.md). This module side-steps both by serializing
the *compiled executable* (jax.experimental.serialize_executable) keyed by
a digest of the lowered StableHLO + device fingerprint: a later process
deserializes and runs with zero compilation.

(reference equivalent: torch.compile + CUDA graph caching, inference.py:556;
this is the TPU-native version.)

Usage:
    out = aot_call(engine.generate, cache_dir,
                   params, dims, settings, ..., max_len=..., dtype=...)

`aot_call` falls back to the plain jitted call on any serialization failure
(e.g. an executable the backend refuses to serialize), so it can never make
things worse than the status quo.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
from pathlib import Path

import jax

logger = logging.getLogger(__name__)

_LOADED: dict[str, object] = {}  # digest -> loaded executable (per process)
_SIG_MEMO: dict = {}  # cheap call signature -> executable (skip re-lowering)
_FALLBACKS = {"count": 0}  # exe-path failures routed through plain jit


def _call_signature(jitted_fn, args, kwargs):
    """Hashable shape/dtype/static signature — avoids re-tracing the big
    decode program on every window batch just to compute its digest."""
    def leaf_sig(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return ("arr", tuple(x.shape), str(x.dtype))
        return ("static", repr(x))
    flat, treedef = jax.tree_util.tree_flatten((args, tuple(sorted(kwargs.items()))))
    return (id(jitted_fn), treedef, tuple(leaf_sig(x) for x in flat))


def default_cache_dir() -> str:
    return os.environ.get(
        "BH_AOT_CACHE",
        str(Path.home() / ".cache" / "beatheritage_tpu" / "aot"))


def _device_fingerprint() -> str:
    d = jax.devices()[0]
    return f"{d.platform}-{getattr(d, 'device_kind', '?')}-{jax.device_count()}"


def _digest(lowered, convention: str = "") -> str:
    """Digest of the lowered HLO + the call convention.

    The convention (arg/kwarg treedef) MUST be part of the key: two
    signatures of the same computation can lower to identical HLO while
    flattening differently, and a deserialized executable only accepts the
    exact tree it was serialized with (seen live: a cached pre-refactor
    engine.generate exe rejected every call after kwargs were added)."""
    text = lowered.as_text()
    h = hashlib.sha256()
    h.update(_device_fingerprint().encode())
    h.update(convention.encode())
    h.update(text.encode())
    return h.hexdigest()[:24]


def _strip_statics(jitted_fn, args, kwargs):
    """Dynamic-only (args, kwargs) for calling a DESERIALIZED executable.

    serialize_executable's in_tree covers only the dynamic inputs — static
    args are baked into the program — so a loaded exe rejects the original
    call convention (statics included), while a same-process Compiled from
    lowered.compile() accepts and validates it. Strip statics using the jit
    wrapper's own PjitInfo."""
    info = getattr(jitted_fn, "_jit_info", None)
    if info is None:
        return args, kwargs
    nums = set(getattr(info, "static_argnums", ()) or ())
    names = set(getattr(info, "static_argnames", ()) or ())
    dyn_args = tuple(a for i, a in enumerate(args) if i not in nums)
    dyn_kwargs = {k: v for k, v in kwargs.items() if k not in names}
    return dyn_args, dyn_kwargs


def aot_call(jitted_fn, cache_dir, *args, **kwargs):
    """Call a jitted function through the AOT executable cache.

    Traces (cheap) to obtain the lowered module, then loads a previously
    serialized executable for its digest or compiles once and serializes.
    Returns the function output. Pass cache_dir=None/'' to bypass entirely.
    """
    if not cache_dir:
        return jitted_fn(*args, **kwargs)
    cache_dir = Path(os.path.expanduser(str(cache_dir)))

    try:
        sig = _call_signature(jitted_fn, args, kwargs)
    except TypeError:
        sig = None
    # executables (lowered.compile() and deserialized alike) accept ONLY the
    # dynamic inputs — statics are baked into the program
    dyn_args, dyn_kwargs = _strip_statics(jitted_fn, args, kwargs)
    if sig is not None and sig in _SIG_MEMO:
        try:
            return _SIG_MEMO[sig](*dyn_args, **dyn_kwargs)
        except TypeError as e:
            # argument-convention mismatch only; anything else (OOM,
            # donation) must surface, not silently re-run
            _note_fallback(
                f"memoized executable rejected the call convention: {e}")
            return jitted_fn(*args, **kwargs)
        except jax.errors.JaxRuntimeError as e:
            if "shard" not in str(e):
                raise
            # inputs not pre-placed for a sharded program: executables skip
            # jit's automatic device_put (callers on a mesh place inputs
            # first — see processor._run_engine)
            _note_fallback(f"executable rejected input placement: {e}")
            return jitted_fn(*args, **kwargs)

    try:
        lowered = jitted_fn.lower(*args, **kwargs)
        _, call_tree = jax.tree_util.tree_flatten(
            (args, tuple(sorted(kwargs.items()))))
        digest = _digest(lowered, convention=str(call_tree))
    except Exception:
        return jitted_fn(*args, **kwargs)

    exe = _LOADED.get(digest)
    if exe is None:
        path = cache_dir / f"{digest}.aotx"
        if path.is_file():
            try:
                from jax.experimental import serialize_executable as se  # noqa: PLC0415
                blob, in_tree, out_tree = pickle.loads(path.read_bytes())
                exe = se.deserialize_and_load(blob, in_tree, out_tree)
            except Exception:
                exe = None
        if exe is None:
            compiled = lowered.compile()
            try:
                from jax.experimental import serialize_executable as se  # noqa: PLC0415
                payload = pickle.dumps(se.serialize(compiled))
                cache_dir.mkdir(parents=True, exist_ok=True)
                tmp = path.with_suffix(".tmp")
                tmp.write_bytes(payload)
                tmp.replace(path)
            except Exception:
                pass  # unserializable backend: still use the compiled exe
            exe = compiled
        _LOADED[digest] = exe

    if sig is not None:
        _SIG_MEMO[sig] = exe
    try:
        return exe(*dyn_args, **dyn_kwargs)
    except TypeError as e:
        # argument-convention mismatch (e.g. a deserialized exe whose
        # flattening differs from this call site): plain call
        _note_fallback(f"executable rejected the call convention: {e}")
        return jitted_fn(*args, **kwargs)
    except jax.errors.JaxRuntimeError as e:
        if "shard" not in str(e):
            raise
        _note_fallback(f"executable rejected input placement: {e}")
        return jitted_fn(*args, **kwargs)


def warm_cache(jitted_fn, cache_dir, *args, **kwargs) -> str:
    """Compile-only entry: populate the executable cache WITHOUT executing.

    Arguments may be real arrays or jax.ShapeDtypeStruct placeholders — only
    shapes/dtypes reach the compiler. Returns "loaded" (already on disk),
    "compiled" (fresh compile, serialized when the backend allows), or
    "bypass" (no cache dir / lowering failed). Used by Processor.warmup to
    precompile every window-batch bucket at server start so the first song
    of each length never pays the remote-compile tail (docs/ROUND_NOTES
    round 3: ~15 s per previously-unseen song length)."""
    if not cache_dir:
        return "bypass"
    cache_dir = Path(os.path.expanduser(str(cache_dir)))
    try:
        sig = _call_signature(jitted_fn, args, kwargs)
    except TypeError:
        sig = None
    if sig is not None and sig in _SIG_MEMO:
        return "loaded"
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
        _, call_tree = jax.tree_util.tree_flatten(
            (args, tuple(sorted(kwargs.items()))))
        digest = _digest(lowered, convention=str(call_tree))
    except Exception:
        return "bypass"

    status = "loaded"
    exe = _LOADED.get(digest)
    if exe is None:
        path = cache_dir / f"{digest}.aotx"
        if path.is_file():
            try:
                from jax.experimental import serialize_executable as se  # noqa: PLC0415
                blob, in_tree, out_tree = pickle.loads(path.read_bytes())
                exe = se.deserialize_and_load(blob, in_tree, out_tree)
            except Exception:
                exe = None
        if exe is None:
            status = "compiled"
            compiled = lowered.compile()
            try:
                from jax.experimental import serialize_executable as se  # noqa: PLC0415
                payload = pickle.dumps(se.serialize(compiled))
                cache_dir.mkdir(parents=True, exist_ok=True)
                tmp = path.with_suffix(".tmp")
                tmp.write_bytes(payload)
                tmp.replace(path)
            except Exception:
                pass  # unserializable backend: warm for this process only
            exe = compiled
        _LOADED[digest] = exe
    if sig is not None:
        _SIG_MEMO[sig] = exe
    return status


def _note_fallback(reason: str) -> None:
    _FALLBACKS["count"] += 1
    _FALLBACKS["last_reason"] = reason
    logger.warning("aot_call fallback #%d to plain jit: %s",
                   _FALLBACKS["count"], reason)
