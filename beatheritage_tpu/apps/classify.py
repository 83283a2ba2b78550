"""Mapper classifier CLI: who mapped this beatmap?

(reference: classifier/classify.py:148 — loads the trained classifier,
builds 8 s window examples over the beatmap, and prints the top-k mappers
with confidences.) The same feature head doubles as the FID extractor
(eval/harness.py).

Usage:
    python -m beatheritage_tpu.apps.classify -cn tiny \
        checkpoint_path=/ckpt/classifier beatmap_path=/maps/x.osu \
        [audio_path=/maps/audio.mp3] [top_k=20] [time=5000]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="classify a beatmap's mapper")
    parser.add_argument("-cn", "--config-name", default="tiny")
    parser.add_argument("overrides", nargs="*")
    ns = parser.parse_args(argv)
    from ._device import apply_device_override
    apply_device_override(ns.overrides)

    opts = dict(o.split("=", 1) for o in ns.overrides if "=" in o)
    beatmap_path = opts.pop("beatmap_path", "")
    audio_path = opts.pop("audio_path", "")
    top_k = int(opts.pop("top_k", "20"))
    at_time = opts.pop("time", None)
    ckpt = opts.pop("checkpoint_path", "")
    if not beatmap_path:
        print("error: beatmap_path=... is required", file=sys.stderr)
        return 2

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import TrainConfig, load_config
    from ..data.audio import load_audio
    from ..data.parser import BeatmapParser
    from ..eval.harness import beatmap_windows_tokens
    from ..models.classifier import ClassifierDims, classifier_forward, init_classifier_params
    from ..osu.beatmap import Beatmap
    from ..tokenizer import Tokenizer

    cfg = load_config(TrainConfig, "train", ns.config_name,
                      overrides=[f"{k}={v}" for k, v in opts.items()])
    tokenizer = Tokenizer(cfg)

    beatmap = Beatmap.from_path(beatmap_path)
    if not audio_path:
        candidates = list(Path(beatmap_path).parent.glob("*.mp3")) + \
            list(Path(beatmap_path).parent.glob("*.ogg")) + \
            list(Path(beatmap_path).parent.glob("*.wav"))
        if not candidates:
            print("error: no audio next to the beatmap; pass audio_path=...",
                  file=sys.stderr)
            return 2
        audio_path = str(candidates[0])

    ckpt = ckpt or cfg.checkpoint_path
    dims = ClassifierDims(
        d_model=cfg.model.arch.d_model, num_heads=cfg.model.arch.num_heads,
        d_ff=cfg.model.arch.d_ff, encoder_layers=cfg.model.arch.encoder_layers,
        decoder_layers=cfg.model.arch.decoder_layers,
        n_mels=cfg.model.spectrogram.n_mels, vocab_size=tokenizer.vocab_size_in,
        num_classes=max(tokenizer.num_mapper_classes + 1, 2))
    if ckpt:
        from ..train.checkpoints import restore_params
        template = jax.eval_shape(
            lambda: init_classifier_params(jax.random.PRNGKey(0), dims))
        params = restore_params(ckpt, template=template)
        # a tokenizer.json saved next to the checkpoint restores mapper ids
        tok_json = Path(ckpt) / "tokenizer.json"
        if tok_json.is_file():
            import json  # noqa: PLC0415
            tokenizer.load_state_dict(json.loads(tok_json.read_text()))
    else:
        print("warning: no checkpoint_path; using random weights (smoke mode)",
              file=sys.stderr)
        params = init_classifier_params(jax.random.PRNGKey(0), dims)

    # 8 s windows over audio + tokens (reference classify.py:57 create_example)
    window_ms = 8192.0
    sr = cfg.model.spectrogram.sample_rate
    samples = load_audio(audio_path, sample_rate=sr)
    parser_obj = BeatmapParser(cfg, tokenizer)
    token_windows = beatmap_windows_tokens(
        beatmap, parser_obj, tokenizer, window_ms=window_ms,
        max_tokens=cfg.data.tgt_seq_len)
    if not token_windows:
        print("error: beatmap produced no token windows", file=sys.stderr)
        return 2

    win_samples = int(window_ms / 1000 * sr)
    audio_windows = []
    for w in range(len(token_windows)):
        start = int(w * win_samples)
        chunk = samples[start:start + win_samples]
        if len(chunk) < win_samples:
            chunk = np.pad(chunk, (0, win_samples - len(chunk)))
        audio_windows.append(chunk)

    if at_time is not None:
        w = min(int(float(at_time) // window_ms), len(token_windows) - 1)
        token_windows = [token_windows[w]]
        audio_windows = [audio_windows[w]]

    fwd = jax.jit(lambda a, t: classifier_forward(
        params, dims, a, t, spec_cfg=cfg.model.spectrogram))
    logits = []
    for a, t in zip(audio_windows, token_windows):
        out = fwd(jnp.asarray(a[None], jnp.float32), jnp.asarray(t[None]))
        logits.append(np.asarray(out["logits"][0]))
    mean_logits = np.mean(logits, axis=0)
    probs = np.exp(mean_logits - mean_logits.max())
    probs /= probs.sum()

    idx_to_mapper = {idx: uid for uid, idx in tokenizer.mapper_idx.items()}
    order = np.argsort(-mean_logits)[:top_k]
    print(f"Top {len(order)} mappers over {len(token_windows)} windows:")
    for rank, idx in enumerate(order, 1):
        mapper_id = idx_to_mapper.get(int(idx), "unknown")
        print(f"{rank:3d}. mapper {mapper_id}  "
              f"confidence {probs[idx]:.4f}  logit {mean_logits[idx]:+.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
