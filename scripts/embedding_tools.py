"""Style-embedding analysis tools over the DiT class-conditioning space.

TPU-native equivalents of the reference's embedding dev scripts
(osu_diffusion/testing/find_similar_beatmaps.py, plot_embeddings.py,
embedding_svm.py; osuT5/plot_difficulties.py). Our DiT conditions through a
multi-hot class vector into a dense projection (models/dit.py y_mlp1), so
each one-hot class position owns a weight ROW — y_mlp1.w[:num_style_classes]
IS the style-embedding table the reference reads from its LabelEmbedder.

Subcommands:
    similar       nearest styles to a beatmap id in embedding space
    tsne          t-SNE scatter of the style table, colored by mapper
    svm           linear separability of two descriptor tags in the space
    difficulties  histogram of corpus star ratings (plot_difficulties.py)

Usage:
    python scripts/embedding_tools.py similar --ckpt /tmp/synth_dit_b_ckpt \
        --dataset /tmp/synth_mmrs_v4 --beatmap-id 123 -k 10
    python scripts/embedding_tools.py tsne --ckpt ... --dataset ... \
        --out /tmp/emb_tsne.png
    python scripts/embedding_tools.py svm --ckpt ... --dataset ... \
        --tags "jump aim,streams"
    python scripts/embedding_tools.py difficulties --dataset ... \
        --out /tmp/diffs.png
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load_space(args):
    """(embedding table (num_styles, H), DiffusionTokenizer, metadata)."""
    # analysis tools default to CPU — the axon site hook would otherwise
    # dial the TPU just to read a weight table (and hang if the tunnel is
    # down); apply_device overrides the forced JAX_PLATFORMS
    from beatheritage_tpu.parallel.mesh import apply_device
    apply_device(getattr(args, "device", "cpu"))
    from beatheritage_tpu.config import DiffusionTrainConfig, load_config
    from beatheritage_tpu.data.dataset import load_mmrs_metadata
    from beatheritage_tpu.diffusion.tokenizer import DiffusionTokenizer
    from beatheritage_tpu.train.checkpoints import restore_params

    cfg = load_config(DiffusionTrainConfig, "diffusion", args.config,
                      overrides=[f"data.train_dataset_path={args.dataset}"])
    md = load_mmrs_metadata(args.dataset)
    tok = DiffusionTokenizer(cfg)
    tok.load_dataset_indices(md)
    params = restore_params(args.ckpt)
    # DiT checkpoints store {params, ema}; prefer the EMA weights (what the
    # sampler uses), falling back for raw param dumps
    for key in ("ema", "params"):
        if key in params and "y_mlp1" in params[key]:
            params = params[key]
            break
    w = np.asarray(params["y_mlp1"]["w"], np.float32)
    if w.shape[0] < tok.num_classes:
        raise SystemExit(
            f"checkpoint class_size {w.shape[0]} < corpus style count "
            f"{tok.num_classes}: checkpoint/corpus mismatch")
    table = w[:tok.num_classes]  # style block rows
    return table, tok, md


def cmd_similar(args) -> int:
    table, tok, _ = _load_space(args)
    if args.beatmap_id not in tok.beatmap_idx:
        raise SystemExit(f"beatmap id {args.beatmap_id} not in the corpus")
    idx_beatmap = {v: k for k, v in tok.beatmap_idx.items()}
    query = table[tok.beatmap_idx[args.beatmap_id]]
    dist = np.linalg.norm(table - query[None], axis=1)
    order = np.argsort(dist)[:args.k + 1]
    out = [{"beatmap_id": idx_beatmap.get(int(i)), "distance": float(dist[i])}
           for i in order if int(i) in idx_beatmap]
    print(json.dumps(out, indent=2))
    return 0


def cmd_tsne(args) -> int:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    table, tok, md = _load_space(args)
    flat = md.reset_index()
    mapper_of = dict(zip(flat["Id"], flat["UserId"]))
    idx_beatmap = {v: k for k, v in tok.beatmap_idx.items()}
    keep = [i for i in range(len(table)) if int(i) in idx_beatmap]
    emb = TSNE(n_components=2, random_state=1,
               perplexity=min(30, max(2, len(keep) - 1))).fit_transform(
        table[keep])
    colors = [hash(mapper_of.get(idx_beatmap[i], -1)) % 20 for i in keep]
    fig, ax = plt.subplots(figsize=(13, 9))
    ax.scatter(emb[:, 0], emb[:, 1], c=colors, cmap="tab20", s=14, alpha=0.8)
    ax.set_title("DiT style embeddings (t-SNE, colored by mapper)")
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({len(keep)} styles)")
    return 0


def cmd_svm(args) -> int:
    from sklearn import metrics, svm
    from sklearn.model_selection import train_test_split

    table, tok, _ = _load_space(args)
    tags = [t.strip() for t in args.tags.split(",")]
    if len(tags) != 2:
        raise SystemExit("--tags needs exactly two comma-separated tags")
    missing = [t for t in tags if t not in tok.descriptor_idx]
    if missing:
        raise SystemExit(f"tags not in corpus descriptors: {missing} "
                         f"(available: {sorted(tok.descriptor_idx)})")
    xs, ys = [], []
    for bid, descs in tok.beatmap_descriptors.items():
        if bid not in tok.beatmap_idx:
            continue
        for cls, tag in enumerate(tags):
            if tok.descriptor_idx[tag] in descs:
                xs.append(table[tok.beatmap_idx[bid]])
                ys.append(cls)
    if len(set(ys)) < 2:
        raise SystemExit("need examples of both tags in the corpus")
    x, y = np.stack(xs), np.asarray(ys)
    x_tr, x_te, y_tr, y_te = train_test_split(x, y, test_size=0.3,
                                              random_state=1, stratify=y)
    clf = svm.LinearSVC().fit(x_tr, y_tr)
    acc = metrics.accuracy_score(y_te, clf.predict(x_te))
    print(json.dumps({"tags": tags, "n": len(y),
                      "held_out_accuracy": round(float(acc), 4)}))
    return 0


def cmd_difficulties(args) -> int:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from beatheritage_tpu.data.dataset import load_mmrs_metadata

    md = load_mmrs_metadata(args.dataset)
    diffs = md["DifficultyRating"].to_numpy(np.float64)
    fig, ax = plt.subplots()
    ax.hist(diffs, bins=50)
    ax.set_xlabel("Difficulty")
    ax.set_ylabel("Count")
    ax.set_title("Beatmap difficulty distribution")
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} (n={len(diffs)}, "
          f"median={float(np.median(diffs)):.2f})")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--config", default="synth_b_v4")
        p.add_argument("--ckpt", required=True)
        p.add_argument("--dataset", default="/tmp/synth_mmrs_v4")
        p.add_argument("--device", default="cpu")

    p = sub.add_parser("similar")
    common(p)
    p.add_argument("--beatmap-id", type=int, required=True)
    p.add_argument("-k", type=int, default=10)
    p.set_defaults(fn=cmd_similar)

    p = sub.add_parser("tsne")
    common(p)
    p.add_argument("--out", default="/tmp/emb_tsne.png")
    p.set_defaults(fn=cmd_tsne)

    p = sub.add_parser("svm")
    common(p)
    p.add_argument("--tags", required=True,
                   help="two comma-separated descriptor tags")
    p.set_defaults(fn=cmd_svm)

    p = sub.add_parser("difficulties")
    p.add_argument("--dataset", default="/tmp/synth_mmrs_v4")
    p.add_argument("--out", default="/tmp/difficulties.png")
    p.set_defaults(fn=cmd_difficulties)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
