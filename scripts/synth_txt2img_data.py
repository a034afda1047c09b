"""Synthesize the txt2img / GRPO multi-aspect-ratio dataset (zero-egress).

Produces `ShardedDataset` shards with the columns `ImageNetmultiAR`
(diffulab_tpu/data/imagenet.py) consumes — `vision_latents` (NHWC, mixed
aspect-ratio buckets), `caption`, `caption_embeddings`, `caption_mask`,
optionally per-token `dst_features` — plus `data/null_embedding.npy` for the
PrecomputedEmbedder. This is the dataset the BASELINE configs 5-6 and the
GRPO alignment recipe drive (verify-skill recipes; reference imagenet.py
expects the same fields from a real precompute pass).

Usage:
    python scripts/synth_txt2img_data.py --out data/imagenet_txt \
        --n-train 64 --n-val 16 --latent-channels 128 --buckets 4x4 4x8
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from diffulab_tpu.data.streaming import ShardedDatasetWriter

WORDS = ("red circle bright dark square blue triangle large small glowing "
         "dim shape pattern grid soft hard light shadow vivid pale").split()


def write_split(out_dir: Path, n: int, buckets, latent_channels: int,
                emb_len: int, emb_dim: int, dst_dim: int | None, seed: int) -> None:
    rng = np.random.default_rng(seed)
    writer = ShardedDatasetWriter(out_dir, shard_size=1024)
    for i in range(n):
        h, w = buckets[i % len(buckets)]
        caption = " ".join(rng.choice(WORDS, size=5))
        sample = {
            "vision_latents": rng.normal(0, 1, (h, w, latent_channels)).astype(np.float32),
            "caption": caption,
            "caption_embeddings": rng.normal(0, 1, (emb_len, emb_dim)).astype(np.float32),
            "caption_mask": (np.arange(emb_len) < int(rng.integers(2, emb_len + 1))),
        }
        if dst_dim is not None:
            sample["dst_features"] = rng.normal(0, 1, (h * w, dst_dim)).astype(np.float32)
        writer.write(sample)
    writer.close()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="data/imagenet_txt")
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-val", type=int, default=16)
    p.add_argument("--buckets", nargs="+", default=["4x4", "4x8"],
                   help="latent HxW buckets, e.g. 4x4 4x8")
    p.add_argument("--latent-channels", type=int, default=128,
                   help="128 = flux2-shrunk (latent_channels=32, 2x2 packed)")
    p.add_argument("--emb-len", type=int, default=8)
    p.add_argument("--emb-dim", type=int, default=512)
    p.add_argument("--dst-dim", type=int, default=None,
                   help="per-token REPA feature dim (omit for GRPO)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    buckets = [tuple(int(v) for v in b.split("x")) for b in args.buckets]
    out = Path(args.out)
    write_split(out / "train", args.n_train, buckets, args.latent_channels,
                args.emb_len, args.emb_dim, args.dst_dim, args.seed)
    write_split(out / "val", args.n_val, buckets, args.latent_channels,
                args.emb_len, args.emb_dim, args.dst_dim, args.seed + 1)
    null_path = Path("data/null_embedding.npy")
    if not null_path.exists():
        null_path.parent.mkdir(parents=True, exist_ok=True)
        np.save(null_path, np.zeros((args.emb_len, args.emb_dim), np.float32))
    print(f"wrote {args.n_train}+{args.n_val} samples to {out} "
          f"(buckets {buckets}, C={args.latent_channels}); null embedding at {null_path}")


if __name__ == "__main__":
    main()
