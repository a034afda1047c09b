"""Offline precompute entry point: VAE latents, REPA features, caption embeddings.

The reference exposes these as methods only (vision_towers/common.py:86-178,
repa/common.py:62-139); this CLI drives them over the sharded streaming
dataset format so the training configs' precomputed paths can be produced
end-to-end:

    # add vision_latents to a dataset
    python examples/precompute.py latents --config vision_tower=flux2 \
        --src data/imagenet_raw/train --dst data/imagenet/train

    # add dst_features (DINO features for REPA)
    python examples/precompute.py features --encoder dinov2 \
        --src data/imagenet/train --dst data/imagenet_repa/train

    # add caption embeddings (Qwen/SD3/SmolVLM, local weights)
    python examples/precompute.py captions --embedder qwen \
        --src data/imagenet/train --dst data/imagenet_txt/train
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))  # allow running without install

from flax import nnx

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("mode", choices=["latents", "features", "captions"])
    parser.add_argument("--src", required=True, help="source sharded dataset dir")
    parser.add_argument("--dst", required=True, help="destination dataset dir")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--vision-tower", default="flux2", help="config group name (latents)")
    parser.add_argument("--encoder", default="dinov2", help="dinov2|dinov3 (features)")
    parser.add_argument("--encoder-args", default="{}", help="yaml dict of encoder kwargs")
    parser.add_argument("--embedder", default="qwen", help="config group name (captions)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import yaml

    from diffulab_tpu.config import instantiate, load_yaml

    rngs = nnx.Rngs(args.seed)
    if args.mode == "latents":
        tower = instantiate(load_yaml(CONFIG_DIR / "vision_tower" / f"{args.vision_tower}.yaml"),
                            rngs=rngs)
        tower.compute_on_dataset(args.src, args.dst, batch_size=args.batch_size, seed=args.seed)
    elif args.mode == "features":
        from diffulab_tpu.training.losses.repa import RepaLoss

        encoder_cls = RepaLoss.encoder_registry[args.encoder]
        encoder = encoder_cls(**yaml.safe_load(args.encoder_args), rngs=rngs)
        encoder.compute_on_dataset(args.src, args.dst, batch_size=args.batch_size)
    else:  # captions
        embedder = instantiate(load_yaml(CONFIG_DIR / "embedder" / f"{args.embedder}.yaml"),
                               rngs=rngs)
        embedder.compute_on_dataset(args.src, args.dst, batch_size=args.batch_size)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
