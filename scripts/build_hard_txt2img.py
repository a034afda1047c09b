"""Build the hard latent txt2img benchmark (VERDICT r4 item 1, round 5).

Three phases (``--phase all`` runs them in order):

1. ``tower``  — train the shrunk flux2 KL-VAE (networks/vision_towers/flux2.py)
   on the compositional scenes distribution (recon MSE + KL), measure the
   per-channel packed-latent stats, and save an orbax checkpoint that
   ``Flux2VAE(flax_ckpt=...)`` restores. Prints the tower quality gates:
   recon MSE, FID-judge accuracy of reconstructions (the caption judge must
   still read the attributes off decoded images), and pixel PSNR.
2. ``shards`` — encode train/val splits through the frozen trained tower and
   write `ShardedDataset` shards with the `ImageNetmultiAR` columns
   (vision_latents / caption / caption_embeddings / caption_mask) plus the
   PrecomputedEmbedder null embedding.
3. ``report`` — judge-check the tower by decoding val latents back.

The real images are NOT stored: the splits re-render deterministically from
seed (SyntheticCompositionalDataset), which is how evaluate_txt2img.py gets
its FID reference set.

Usage (chip):
    python scripts/build_hard_txt2img.py --phase all --out data/hard_txt2img
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import nnx

from diffulab_tpu.data.streaming import ShardedDatasetWriter
from diffulab_tpu.data.synthetic_txt2img import (
    SyntheticCompositionalDataset,
    caption_consistency,
    caption_embedding_table,
    embed_captions,
    EMB_LEN,
)
from diffulab_tpu.networks.vision_towers.flux2 import Flux2VAE
from diffulab_tpu.training.checkpoint import save_checkpoint

TOWER_KW = dict(base_channels=32, ch_mult=(1, 2), num_res_blocks=1, latent_channels=8)
EMB_DIM = 512


def build_tower(seed: int = 0, flax_ckpt: str | None = None) -> Flux2VAE:
    return Flux2VAE(**TOWER_KW, flax_ckpt=flax_ckpt, rngs=nnx.Rngs(seed))


def train_tower(out: Path, images_u8: np.ndarray, epochs: int, batch: int,
                lr: float, kl_weight: float, seed: int) -> Flux2VAE:
    tower = build_tower(seed)
    graphdef, params, rest = nnx.split(tower, nnx.Param, ...)
    optimizer = optax.adamw(lr)
    opt_state = optimizer.init(params)
    images = images_u8.astype(np.float32) / 127.5 - 1.0

    @jax.jit
    def step(params, opt_state, x, rng):
        def loss_fn(params):
            t = nnx.merge(graphdef, params, rest)
            moments = t.encoder(x)
            mean, logvar = jnp.split(moments, 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
            recon = t.decoder(z)
            mse = jnp.mean((recon - x) ** 2)
            kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
            return mse + kl_weight * kl, (mse, kl)

        (_, (mse, kl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, mse, kl

    rng = np.random.default_rng(seed)
    n = len(images)
    key = jax.random.key(seed)
    t0 = time.perf_counter()
    it = 0
    for epoch in range(epochs):
        order = rng.permutation(n)
        for s0 in range(0, n - batch + 1, batch):
            x = jnp.asarray(images[order[s0 : s0 + batch]])
            params, opt_state, mse, kl = step(params, opt_state, x,
                                              jax.random.fold_in(key, it))
            it += 1
        print(f"tower epoch {epoch + 1}/{epochs}: recon_mse={float(mse):.5f} "
              f"kl={float(kl):.3f} ({time.perf_counter() - t0:.0f}s)", flush=True)

    tower = nnx.merge(graphdef, params, rest)

    # packed-latent stats over a subset (mean latents: rng=None -> mode)
    enc = jax.jit(lambda x: tower.encode(x))
    lats = []
    for s0 in range(0, min(n, 2048), batch):
        lats.append(np.asarray(enc(jnp.asarray(images[s0 : s0 + batch]))))
    lat = np.concatenate(lats)
    mean = lat.mean(axis=(0, 1, 2)).reshape(1, 1, 1, -1)
    std = lat.std(axis=(0, 1, 2)).reshape(1, 1, 1, -1)
    save_checkpoint(out / "tower", {
        "encoder": nnx.state(tower.encoder),
        "decoder": nnx.state(tower.decoder),
        "latent_scale": (1.0 / np.maximum(std, 1e-4)).astype(np.float32),
        "latent_bias": mean.astype(np.float32),
    })
    print(f"tower saved to {out / 'tower'}; latent std range "
          f"[{std.min():.3f}, {std.max():.3f}]")
    return build_tower(seed, flax_ckpt=str(out / "tower"))


def tower_report(tower: Flux2VAE, ds: SyntheticCompositionalDataset, batch: int) -> None:
    images = ds.images.astype(np.float32) / 127.5 - 1.0
    rec_fn = jax.jit(lambda x: tower.decode(tower.encode(x)))
    recs = []
    for s0 in range(0, len(images), batch):
        recs.append(np.asarray(rec_fn(jnp.asarray(images[s0 : s0 + batch]))))
    rec = np.concatenate(recs)[: len(images)]
    mse = float(np.mean((rec - images) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # [-1,1] range -> peak-to-peak 2
    acc = caption_consistency(rec, ds.captions)
    print(f"tower gate: recon mse={mse:.5f} psnr={psnr:.1f}dB "
          f"judge-on-recons={acc}")


def write_shards(out: Path, tower: Flux2VAE, table: np.ndarray, batch: int,
                 n_train: int, n_val: int, image_size: int, seed: int) -> None:
    enc = jax.jit(lambda x: tower.encode(x))
    for split, n, train in (("train", n_train, True), ("val", n_val, False)):
        ds = SyntheticCompositionalDataset(train=train, n_samples=n,
                                           image_size=image_size, seed=seed)
        emb, mask = embed_captions(ds.captions, table)
        writer = ShardedDatasetWriter(out / split, shard_size=2048)
        for s0 in range(0, n, batch):
            x = jnp.asarray(ds.images[s0 : s0 + batch].astype(np.float32) / 127.5 - 1.0)
            lat = np.asarray(enc(x), np.float32)
            for j in range(lat.shape[0]):
                i = s0 + j
                if i >= n:
                    break
                writer.write({
                    "vision_latents": lat[j],
                    "caption": ds.captions[i],
                    "caption_embeddings": emb[i],
                    "caption_mask": mask[i],
                    "label": int(ds.labels[i]),
                })
        writer.close()
        print(f"wrote {n} {split} samples to {out / split}")
    np.save(out / "null_embedding.npy", np.zeros((EMB_LEN, table.shape[1]), np.float32))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--phase", choices=("tower", "shards", "report", "all"), default="all")
    p.add_argument("--out", default="data/hard_txt2img")
    p.add_argument("--n-train", type=int, default=10_000)
    p.add_argument("--n-val", type=int, default=2_000)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--kl-weight", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    train_ds = SyntheticCompositionalDataset(
        train=True, n_samples=args.n_train, image_size=args.image_size, seed=args.seed
    )
    if args.phase in ("tower", "all"):
        tower = train_tower(out, train_ds.images, args.epochs, args.batch,
                            args.lr, args.kl_weight, args.seed)
    else:
        tower = build_tower(args.seed, flax_ckpt=str(out / "tower"))

    if args.phase in ("report", "tower", "all"):
        val_ds = SyntheticCompositionalDataset(
            train=False, n_samples=min(args.n_val, 512),
            image_size=args.image_size, seed=args.seed,
        )
        tower_report(tower, val_ds, args.batch)

    if args.phase in ("shards", "all"):
        table = caption_embedding_table(EMB_DIM)
        write_shards(out, tower, table, args.batch, args.n_train, args.n_val,
                     args.image_size, args.seed)


if __name__ == "__main__":
    main()
