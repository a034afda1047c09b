"""AOT sampler export for deployment/serving.

The reference has no deployment story (models are sampled through the live
torch modules); on TPU the natural artifact is the compiled program itself:
`jax.export` serializes the traced + lowered StableHLO of the full jitted
reverse process (scan, fused CFG, optional VAE decode — exactly what
`Diffuser.generate` compiles), and the parameters ship alongside as a flat
npz. The resulting directory is self-contained: serving needs jax + numpy
only — no diffulab_tpu model code, no flax, no checkpoint-restore logic.

Layout of an artifact directory:

    sampler.jaxexport   serialized jax.export blob (StableHLO + calling conv)
    params.npz          flat parameter leaves, insertion-ordered (p0, p1, ...)
    manifest.json       shapes/dtypes of rng + cond inputs, sampling config

Export runs on the platform the artifact targets (export on a TPU host for
TPU serving): the lowering bakes platform-specific custom calls (e.g. the
Pallas attention kernels only exist in TPU lowerings).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

MANIFEST_VERSION = 1


def export_generate(
    diffuser: Any,
    cond_spec: dict[str, jax.ShapeDtypeStruct],
    batch_size: int,
    image_shape: tuple[int, ...],
    out_dir: str | Path,
    guidance_scale: float = 0.0,
    clamp_x: bool = True,
    dtype: Any = jnp.float32,
) -> Path:
    """Export ``diffuser.generate`` for fixed shapes into ``out_dir``.

    ``cond_spec`` maps conditioning keys to per-sample ShapeDtypeStructs
    (without the batch dim) — e.g. ``{"y": ShapeDtypeStruct((), int32)}`` for
    class labels. ``image_shape`` is the per-sample data shape the reverse
    process integrates over (latent shape in latent mode).
    """
    from flax import nnx

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    use_cfg = guidance_scale > 0
    decode = diffuser.vision_tower is not None
    graphdef, state = nnx.split(diffuser.denoiser)
    tower_graphdef = tower_state = None
    if decode:
        tower_graphdef, tower_state = nnx.split(diffuser.vision_tower)

    # flatten parameters to plain arrays: the exported calling convention is
    # (p0, p1, ..., rng_key_data, cond_0, cond_1, ...) so loading needs no
    # pytree registry beyond lists/dicts of arrays
    leaves, treedef = jax.tree.flatten(state)
    tower_leaves, tower_treedef = ([], None)
    if decode:
        tower_leaves, tower_treedef = jax.tree.flatten(tower_state)
    cond_keys = sorted(cond_spec)
    diffusion = diffuser.diffusion
    latent_scale = diffuser.latent_scale if decode else None
    latent_bias = diffuser.latent_bias if decode else None
    n_leaves = len(leaves)

    def sample_flat(params_flat, tower_flat, key_data, *cond_arrays):
        m = nnx.merge(graphdef, jax.tree.unflatten(treedef, params_flat))

        def model_fn(**kw):
            return m(**kw, train=False)

        cond = dict(zip(cond_keys, cond_arrays))
        rng = jax.random.wrap_key_data(key_data)
        out = diffusion.denoise(
            model_fn, cond, rng,
            data_shape=(batch_size, *image_shape), clamp_x=clamp_x,
            guidance_scale=jnp.float32(guidance_scale), use_cfg=use_cfg,
            dtype=dtype,
        )
        x = out["x"]
        if decode:
            tower = nnx.merge(tower_graphdef, jax.tree.unflatten(tower_treedef, tower_flat))
            x = tower.decode(x / latent_scale + latent_bias)
        return x

    key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)  # raw key data
    cond_in_specs = [
        jax.ShapeDtypeStruct((batch_size, *cond_spec[k].shape), cond_spec[k].dtype)
        for k in cond_keys
    ]
    param_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves]
    tower_specs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in tower_leaves]

    from jax import export as jax_export

    exp = jax_export.export(jax.jit(sample_flat))(
        param_specs, tower_specs, key_spec, *cond_in_specs
    )
    (out_dir / "sampler.jaxexport").write_bytes(exp.serialize())

    all_leaves = list(leaves) + list(tower_leaves)
    np.savez(
        out_dir / "params.npz",
        **{f"p{i}": np.asarray(l) for i, l in enumerate(all_leaves)},
    )
    manifest = {
        "version": MANIFEST_VERSION,
        "n_params": n_leaves,
        "n_tower_params": len(tower_leaves),
        "batch_size": batch_size,
        "image_shape": list(image_shape),
        "guidance_scale": guidance_scale,
        "n_steps": int(diffusion.steps),
        "cond": {
            k: {"shape": list(cond_spec[k].shape), "dtype": np.dtype(cond_spec[k].dtype).name}
            for k in cond_keys
        },
        "platforms": list(exp.platforms),
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return out_dir


class DeployedSampler:
    """Serve an exported artifact with jax + numpy only.

    >>> sampler = DeployedSampler("artifact/")
    >>> images = sampler(seed=0, y=np.array([1, 2, 3, 4]))
    """

    def __init__(self, artifact_dir: str | Path):
        from jax import export as jax_export

        artifact_dir = Path(artifact_dir)
        self.manifest = json.loads((artifact_dir / "manifest.json").read_text())
        if self.manifest["version"] != MANIFEST_VERSION:
            raise ValueError(f"unsupported artifact version {self.manifest['version']}")
        self._exp = jax_export.deserialize(
            (artifact_dir / "sampler.jaxexport").read_bytes()
        )
        blob = np.load(artifact_dir / "params.npz")
        n, nt = self.manifest["n_params"], self.manifest["n_tower_params"]
        leaves = [jnp.asarray(blob[f"p{i}"]) for i in range(n + nt)]
        self._params, self._tower = leaves[:n], leaves[n:]
        self._cond_keys = sorted(self.manifest["cond"])

    @property
    def batch_size(self) -> int:
        return self.manifest["batch_size"]

    def __call__(self, seed: int = 0, **cond: np.ndarray) -> np.ndarray:
        missing = set(self._cond_keys) - set(cond)
        if missing:
            raise ValueError(f"missing conditioning inputs: {sorted(missing)}")
        key_data = jax.random.key_data(jax.random.key(seed)).astype(jnp.uint32)
        cond_arrays = []
        for k in self._cond_keys:
            spec = self.manifest["cond"][k]
            arr = jnp.asarray(cond[k], dtype=spec["dtype"])
            want = (self.batch_size, *spec["shape"])
            if arr.shape != want:
                raise ValueError(f"cond '{k}' must have shape {want}, got {arr.shape}")
            cond_arrays.append(arr)
        out = self._exp.call(self._params, self._tower, key_data, *cond_arrays)
        return np.asarray(out)
