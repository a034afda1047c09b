"""diffulab_tpu — a TPU-native diffusion-model training framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of DiffuLab
(https://github.com/LouisRouss/DiffuLab), organized around the same three
orthogonal blocks:

- **Architectures** (`diffulab_tpu.networks`): UNet, DiT/MMDiT, DDT, SprintDiT
  as Flax NNX modules backed by a Pallas flash-attention kernel.
- **Formalizations** (`diffulab_tpu.diffuse`): rectified flow / flow matching and
  Gaussian diffusion (DDPM) as pure, jit-compiled loss + schedule functions.
- **Samplers** (`diffulab_tpu.diffuse.samplers`): Euler, Euler–Maruyama (with
  transition log-probs for GRPO), DDPM ancestral, DDIM — all fused into a single
  `jax.lax.scan` denoising loop under jit.

Training (`diffulab_tpu.training`) replaces HF Accelerate with sharded
`jax.jit` over a `jax.sharding.Mesh` (data/fsdp/tensor axes over ICI), with EMA,
bf16 mixed precision, gradient accumulation, Orbax checkpointing, and
wandb-compatible logging. Data (`diffulab_tpu.data`) provides MNIST/CIFAR
parsers, a sharded streaming dataset format, and aspect-ratio bucketing.
"""

__version__ = "0.1.0"

import flax as _flax

# Parameters carry logical-axis sharding annotations (nnx.with_partitioning) so
# the parallel layer can shard them onto a mesh; disable flax's eager sharding
# so models can also be created without an active mesh context (single-chip,
# CPU tests). diffulab_tpu.parallel applies the shardings explicitly.
_flax.config.update("flax_always_shard_variable", False)

