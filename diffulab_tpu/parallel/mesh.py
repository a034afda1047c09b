"""Device mesh construction (replaces the reference's out-of-band
``accelerate config``, SURVEY.md §2.1/§5.8).

The mesh has three axes:
- ``data``: pure data parallelism (DDP parity with the reference);
- ``fsdp``: parameter sharding along the "embed" logical axis (ZeRO-ish);
  batches are sharded over (data, fsdp) jointly;
- ``tensor``: Megatron-style tensor parallelism along the "hidden" logical
  axis (qkv/mlp columns, proj rows) — XLA inserts the all-reduces over ICI.

Single-chip and CPU-test configurations collapse to a 1x1x1 mesh transparently.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh axis sizes. ``data=-1`` absorbs all remaining devices.

    ``sp`` (sequence parallel: ring attention shards the token axis),
    ``expert`` (MoE all-to-all), and ``pipe`` (GPipe-over-ppermute stages)
    default to 1 — size-1 mesh axes are free, so every config shares one
    6-axis mesh shape.
    """

    data: int = -1
    fsdp: int = 1
    tensor: int = 1
    sp: int = 1
    expert: int = 1
    pipe: int = 1

    def resolve(self, n_devices: int | None = None) -> tuple[int, int, int, int, int, int]:
        n = n_devices if n_devices is not None else jax.device_count()
        fixed = self.fsdp * self.tensor * self.sp * self.expert * self.pipe
        data = self.data
        if data == -1:
            assert n % fixed == 0, (
                f"device count {n} not divisible by fsdp*tensor*sp*expert*pipe={fixed}"
            )
            data = n // fixed
        assert data * fixed == n, (
            f"mesh {data}x{self.fsdp}x{self.tensor}x{self.sp}x{self.expert}x{self.pipe}"
            f" != device count {n}"
        )
        return data, self.fsdp, self.tensor, self.sp, self.expert, self.pipe


AXIS_NAMES = ("data", "fsdp", "tensor", "sp", "expert", "pipe")


def make_mesh(config: MeshConfig | None = None, devices=None) -> Mesh:
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    dims = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(*dims)
    return Mesh(dev_array, AXIS_NAMES)


def initialize_distributed() -> None:
    """Multi-host bring-up: `jax.distributed.initialize()` (idempotent no-op on
    a single host). The reference's analog is Accelerate's process-group init
    (trainers/common.py:103-109)."""
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def is_main_process() -> bool:
    """Host-0 gating (replaces accelerator.is_main_process)."""
    return jax.process_index() == 0
