"""LoRA adapter finetuning (training/lora.py; reference roadmap item
"Add possibility to train LORA/DORA", unimplemented there)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.training.lora import apply_lora, count_lora_params, merge_lora
from diffulab_tpu.training.optim import adamw
from diffulab_tpu.training.trainer import BaseTrainer


def _model(live_gates: bool = False):
    model = MMDiT(
        simple_dit=True, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=4, mlp_ratio=2, patch_size=2, depth=2, n_classes=10,
        classifier_free=True, rngs=nnx.Rngs(0),
    )
    if live_gates:
        # adaLN-zero gates are zero at init, hiding block-internal changes
        # from the output; nudge every param so adapter effects are visible
        state = nnx.state(model, nnx.Param)
        keys = iter(jax.random.split(jax.random.key(99), 4096))
        state = jax.tree.map(
            lambda v: v + jax.random.normal(next(keys), v.shape, v.dtype) * 0.05, state
        )
        nnx.update(model, state)
    return model


def _fwd(model, seed=1):
    x = jax.random.normal(jax.random.key(seed), (2, 8, 8, 3))
    t = jnp.asarray([0.3, 0.7])
    y = jnp.asarray([1, 2])
    return np.asarray(model(x, t, cond={"y": y})["x"])


def test_apply_lora_is_identity_at_init():
    model = _model()
    ref = _fwd(model)
    n = apply_lora(model, rank=4, rngs=nnx.Rngs(1))
    assert n == 2 * 4  # depth 2 x (qkv, proj_out, fc_in, fc_out)
    np.testing.assert_allclose(_fwd(model), ref, atol=1e-6)
    assert count_lora_params(model) > 0


def test_lora_merge_matches_adapted_forward():
    model = _model(live_gates=True)
    ref = _fwd(model)
    apply_lora(model, rank=4, rngs=nnx.Rngs(1))
    # perturb adapters so the LoRA delta is non-trivial
    state = nnx.state(model, nnx.LoRAParam)
    keys = iter(jax.random.split(jax.random.key(42), 1000))
    perturbed = jax.tree.map(
        lambda v: v + jax.random.normal(next(keys), v.shape) * 0.02, state
    )
    nnx.update(model, perturbed)
    adapted = _fwd(model)
    assert not np.allclose(adapted, ref)
    n = merge_lora(model)
    assert n > 0
    # adapters folded into base kernels: plain Linears, same function
    assert count_lora_params(model) == 0
    np.testing.assert_allclose(_fwd(model), adapted, atol=1e-5, rtol=1e-5)


class _PairsDS:
    def __init__(self, n=32):
        rng = np.random.default_rng(0)
        self.x = rng.standard_normal((n, 8, 8, 3)).astype(np.float32)
        self.y = rng.integers(0, 10, n).astype(np.int64)

    def __len__(self):
        return len(self.x)

    def get_batch(self, idx):
        i = np.asarray(idx)
        return {"model_inputs": {"x": self.x[i], "y": self.y[i]}}


def test_lora_only_training_freezes_base(tmp_path):
    model = _model()
    apply_lora(model, rank=4, rngs=nnx.Rngs(1))
    base_before = jax.tree.map(
        np.asarray, nnx.state(model, nnx.All(nnx.Param, nnx.Not(nnx.LoRAParam)))
    )
    lora_before = jax.tree.map(np.asarray, nnx.state(model, nnx.LoRAParam))

    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=4)
    trainer = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="lora")
    trainer.train(
        diffuser, adamw(lr=1e-2), DataLoader(_PairsDS(), batch_size=16, prefetch=0),
        DataLoader(_PairsDS(16), batch_size=16, shuffle=False, prefetch=0),
        log_validation_images=False, lora_only=True,
    )

    base_after = jax.tree.map(
        np.asarray, nnx.state(model, nnx.All(nnx.Param, nnx.Not(nnx.LoRAParam)))
    )
    lora_after = jax.tree.map(np.asarray, nnx.state(model, nnx.LoRAParam))
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(base_after)):
        np.testing.assert_array_equal(a, b)  # frozen
    moved = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree.leaves(lora_before), jax.tree.leaves(lora_after))
    ]
    assert max(moved) > 0  # adapters trained


def test_dora_identity_at_init_and_merge():
    from diffulab_tpu.training.lora import DoRALinear, apply_lora as _apply

    model = _model(live_gates=True)
    ref = _fwd(model)
    n = _apply(model, rank=4, rngs=nnx.Rngs(2), variant="dora")
    assert n == 8
    # magnitude = ||W||_col and B = 0 -> exact identity
    np.testing.assert_allclose(_fwd(model), ref, atol=1e-5)

    # perturb adapters (including magnitudes), then merge back to plain Linears
    state = nnx.state(model, nnx.LoRAParam)
    keys = iter(jax.random.split(jax.random.key(43), 1000))
    perturbed = jax.tree.map(
        lambda v: v + jax.random.normal(next(keys), v.shape) * 0.02, state
    )
    nnx.update(model, perturbed)
    adapted = _fwd(model)
    assert not np.allclose(adapted, ref)
    merged = merge_lora(model)
    assert merged == 8 and count_lora_params(model) == 0
    np.testing.assert_allclose(_fwd(model), adapted, atol=1e-5, rtol=1e-5)


def test_dora_magnitude_trains_under_lora_only(tmp_path):
    from diffulab_tpu.training.lora import apply_lora as _apply

    model = _model()
    _apply(model, rank=4, rngs=nnx.Rngs(2), variant="dora")
    diffuser = Diffuser(model, sampling_method="euler", model_type="rectified_flow", n_steps=4)
    trainer = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name="dora")
    trainer.train(
        diffuser, adamw(lr=1e-2), DataLoader(_PairsDS(), batch_size=16, prefetch=0),
        DataLoader(_PairsDS(16), batch_size=16, shuffle=False, prefetch=0),
        log_validation_images=False, lora_only=True,
    )
    lora_state = nnx.state(model, nnx.LoRAParam)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(lora_state))
