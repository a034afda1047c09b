"""Config composition + instantiation tests against the real config tree."""

from pathlib import Path

import optax
import pytest

from diffulab_tpu.config import compose_config, instantiate

CONFIG_DIR = Path(__file__).parent.parent / "configs"


def test_compose_cifar10_flow():
    cfg = compose_config(CONFIG_DIR, "train_cifar10_flow_matching")
    assert cfg["model"]["_target_"].endswith("MMDiT")
    assert cfg["trainer"]["project_name"] == "cifar10_flow_matching"  # _self_ override wins
    assert cfg["trainer"]["use_ema"] is True  # from trainer/default.yaml
    assert cfg["diffuser"]["n_steps"] == 100  # experiment override
    assert cfg["dataloader"]["batch_size"] == 32


def test_dotlist_overrides():
    cfg = compose_config(
        CONFIG_DIR, "train_cifar10_flow_matching",
        ["trainer.n_epoch=3", "model.depth=2", "dataloader.batch_size=8"],
    )
    assert cfg["trainer"]["n_epoch"] == 3
    assert cfg["model"]["depth"] == 2
    assert cfg["dataloader"]["batch_size"] == 8


def test_group_override_swaps_selection():
    cfg = compose_config(CONFIG_DIR, "train_cifar10_flow_matching", ["optimizer=sgd"])
    assert cfg["optimizer"]["_target_"].endswith("sgd")


def test_instantiate_optimizer():
    cfg = compose_config(CONFIG_DIR, "train_cifar10_flow_matching")
    opt = instantiate(cfg["optimizer"])
    assert isinstance(opt, optax.GradientTransformation)


def test_instantiate_model_with_kwargs():
    from flax import nnx

    cfg = compose_config(
        CONFIG_DIR, "train_cifar10_flow_matching",
        ["model.depth=1", "model.inner_dim=32", "model.embedding_dim=32", "model.num_heads=2"],
    )
    model = instantiate(cfg["model"], rngs=nnx.Rngs(0))
    assert model.simple_dit is True
    assert len(model.layers) == 1


def test_instantiate_rejects_unknown_target():
    with pytest.raises(ImportError):
        instantiate({"_target_": "not.a.real.module.Thing"})


def test_precision_type_selects_model_dtype():
    import jax.numpy as jnp

    from diffulab_tpu.config.instantiate import model_dtype_kwargs

    assert model_dtype_kwargs({"precision_type": "bf16"}) == {"dtype": jnp.bfloat16}
    assert model_dtype_kwargs({"precision_type": "no"}) == {}
    assert model_dtype_kwargs({}) == {}
