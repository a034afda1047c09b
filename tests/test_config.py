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


# --- hydra-multirun-style sweeps (config/sweep.py) -------------------------

def test_split_top_level_commas():
    from diffulab_tpu.config.sweep import split_top_level_commas

    assert split_top_level_commas("0.99,0.999") == ["0.99", "0.999"]
    # commas inside brackets/quotes are list/string syntax, not choice axes
    assert split_top_level_commas("[2, 10]") == ["[2, 10]"]
    assert split_top_level_commas("[1,2],[2,3]") == ["[1,2]", "[2,3]"]
    assert split_top_level_commas("'a,b',c") == ["'a,b'", "c"]
    assert split_top_level_commas("{a: 1, b: 2}") == ["{a: 1, b: 2}"]


def test_expand_sweep_cartesian_product():
    from diffulab_tpu.config.sweep import expand_sweep

    runs = expand_sweep(["trainer.ema_rate=0.99,0.999", "optimizer.lr=1e-4",
                         "diffuser.n_steps=4,8"])
    assert len(runs) == 4  # 2 x 1 x 2; the non-swept axis stays constant
    tags = [tag for _, tag in runs]
    assert tags[0] == "trainer.ema_rate=0.99,diffuser.n_steps=4"
    assert tags[-1] == "trainer.ema_rate=0.999,diffuser.n_steps=8"
    for concrete, _ in runs:
        assert "optimizer.lr=1e-4" in concrete
        assert len(concrete) == 3


def test_expand_sweep_no_axes_is_single_run():
    from diffulab_tpu.config.sweep import expand_sweep

    runs = expand_sweep(["trainer.n_epoch=2", "model.cache_span=[2, 10]"])
    assert len(runs) == 1
    concrete, tag = runs[0]
    assert tag == ""
    assert concrete == ["trainer.n_epoch=2", "model.cache_span=[2, 10]"]


def test_tag_to_dirname_is_filesystem_safe():
    from diffulab_tpu.config.sweep import tag_to_dirname

    assert "/" not in tag_to_dirname("a=[1, 2]/x,b='q'")
    assert " " not in tag_to_dirname("a=[1, 2]")


def test_sweep_cli_end_to_end(tmp_path):
    """--sweep drives N sequential tiny runs with templated run dirs."""
    import json
    import os
    import subprocess
    import sys

    repo = Path(__file__).parent.parent
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "examples/train_diffusion.py", "--sweep",
         "--config-name", "train_synthetic_flow_matching",
         "trainer.n_epoch=1", "trainer.val_steps=2", "trainer.posthoc_ema=false",
         "model.inner_dim=32", "model.embedding_dim=32", "model.num_heads=4",
         "model.depth=2", "dataset.train.n_samples=32", "dataset.val.n_samples=16",
         "dataloader.batch_size=16", "diffuser.n_steps=4",
         f"trainer.save_path={tmp_path}", "trainer.precision_type=no",
         "optimizer.lr=1e-4,3e-4"],
        cwd=repo, capture_output=True, text=True, timeout=1800, env=env,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "sweep: 2 runs" in proc.stdout
    for lr in ("1e-4", "3e-4"):
        metrics = (tmp_path / "synthetic_flow_matching" / f"optimizer.lr={lr}"
                   / "metrics.jsonl")
        assert metrics.exists(), f"missing templated run dir for lr={lr}"
        rows = [json.loads(line) for line in metrics.read_text().splitlines()]
        assert any("train/loss" in r for r in rows)
