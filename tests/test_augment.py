"""EDM-style non-leaky augmentation (diffuse/augment.py) and its
conditioning path through the denoisers and the trainer."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.diffuse.augment import AUGMENT_DIM, AugmentPipe


def test_p_zero_is_identity_with_zero_labels():
    x = jax.random.normal(jax.random.key(0), (4, 8, 8, 3))
    out, labels = AugmentPipe(p=0.0)(jax.random.key(1), x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    assert labels.shape == (4, AUGMENT_DIM)
    np.testing.assert_array_equal(np.asarray(labels), 0.0)


def test_p_one_transforms_are_invertible_from_labels():
    """Labels fully determine the transform: applying the inverse recovers
    the input exactly (the non-leaky property's mechanical core)."""
    x = jax.random.normal(jax.random.key(2), (8, 16, 16, 3))
    out, labels = AugmentPipe(p=1.0)(jax.random.key(3), x)
    out, labels = np.asarray(out), np.asarray(labels)
    assert (labels[:, 5] == 1.0).all()  # every sample marked augmented
    s = x.shape[1]
    for b in range(x.shape[0]):
        img = out[b]
        # invert in reverse application order: translation, rotation, flip
        tx, ty = int(round(labels[b, 3] * s)), int(round(labels[b, 4] * s))
        img = np.roll(img, (-ty, -tx), axis=(0, 1))
        k = int(round(np.arctan2(labels[b, 2], labels[b, 1]) / (np.pi / 2))) % 4
        img = np.rot90(img, -k, (0, 1))
        if labels[b, 0] == 1.0:
            img = img[:, ::-1, :]
        np.testing.assert_allclose(img, np.asarray(x[b]), atol=1e-6)


def test_identity_rotation_label_distinct_from_no_rotation():
    """An applied transform with p=1 always sets the applied bit even when
    the pixels happen to be unchanged (tx=ty=0 draw) — the distinction that
    makes conditioning non-leaky."""
    x = jnp.ones((64, 8, 8, 1))
    _, labels = AugmentPipe(p=1.0)(jax.random.key(4), x)
    assert (np.asarray(labels)[:, 5] == 1.0).all()


def test_denoisers_consume_augment_labels():
    from diffulab_tpu.networks.denoisers.mmdit import MMDiT

    model = MMDiT(simple_dit=True, input_channels=3, inner_dim=32,
                  embedding_dim=32, num_heads=2, mlp_ratio=2, patch_size=2,
                  depth=1, n_classes=4, augment_dim=AUGMENT_DIM, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    t = jnp.array([0.3, 0.7])
    cond = {"y": jnp.array([0, 1])}
    base = model(x=x, timesteps=t, cond=cond)["x"]
    # zero-init embed: zero labels AND absent labels both equal the base
    zero = model(x=x, timesteps=t,
                 cond={**cond, "augment_labels": jnp.zeros((2, AUGMENT_DIM))})["x"]
    np.testing.assert_allclose(np.asarray(zero), np.asarray(base), atol=1e-6)
    # after perturbing the embed weights AND the (adaLN-zero) last-layer
    # modulation — which otherwise nulls the whole conditioning path at
    # init — labels change the output
    model.augment_embed.kernel[...] = jax.random.normal(
        jax.random.key(1), model.augment_embed.kernel[...].shape)
    mod = model.last_layer.adaLN_modulation.lin
    mod.kernel[...] = 0.1 * jax.random.normal(jax.random.key(2), mod.kernel[...].shape)
    on = model(x=x, timesteps=t,
               cond={**cond, "augment_labels": jnp.ones((2, AUGMENT_DIM))})["x"]
    off = model(x=x, timesteps=t, cond=cond)["x"]
    assert not np.allclose(np.asarray(on), np.asarray(off))


def test_trainer_augment_e2e_one_step():
    """The augmented train step runs and decreases loss over a few steps."""
    from diffulab_tpu.data.synthetic import SyntheticShapesDataset
    from diffulab_tpu.data.loader import DataLoader
    from diffulab_tpu.diffuse.diffuser import Diffuser
    from diffulab_tpu.networks.denoisers.mmdit import MMDiT
    from diffulab_tpu.training.trainer import BaseTrainer
    import optax
    import tempfile

    model = MMDiT(simple_dit=True, input_channels=3, inner_dim=32,
                  embedding_dim=32, num_heads=2, mlp_ratio=2, patch_size=2,
                  depth=1, n_classes=10, classifier_free=True,
                  augment_dim=AUGMENT_DIM, rngs=nnx.Rngs(0))
    diffuser = Diffuser(model, model_type="edm", n_steps=4, sampling_method="euler")
    ds = SyntheticShapesDataset(train=True, n_samples=64, image_size=8, seed=0)
    loader = DataLoader(ds, batch_size=16, shuffle=True, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        trainer = BaseTrainer(n_epoch=2, save_path=tmp, use_ema=False,
                              augment_p=0.5, async_checkpointing=False)
        trainer.train(diffuser=diffuser, optimizer=optax.adam(1e-3),
                      train_dataloader=loader, val_dataloader=loader,
                      log_validation_images=False)
        import json
        rows = [json.loads(l) for l in
                open(f"{tmp}/my_project/metrics.jsonl")]
        train_rows = [r["train/loss"] for r in rows if "train/loss" in r]
        assert len(train_rows) == 2 and np.isfinite(train_rows).all()


def test_trainer_augment_requires_model_support():
    from diffulab_tpu.diffuse.diffuser import Diffuser
    from diffulab_tpu.networks.denoisers.mmdit import MMDiT
    from diffulab_tpu.training.trainer import BaseTrainer
    from diffulab_tpu.data.synthetic import SyntheticShapesDataset
    from diffulab_tpu.data.loader import DataLoader
    import optax
    import pytest
    import tempfile

    model = MMDiT(simple_dit=True, input_channels=3, inner_dim=32,
                  embedding_dim=32, num_heads=2, mlp_ratio=2, patch_size=2,
                  depth=1, n_classes=10, rngs=nnx.Rngs(0))  # no augment_dim
    diffuser = Diffuser(model, model_type="rectified_flow", n_steps=4,
                        sampling_method="euler")
    ds = SyntheticShapesDataset(train=True, n_samples=16, image_size=8, seed=0)
    loader = DataLoader(ds, batch_size=8, shuffle=False, seed=0)
    with tempfile.TemporaryDirectory() as tmp:
        trainer = BaseTrainer(n_epoch=1, save_path=tmp, use_ema=False,
                              augment_p=0.2, async_checkpointing=False)
        with pytest.raises(AssertionError, match="augment_dim"):
            trainer.train(diffuser=diffuser, optimizer=optax.adam(1e-3),
                          train_dataloader=loader, val_dataloader=loader,
                          log_validation_images=False)
