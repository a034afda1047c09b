"""In-graph trainable text embedder (reference capability
train_embedder=True, base_trainer.py:291-293): tokenizer, CFG-drop
semantics, and joint fine-tuning under jit — the embedder's params must
receive real gradients when train_embedder=True and stay frozen otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.embedders.trainable import (
    BOS_ID,
    PAD_ID,
    TrainableTextEmbedder,
    byte_tokenize,
)
from diffulab_tpu.training.optim import adamw
from diffulab_tpu.training.trainer import BaseTrainer


def test_byte_tokenize():
    out = byte_tokenize(["hi", ""], max_len=8)
    assert out["token_ids"].shape == (2, 8)
    np.testing.assert_array_equal(
        out["token_ids"][0], [BOS_ID, ord("h") + 2, ord("i") + 2] + [PAD_ID] * 5
    )
    assert out["attn_mask"][0].tolist() == [True] * 3 + [False] * 5
    # empty string is BOS-only — the null prompt
    assert out["token_ids"][1].tolist() == [BOS_ID] + [PAD_ID] * 7
    # truncation keeps BOS + first max_len-1 bytes
    long = byte_tokenize(["x" * 100], max_len=8)
    assert long["attn_mask"][0].all()


def _embedder(pooled=False, seed=0):
    return TrainableTextEmbedder(dim=32, depth=2, num_heads=2, max_len=16,
                                 pooled=pooled, rngs=nnx.Rngs(seed))


def test_forward_and_cfg_drop():
    emb = _embedder(pooled=True)
    ctx = jax.tree.map(jnp.asarray, emb.tokenize(["a red square", "a blue circle"]))
    out = emb(ctx)
    assert out["embeddings"].shape == (2, 16, 32)
    assert out["pooled_embeddings"].shape == (2, 32)
    assert np.isfinite(np.asarray(out["embeddings"])).all()

    # dropping a row must produce exactly the empty-prompt encoding
    dropped = emb(ctx, drop=jnp.array([True, False]))
    null = emb(jax.tree.map(jnp.asarray, emb.tokenize([""])))
    np.testing.assert_allclose(
        np.asarray(dropped["embeddings"][0]), np.asarray(null["embeddings"][0]),
        atol=1e-6,
    )
    # the undropped row is unchanged
    np.testing.assert_allclose(
        np.asarray(dropped["embeddings"][1]), np.asarray(out["embeddings"][1]),
        atol=1e-6,
    )
    # drop mask row: only BOS attended
    assert np.asarray(dropped["attn_mask"][0]).tolist() == [True] + [False] * 15


class _CaptionDataset:
    """Captioned blobs: caption names the constant pixel value."""

    def __init__(self, n=32, size=8, seed=0):
        rng = np.random.default_rng(seed)
        self.vals = rng.integers(0, 4, size=n)
        self.images = np.tile(
            (self.vals / 3 * 2 - 1).astype(np.float32)[:, None, None, None],
            (1, size, size, 3),
        )
        self.captions = [f"blob level {v}" for v in self.vals]

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return {"model_inputs": {"x": self.images[idx],
                                 "initial_context": self.captions[idx]}}


def _embedder_param_leaves(model):
    _, params, _ = nnx.split(model.context_embedder, nnx.Param, ...)
    return [np.asarray(x).copy() for x in jax.tree.leaves(params)]


def _run(tmp_path, name, train_embedder):
    embedder = _embedder()
    model = MMDiT(
        simple_dit=False, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, classifier_free=True,
        context_embedder=embedder, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=4)
    before = _embedder_param_leaves(model)
    dl = DataLoader(_CaptionDataset(), batch_size=8, shuffle=True, prefetch=0)
    trainer = BaseTrainer(n_epoch=1, save_path=tmp_path, project_name=name,
                          use_ema=False)
    trainer.train(diffuser, adamw(lr=1e-3), dl, train_embedder=train_embedder,
                  p_classifier_free_guidance=0.2, log_validation_images=False,
                  seed=0)
    after = _embedder_param_leaves(model)
    return before, after


def test_train_embedder_updates_params(tmp_path):
    """train_embedder=True: every embedder param tensor receives nonzero
    updates through the jitted joint graph (the reference capability the
    host-side HF embedders cannot provide)."""
    before, after = _run(tmp_path, "emb_on", train_embedder=True)
    changed = [not np.allclose(b, a) for b, a in zip(before, after)]
    assert all(changed), f"frozen embedder leaves under train_embedder=True: {changed}"


def test_frozen_embedder_stays_frozen(tmp_path):
    before, after = _run(tmp_path, "emb_off", train_embedder=False)
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)


def test_tokenizer_overrides_precomputed_context():
    """Latent txt2img shards carry precomputed 'context' embeddings alongside
    the raw caption strings. With embedder=trainable the tokenizer path must
    take precedence — otherwise train_embedder=true silently trains on the
    frozen precomputed embeddings and the encoder never sees a token."""
    emb = _embedder()
    model = MMDiT(
        simple_dit=False, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, classifier_free=True,
        context_embedder=emb, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler",
                        model_type="rectified_flow", n_steps=4)
    batch = {
        "model_inputs": {
            "x": np.zeros((2, 8, 8, 3), np.float32),
            "initial_context": ["a red square", "a blue circle"],
            "context": {"embeddings": np.ones((2, 4, 32), np.float32)},
        }
    }
    out = BaseTrainer._host_embed(batch, diffuser)
    ctx = out["model_inputs"]["context"]
    assert "token_ids" in ctx, "tokenizer path shadowed by precomputed context"
    np.testing.assert_array_equal(
        ctx["token_ids"], byte_tokenize(["a red square", "a blue circle"], 16)["token_ids"]
    )
    # host-side HF embedders keep the old behavior: precomputed wins
    class _HostOnly:
        def embed_host(self, texts):  # pragma: no cover - must not be called
            raise AssertionError("embed_host called despite precomputed context")

    diffuser.denoiser.context_embedder = _HostOnly()
    out2 = BaseTrainer._host_embed(batch, diffuser)
    np.testing.assert_array_equal(
        out2["model_inputs"]["context"]["embeddings"], np.ones((2, 4, 32), np.float32)
    )
