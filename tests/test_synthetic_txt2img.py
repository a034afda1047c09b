"""Hard compositional benchmark (round 5): renderer, caption round-trip,
embeddings, and the deterministic caption-consistency judge."""

import numpy as np

from diffulab_tpu.data.synthetic_txt2img import (
    COLOR_NAMES,
    EMB_LEN,
    SHAPES,
    SyntheticCompositionalDataset,
    caption_consistency,
    caption_embedding_table,
    caption_of,
    draw_spec,
    embed_captions,
    judge_image,
    parse_caption,
    render_scene,
)


def test_caption_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(50):
        spec = draw_spec(rng)
        parsed = parse_caption(caption_of(spec))
        assert parsed == {k: spec[k] for k in ("count", "size", "color", "shape", "background")}


def test_judge_reads_clean_renders():
    ds = SyntheticCompositionalDataset(n_samples=120, image_size=64, seed=3)
    imgs = ds.images.astype(np.float32) / 127.5 - 1.0
    acc = caption_consistency(imgs, ds.captions)
    # the judge must read its own renderer's attributes almost perfectly —
    # it is the metric ceiling for generated samples (size/shape are the
    # soft attributes: ~0.92 each on clean renders)
    assert acc["color"] > 0.95, acc
    assert acc["background"] > 0.95, acc
    assert acc["count"] > 0.9, acc
    assert acc["shape"] > 0.8, acc
    assert acc["all"] > 0.65, acc


def test_judge_rejects_noise():
    rng = np.random.default_rng(0)
    ds = SyntheticCompositionalDataset(n_samples=40, image_size=64, seed=1)
    noise = rng.uniform(-1, 1, (40, 64, 64, 3)).astype(np.float32)
    acc = caption_consistency(noise, ds.captions)
    assert acc["all"] < 0.2, acc
    assert acc["color"] < 0.4, acc


def test_judge_attribute_sensitivity():
    """Flipping one caption attribute must flip exactly that check."""
    rng = np.random.default_rng(7)
    spec = {"count": 2, "size": "large", "color": "red", "shape": "disk",
            "background": "dark"}
    img = render_scene(rng, spec, 64).astype(np.float32) / 127.5 - 1.0
    got = judge_image(img)
    assert got["color"] == "red" and got["count"] == 2
    assert got["background"] == "dark" and got["size"] == "large"
    assert got["shape"] == "disk"


def test_shape_classifier_per_shape():
    """Every shape must be recognized well above the 20% chance floor."""
    from collections import Counter

    rng = np.random.default_rng(11)
    for shape in SHAPES:
        votes = Counter()
        for i in range(20):
            spec = {"count": 1, "size": "large" if i % 2 else "small",
                    "color": "blue", "shape": shape, "background": "dark"}
            img = render_scene(rng, spec, 64).astype(np.float32) / 127.5 - 1.0
            votes[judge_image(img)["shape"]] += 1
        assert votes[shape] >= 14, (shape, votes)


def test_dataset_and_embeddings():
    ds = SyntheticCompositionalDataset(n_samples=64, image_size=32, seed=0)
    assert ds.images.shape == (64, 32, 32, 3) and ds.images.dtype == np.uint8
    assert set(np.unique(ds.labels)) <= set(range(len(SHAPES)))
    assert len(ds.captions) == 64
    # determinism
    ds2 = SyntheticCompositionalDataset(n_samples=64, image_size=32, seed=0)
    np.testing.assert_array_equal(ds.images, ds2.images)
    assert ds.captions == ds2.captions

    table = caption_embedding_table(dim=64)
    emb, mask = embed_captions(ds.captions[:8], table)
    assert emb.shape == (8, EMB_LEN, 64) and mask.shape == (8, EMB_LEN)
    # captions are 8 words: every slot used, embeddings word-deterministic
    assert mask.all()
    same = [c for c in ds.captions if c == ds.captions[0]]
    if len(same) > 1:
        i, j = ds.captions.index(same[0]), ds.captions.index(same[1])
        np.testing.assert_array_equal(emb[i], emb[j])


def test_color_imbalance_present():
    """Rare modes are the point: the rarest color must occur but far less
    often than the most common one."""
    ds = SyntheticCompositionalDataset(n_samples=2000, image_size=32, seed=0)
    from collections import Counter

    counts = Counter(parse_caption(c)["color"] for c in ds.captions)
    assert set(counts) == set(COLOR_NAMES)
    assert counts.most_common()[0][1] > 3 * counts.most_common()[-1][1]
