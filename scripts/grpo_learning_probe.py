"""CPU probe: can the GRPO update direction maximize a real preference?

Trains a tiny pixel-space MMDiT against :class:`LumaJudge` (brighter image
wins every pairwise comparison) for many updates and prints the mean-luma
curve. Isolates the GRPO algorithm (sampling -> pairwise win-rates ->
z-scored advantages -> clipped-ratio update, grpo_trainer.py) from the
chip recipe's budget/lr so a flat chip run can be attributed to either
the algorithm or the recipe. Run with:

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/grpo_learning_probe.py \
        [N_EPOCHS] [LR] [EPS] [GRAD_CLIP_NORM] [TRUST_REGION]

The optional 4th arg reproduces the on-chip PPO collapse mode on CPU: at a
high enough lr one runaway update blows the ratio deviation past the clip
range, after which the fully-clipped objective has zero gradient everywhere
and the policy never recovers (BASELINE.md round-4 GRPO stiffness campaign,
epoch-22 collapse). Measured verdict (BASELINE.md round-4, optim.py
docstring): ``grad_clip_norm`` does NOT prevent the collapse under adamw —
the preconditioner renormalizes the clipped gradient, so clip 1.0 and clip
0.05 both died identically. The working guard is the 5th arg: the trainer's
``trust_region`` (reject + rollback + lr backoff on ``ratio_dev``), default
0.3; pass ``none`` to disable it and reproduce the raw collapse.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
from flax import nnx

from diffulab_tpu.diffuse import Diffuser
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder
from diffulab_tpu.networks.rewards.grpo import LumaJudge, PrefGRPORewardModel
from diffulab_tpu.training.grpo_trainer import GRPOTrainer
from diffulab_tpu.training.optim import adamw

N_EPOCHS = int(sys.argv[1]) if len(sys.argv) > 1 else 150
LR = float(sys.argv[2]) if len(sys.argv) > 2 else 3e-3
EPS = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
CLIP = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
TRUST = (None if sys.argv[5].lower() == "none" else float(sys.argv[5])) \
    if len(sys.argv) > 5 else 0.3
N_IMG = 8


def main():
    embedder = PrecomputedEmbedder(
        null_embedding=np.zeros((4, 16), np.float32), null_embedding_seq_len=2,
    )
    model = MMDiT(
        simple_dit=False, input_channels=3, inner_dim=32, embedding_dim=32,
        num_heads=2, mlp_ratio=2, patch_size=2, depth=2, classifier_free=True,
        context_embedder=embedder, rngs=nnx.Rngs(0),
    )
    diffuser = Diffuser(model, sampling_method="euler_maruyama",
                        model_type="rectified_flow", n_steps=8)

    rng = np.random.default_rng(0)
    batch = [{
        "model_inputs": {
            "context": {
                "embeddings": rng.normal(size=(2, 4, 16)).astype(np.float32),
                "attn_mask": np.ones((2, 4), bool),
            },
        },
        "extra": {"captions": ["bright", "brighter"]},
    }]

    out = Path("/tmp/grpo_probe")
    trainer = GRPOTrainer(
        n_epoch=N_EPOCHS, save_path=out, project_name="probe", use_ema=False,
        timestep_fraction=0.6, kl_beta=0.0, eps=EPS, trust_region=TRUST,
    )
    trainer.train(
        diffuser,
        reward_model=PrefGRPORewardModel(version="7b", n_image_per_prompt=N_IMG,
                                         judge=LumaJudge()),
        optimizer=adamw(lr=LR, grad_clip_norm=CLIP or None),
        train_dataloader=batch,
        n_image_per_prompt=N_IMG,
        guidance_scale=1.0,
        image_resolution=(16, 16),
        log_validation_images=False,
        seed=0,
    )

    rows = [json.loads(l) for l in (out / "probe" / "metrics.jsonl").read_text().splitlines()]
    scores = [r["train/judge_score"] for r in rows if "train/judge_score" in r]
    print("judge_score curve (every 10th):",
          [f"{s:.4f}" for s in scores[::10]])
    for key in ("train/clip_frac", "train/ratio_dev", "train/grad_norm",
                "train/tr_reject", "train/lr_scale"):
        vals = [r[key] for r in rows if key in r]
        if vals:
            print(f"{key} (every 10th):", [f"{v:.3f}" for v in vals[::10]],
                  f"max {max(vals):.3f}")
    first, last = np.mean(scores[:10]), np.mean(scores[-10:])
    print(f"first-10 mean {first:.4f} -> last-10 mean {last:.4f}  delta {last-first:+.4f}")
    print("LEARNING" if last - first > 0.01 else "FLAT")


if __name__ == "__main__":
    main()
