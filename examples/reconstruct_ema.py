"""Offline EMA-horizon selection: reconstruct post-hoc EMA checkpoints.

The companion CLI to ``trainer.posthoc_ema`` (training/posthoc_ema.py,
Karras et al. arXiv:2312.02696). A run trained with ``posthoc_ema: true``
leaves per-epoch fp16 snapshots of two power-function EMA tracks under
``<run>/checkpoints/phema/``; this tool least-squares-combines them into
the EMA of any target relative width ``sigma_rel`` and writes each result
as a params-only checkpoint (``phema_sr<val>`` — same layout as ``ema``,
loadable by evaluate_fid.py / sample.py directly).

The EMA horizon is the measured dominant quality lever at short budgets
(BASELINE.md round 3: ~6-7x FID); this turns the pick-the-horizon retrain
loop into one training run plus an offline FID sweep:

    python examples/reconstruct_ema.py --run-dir runs/synthetic_edm \
        --sigma-rel 0.02 0.05 0.10 0.15 0.20
    python examples/evaluate_fid.py --config-name train_synthetic_edm \
        --ckpt runs/synthetic_edm/checkpoints/phema_sr0.10 ...

No reference counterpart: LouisRouss/DiffuLab carries a single fixed-beta
ema_pytorch track (base_trainer.py:247-253).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from diffulab_tpu.training.posthoc_ema import (
    list_snapshots,
    reconstruct_from_dir,
    save_reconstruction,
)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--run-dir", required=True, help="training run dir (contains checkpoints/phema)")
    parser.add_argument("--sigma-rel", type=float, nargs="+", required=True,
                        help="target EMA relative width(s), e.g. 0.05 0.10 0.15")
    parser.add_argument("--t-out", type=int, default=None,
                        help="reconstruction step (default: last snapshot)")
    parser.add_argument("--max-snapshots", type=int, default=None,
                        help="thin the basis to at most this many snapshots")
    args = parser.parse_args()

    ckpt_dir = Path(args.run_dir) / "checkpoints"
    phema_dir = ckpt_dir / "phema"
    snaps = list_snapshots(phema_dir)
    if not snaps:
        raise SystemExit(f"no phema snapshots under {phema_dir} — "
                         "was the run trained with trainer.posthoc_ema=true?")
    print(f"{len(snaps)} snapshots, steps {snaps[0][0]}..{snaps[-1][0]}, "
          f"gammas {sorted({g for _, g, _ in snaps})}")

    for sigma_rel in args.sigma_rel:
        result = reconstruct_from_dir(
            phema_dir, sigma_rel, t_out=args.t_out, max_snapshots=args.max_snapshots
        )
        out = ckpt_dir / f"phema_sr{sigma_rel:g}"
        save_reconstruction(out, result["params"])
        w = result["weights"]
        print(f"sigma_rel={sigma_rel:g} (gamma={result['gamma_out']:.2f}, "
              f"t_out={result['t_out']}): |coeffs| max {abs(w).max():.3f}, "
              f"sum {w.sum():.6f} -> {out}")


if __name__ == "__main__":
    main()
