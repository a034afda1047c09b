"""Harvest round-5 chip-queue logs into BASELINE-ready markdown tables.

Reads the /tmp/r5_* logs produced by scripts/r5_queue2b.sh (hard-txt2img
trio) and scripts/r5_queue3{a,b}.sh (guidance campaign on the hard control)
and prints markdown tables plus the raw JSON rows, so the BASELINE.md
entries are transcription-error-free. Pure log parsing — run anywhere.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

TMP = Path("/tmp")


def txt2img_rows(name: str) -> list[dict]:
    p = TMP / f"r5_arm_{name}.log"
    if not p.exists():
        return []
    lines = p.read_text().splitlines()
    # the mmdit arm was re-evaluated after the clamp_x fix (4006201); only
    # rows after the last re-eval marker are valid — earlier rows scored
    # latent-clipped samples
    marker = "re-eval with clamp fix"
    for i in range(len(lines) - 1, -1, -1):
        if marker in lines[i]:
            lines = lines[i:]
            break
    rows = []
    for line in lines:
        if line.startswith('{"metric": "txt2img"'):
            rows.append(json.loads(line))
    return rows


def fid_rows(path: Path) -> list[tuple[str, float]]:
    """(ckpt, fid) pairs from an evaluate_fid log."""
    if not path.exists():
        return []
    out = []
    for line in path.read_text().splitlines():
        m = re.match(r"FID\(val, (?:model )?samples\)\s*=\s*([\d.]+)\s*\[(.*)\]", line)
        if m:
            out.append((m.group(2), float(m.group(1))))
    return out


def short(ckpt: str) -> str:
    tail = ckpt.rstrip("/").rsplit("/", 1)[-1]
    return {"denoiser": "live", "ema": "ema-track"}.get(tail, tail)


def main() -> None:
    # ---- trio ---------------------------------------------------------------
    arms = [("hard_txt2img_mmdit", "MMDiT"), ("hard_txt2img_sprint", "SprintDiT"),
            ("hard_txt2img_ddt", "DDT")]
    have = {label: txt2img_rows(name) for name, label in arms}
    if any(have.values()):
        print("### trio (FID / KID*1000 / caption-all / color / count / shape)\n")
        print("| arm | ckpt | FID | KID | all | color | count | size | shape |")
        print("|---|---|---|---|---|---|---|---|---|")
        for label, rows in have.items():
            for r in rows:
                print(f"| {label} | {short(r['ckpt'])} | {r['fid']:.2f} | "
                      f"{r['kid_x1000']:.1f} | {r['acc_all']:.3f} | {r['acc_color']:.3f} | "
                      f"{r['acc_count']:.3f} | {r['acc_size']:.3f} | {r['acc_shape']:.3f} |")
        print()

    # ---- guidance sweep -----------------------------------------------------
    # one-process sweep log first (evaluate_fid --guidance takes several
    # scales since round 5); falls back to the per-scale logs of the old plan
    sweep = []
    sweep_log = TMP / "r5_hard_cfg_sweep.log"
    if sweep_log.exists():
        for line in sweep_log.read_text().splitlines():
            if line.startswith('{"metric": "fid_synthetic"'):
                r = json.loads(line)
                sweep.append((f"{r.get('guidance', 0.0):g}", short(r["ckpt"]),
                              r["value"]))
    for g in ("0.0", "1.0", "1.5", "2.0", "3.0"):
        for ckpt, fid in fid_rows(TMP / f"r5_hard_cfg_g{g}.log"):
            sweep.append((g, short(ckpt), fid))
    if sweep:
        print("### hard-control CFG sweep (phema_sr0.05)\n")
        print("| guidance | FID |")
        print("|---|---|")
        for g, _, fid in sweep:
            print(f"| {g} | {fid:.3f} |")
        print()
    for ckpt, fid in fid_rows(TMP / "r5_hard_cfg_triple.log"):
        print(f"triple: {short(ckpt)} FID {fid:.3f}")

    # ---- 3b feature arms ----------------------------------------------------
    for log, label in [("r5_hard_interval_gbest.log", "interval@best_g"),
                       ("r5_hard_interval_g3.log", "interval@3.0"),
                       ("r5_hard_rescale_g3.log", "rescale0.7@3.0"),
                       ("r5_hard_autoguide_g1.5.log", "autoguidance@1.5"),
                       ("r5_hard_autoguide_g2.log", "autoguidance@2.0"),
                       ("r5_hard_distill.log", "distilled-student@g0")]:
        for ckpt, fid in fid_rows(TMP / log):
            print(f"{label}: {short(ckpt)} FID {fid:.3f}")
    gate = TMP / "r5_queue3b_gate.log"
    if gate.exists():
        print("\ngate:", gate.read_text().strip())


if __name__ == "__main__":
    main()
