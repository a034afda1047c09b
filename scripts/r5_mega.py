"""Round-5 single-process chip stage runner.

The relay wedges for 10-25 minutes after every chip client EXIT (observed
three times tonight), so each separate CLI invocation pays a dead-time
transition. This runner executes every remaining chip stage inside ONE
process — one client, one connection, zero exits until the round's chip work
is done — by invoking each example CLI via runpy with patched argv and
stdout redirected to the per-stage log the harvester expects. CPU-only
steps (post-hoc EMA reconstruction) still run as env-forced subprocesses;
they never touch the relay.

Stage list (value order, clock guards in UTC HHMM):
  1. mmdit re-eval   (clamp-fix rows; the first eval scored clipped latents)
  2. sprint eval
  3. control train   (4-epoch guidance-binding control — trimmed to the round clock; underfit-at-budget makes guidance MORE likely to bind, which is the gate's point)
  4. control recons  (CPU subprocess: epoch-2 sibling + full horizon)
  5. CFG sweep       (0 / 1.5 / 3.0 in one process)
  6. ddt train+eval  (only before GUARD_DDT)
  7. autoguidance    (only before GUARD_AUTOG)
"""

from __future__ import annotations

import contextlib
import os
import runpy
import subprocess
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

GUARD_DDT = os.environ.get("GUARD_DDT", "0125")
GUARD_AUTOG = os.environ.get("GUARD_AUTOG", "0200")

CPU_ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}


def before(hhmm: str) -> bool:
    now = time.strftime("%H%M", time.gmtime())
    return now < hhmm or now > "2000"


def stamp(msg: str) -> None:
    line = f"=== {msg} @ {time.strftime('%H:%M:%S', time.gmtime())} ==="
    print(line, flush=True)
    with open("/tmp/r5_final_timeline.log", "a") as f:
        f.write(line + "\n")


def run_stage(label: str, argv: list[str], log: str) -> None:
    stamp(f"mega {label} start")
    sys.argv = argv
    try:
        with open(log, "a") as f, contextlib.redirect_stdout(f):
            runpy.run_path(str(REPO / argv[0]), run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            stamp(f"mega {label} EXIT {e.code}")
    except Exception:
        with open(log, "a") as f:
            traceback.print_exc(file=f)
        stamp(f"mega {label} FAILED (see {log})")
    else:
        stamp(f"mega {label} done")


def cpu_recon(run_dir: str, *args: str) -> None:
    subprocess.run(
        [sys.executable, "examples/reconstruct_ema.py", "--run-dir", run_dir, *args],
        env=CPU_ENV, cwd=REPO, check=False,
    )


def main() -> None:
    os.chdir(REPO)

    # warm the client once; this blocks through any residual relay wedge
    import jax, jax.numpy as jnp
    t0 = time.time()
    (jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
    stamp(f"mega client warm in {time.time() - t0:.0f}s")

    eval_argv = lambda cfg, name: [
        "examples/evaluate_txt2img.py", "--config-name", cfg,
        "--ckpt", f"runs/r5/{name}/checkpoints/ema",
        f"runs/r5/{name}/checkpoints/phema_sr0.05",
        "--n-samples", "1000", "--batch-size", "100", "--guidance", "1.5",
    ]

    # ---- 1. mmdit re-eval ---------------------------------------------------
    with open("/tmp/r5_arm_hard_txt2img_mmdit.log", "a") as f:
        f.write("=== re-eval with clamp fix (4006201) ===\n")
    run_stage("mmdit re-eval", eval_argv("train_hard_txt2img_mmdit", "hard_txt2img_mmdit"),
              "/tmp/r5_arm_hard_txt2img_mmdit.log")

    # ---- 2. sprint eval -----------------------------------------------------
    run_stage("sprint eval", eval_argv("train_hard_txt2img_sprint", "hard_txt2img_sprint"),
              "/tmp/r5_arm_hard_txt2img_sprint.log")

    # ---- 3-5. guidance-binding control + sweep ------------------------------
    run = "runs/r5/synthetic_hard_flow"
    if not before(os.environ.get("GUARD_CONTROL", "0213")):
        stamp("control+sweep SKIPPED (clock)")
        stamp("MEGA DONE")
        return
    subprocess.run(["rm", "-rf", run], check=False)
    run_stage("control train", [
        "examples/train_diffusion.py", "--config-name", "train_synthetic_hard_flow",
        "trainer.save_path=runs/r5", "trainer.n_epoch=3",
    ], "/tmp/r5_hard_control_train.log")
    cpu_recon(run, "--sigma-rel", "0.05", "--t-out", "156")
    Path(f"{run}/checkpoints/phema_sr0.05").rename(f"{run}/checkpoints/phema_sr0.05_ep2")
    cpu_recon(run, "--sigma-rel", "0.05")
    stamp("control recons done")
    if not before(os.environ.get("GUARD_SWEEP", "0226")):
        stamp("sweep SKIPPED (clock)")
        stamp("MEGA DONE")
        return
    run_stage("cfg sweep", [
        "examples/evaluate_fid.py", "--config-name", "train_synthetic_hard_flow",
        "--ckpt", f"{run}/checkpoints/phema_sr0.05",
        "--n-samples", "500", "--batch-size", "200",
        "--guidance", "0.0,1.5,3.0",
    ], "/tmp/r5_hard_cfg_sweep.log")

    # ---- 6. ddt (clock-guarded) --------------------------------------------
    if before(GUARD_DDT):
        subprocess.run(["rm", "-rf", "runs/r5/hard_txt2img_ddt"], check=False)
        run_stage("ddt train", [
            "examples/train_repa_txt_to_img.py", "--config-name", "train_hard_txt2img_ddt",
            "trainer.save_path=runs/r5", "trainer.log_validation_images=false",
            "trainer.n_epoch=6",
        ], "/tmp/r5_arm_hard_txt2img_ddt.log")
        cpu_recon("runs/r5/hard_txt2img_ddt", "--sigma-rel", "0.05")
        run_stage("ddt eval", eval_argv("train_hard_txt2img_ddt", "hard_txt2img_ddt"),
                  "/tmp/r5_arm_hard_txt2img_ddt.log")
    else:
        stamp(f"ddt SKIPPED (past {GUARD_DDT})")

    # ---- 7. autoguidance (clock-guarded) ------------------------------------
    if before(GUARD_AUTOG):
        run_stage("autoguide", [
            "examples/evaluate_fid.py", "--config-name", "train_synthetic_hard_flow",
            "--ckpt", f"{run}/checkpoints/phema_sr0.05",
            "--n-samples", "1000", "--batch-size", "200",
            "--guidance", "1.5", "--guide-ckpt", f"{run}/checkpoints/phema_sr0.05_ep2",
        ], "/tmp/r5_hard_autoguide_g1.5.log")
    else:
        stamp(f"autoguide SKIPPED (past {GUARD_AUTOG})")

    stamp("MEGA DONE")


if __name__ == "__main__":
    main()
