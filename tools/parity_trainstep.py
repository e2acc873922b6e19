"""Training-step loss-protocol parity vs the reference's actual trainer.

The deepest parity check in the harness: executes ONE run_epoch iteration
of the reference's trainer_end_to_end_video.py (via tools/
_ref_train_probe.py under the CPU wrapper) — randomized weights on all 8
model components, a real SCAREDRAWVideoDataset batch, phase-0 forward +
Adam step on the position nets, then the full main-phase forward — and
replays the IDENTICAL batch and weights through this repo's jitted
two-phase train step, comparing:

  * the phase-0 position/registration loss ("loss_0"),
  * the main loss and EVERY per-scale component
    (reprojection/transform/cvt/smooth/depth_reproj/depth_flow,
    trainer:913-971),

to float tolerance.  Because the reference applies its phase-0 optimizer
step before the main forward (trainer:419-431), agreement also pins the
gated-Adam first-step semantics.

    python tools/parity_trainstep.py --data_path /tmp/scared_synth
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQS = ["train/dataset5/keyframe1", "train/dataset3/keyframe3"]
TEMPORAL_FLAGS = ["--temporal_lora", "--tune_spatial_interval", "0",
                  "--tune_temporal_interval", "100"]


def make_split_files(splits_dir: str) -> None:
    d = os.path.join(splits_dir, "scared_video")
    os.makedirs(d, exist_ok=True)
    for name in ("train_files.txt", "val_files.txt"):
        with open(os.path.join(d, name), "w") as f:
            f.write("\n".join(SEQS) + "\n")


def run(cmd, env=None, ref_inputs=None, capture=None):
    print("[parity_trainstep] $", " ".join(cmd), flush=True)
    if ref_inputs is not None:
        # reference-side probe: memoized on (cmd, env, input contents) —
        # the reference tree is read-only and inputs are seeded, so the
        # probe is a pure function (tools/_run_cache.py)
        from tools._run_cache import cached_run

        return cached_run(
            cmd, env=env,
            key_files=[p for p in ref_inputs if os.path.exists(p)],
            capture_dir=capture,
            env_keys=tuple(k for k in (env or {}) if k.startswith("ENDODAV_REF")))
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-6000:])
        raise RuntimeError(f"command failed ({r.returncode}): {cmd[:3]}...")
    return r.stdout


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--T", type=int, default=4)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--encoder", default="vits")
    ap.add_argument("--lora_type", default="lora")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--temporal", action="store_true",
                    help="temporal-LoRA config with the temporal gate ON at step 0\n"
                         "(tune_spatial_interval=0), so the depth_reproj/depth_flow\n"
                         "terms carry weight 1 (trainer:332-340,950)")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--atol", type=float, default=2e-4)
    ap.add_argument("--rtol", type=float, default=2e-3)
    args = ap.parse_args(argv)

    work = tempfile.mkdtemp(prefix="parity_ts_")
    probe_out = os.path.join(work, "probe")
    splits_ref = os.path.join(work, "splits_ref")
    splits_ours = os.path.join(work, "splits_ours")
    try:
        make_split_files(splits_ref)
        make_split_files(splits_ours)
        env_ref = dict(os.environ, ENDODAV_REF_SPLITS_DIR=splits_ref)
        wrapper = os.path.join(REPO, "tools", "_ref_eval_wrapper.py")
        run([sys.executable, "-u", wrapper,
             os.path.join(REPO, "tools", "_ref_train_probe.py"),
             "--data_path", args.data_path, "--out_dir", probe_out,
             "--seed", str(args.seed), "--T", str(args.T),
             "--height", str(args.height), "--width", str(args.width),
             "--encoder", args.encoder, "--lora_type", args.lora_type,
             *(TEMPORAL_FLAGS if args.temporal else [])],
            env=env_ref, ref_inputs=[args.data_path, work], capture=work)
        with open(os.path.join(probe_out, "losses.json")) as f:
            ref = json.load(f)
        # the reference forward must itself be deterministic (no live
        # dropout) or the comparison is meaningless
        assert ref["phase0"] == ref["phase0_recompute"], \
            "reference phase-0 forward is nondeterministic"

        # ---- our side: same weights (converted .pth), same batch
        env_ours = dict(os.environ, ENDODAV_FORCE_PLATFORM="cpu",
                        ENDODAV_TPU_SPLITS_DIR=splits_ours)
        out = run(
            [sys.executable, "-u", os.path.join(REPO, "tools",
                                                "parity_trainstep.py"),
             "--_ours", probe_out, "--data_path", args.data_path,
             "--T", str(args.T), "--height", str(args.height),
             "--width", str(args.width), "--encoder", args.encoder,
             "--lora_type", args.lora_type,
             *(["--temporal"] if args.temporal else [])],
            env=env_ours)
        ours = json.loads(out.splitlines()[-1])

        ok = True
        print(f"\n{'loss term':>28} | {'reference':>12} | {'ours':>12} | {'diff':>10}")
        pairs = [("loss_0 (phase 0)", ref["phase0"]["loss"], ours["loss_0"])]
        for k, rv in sorted(ref["main"].items()):
            if k in ours:
                pairs.append((k, rv, ours[k]))
            elif k.startswith("loss/") or k == "loss":
                pairs.append((k, rv, None))
        for name, rv, ov in pairs:
            if ov is None:
                print(f"{name:>28} | {rv:12.6f} | {'missing':>12}   <-- MISMATCH")
                ok = False
                continue
            d = abs(rv - ov)
            tol = args.atol + args.rtol * abs(rv)
            flag = "" if d <= tol else "  <-- MISMATCH"
            ok &= d <= tol
            print(f"{name:>28} | {rv:12.6f} | {ov:12.6f} | {d:10.6f}{flag}")
        print("\n[parity_trainstep] " + (
            "PASS — train-step loss protocols agree"
            if ok else "FAIL — investigate above"))
        return 0 if ok else 1
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


def ours_main():
    """Subprocess entry: replay the probe batch through our train step."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--_ours", required=True)
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--T", type=int, default=4)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--encoder", default="vits")
    ap.add_argument("--lora_type", default="lora")
    ap.add_argument("--temporal", action="store_true")
    args = ap.parse_args()
    probe_out = args._ours

    sys.path.insert(0, REPO)
    from endodav_tpu.options import EndoDAVOptions
    from endodav_tpu.train.trainer import Trainer

    opt = EndoDAVOptions().parse([
        "--data_path", args.data_path, "--log_dir",
        os.path.join(probe_out, "logs_ours"),
        "--model_type", "endodav", "--encoder", args.encoder,
        "--lora_type", args.lora_type,
        "--batch_size", "1", "--T", str(args.T),
        "--height", str(args.height), "--width", str(args.width),
        "--num_workers", "0", "--host_preprocess",
        # numerics-parity run: one device even under the suite's virtual
        # 8-CPU mesh (B*T=4 doesn't shard over data=8)
        "--mesh_shape", "data=1",
        "--disable_residual_block", "--disable_conv_head",
        "--load_weights_folder", probe_out,
        "--models_to_load", "depth_model", "pose_encoder", "pose",
        "intrinsics_head", "position_encoder", "position",
        "transform_encoder", "transform",
        *(TEMPORAL_FLAGS if args.temporal else []),
    ])
    trainer = Trainer(opt)

    data = np.load(os.path.join(probe_out, "batch.npz"))
    batch = {}
    for key_s in data.files:
        k = ast.literal_eval(key_s)
        v = data[key_s]
        if isinstance(k, tuple) and k[0] in ("color", "color_aug"):
            v = np.transpose(v, (0, 1, 3, 4, 2))  # [B,T,3,h,w] -> channels-last
        batch[k] = v
    scalars = trainer.train_one_batch(batch)
    imgs = getattr(trainer, "_last_images", None) or {}
    np.savez_compressed(
        os.path.join(probe_out, "disps_ours.npz"),
        **{k: np.asarray(v) for k, v in imgs.items() if k.startswith("disp_")})
    print(json.dumps({k: float(v) for k, v in scalars.items()}))


if __name__ == "__main__":
    if "--_ours" in sys.argv:
        ours_main()
    else:
        sys.exit(main())
