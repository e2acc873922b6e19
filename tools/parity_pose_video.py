"""Combined depth+pose video-driver protocol parity vs the reference's
evaluate_depth_video_pose.py.

Final leg of the driver-parity harness: runs the reference's ACTUAL
`evaluate_depth_video_pose.py` (unmodified, via tools/_ref_eval_wrapper.py)
and our CLI on the SAME randomized endodav depth model + pose stack and
synthetic SCARED tree, then compares per sequence AND in aggregate:

  * shift/scale alignment stats,
  * the 9 final metrics (7 depth + TAE/TAS) and their 95% CIs,
  * per-sequence pose ATE mean/std/CI + RE mean/std,
  * per-sequence normalized intrinsics stats.

Receipts on the reference side (all wrapper-compensated, reference tree
untouched): the driver only defines eval_dir under --visualize_depth yet
writes its txt logs through it unconditionally (:170-172 vs :252,:317),
and save_video needs the absent imageio-ffmpeg plugin — so it runs with
--visualize_depth + ENDODAV_REF_STUB_VIS.

    python tools/parity_pose_video.py --data_path /tmp/scared_synth
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQS = ["train/dataset5/keyframe1", "train/dataset3/keyframe3"]
METRICS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3",
           "tae", "tas")


def make_split_files(splits_dir: str) -> None:
    d = os.path.join(splits_dir, "scared_video")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "test_files.txt"), "w") as f:
        f.write("\n".join(SEQS) + "\n")


def run(cmd, env=None, ref_inputs=None, capture=None):
    print("[parity_pv] $", " ".join(cmd), flush=True)
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
        sys.stderr.write(r.stdout[-4000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError(f"command failed ({r.returncode}): {cmd[:3]}...")
    return r.stdout


def parse_reference(stdout: str) -> dict[str, float]:
    out = {}
    aligns = re.findall(r"Aligning shift and scale \| t_gt: ([-\d.]+) \| "
                        r"s_gt: ([-\d.]+) \| t_pred: ([-\d.]+) \| "
                        r"s_pred: ([-\d.]+)", stdout)
    for k, v in zip(("t_gt", "s_gt", "t_pred", "s_pred"), aligns[-1]):
        out[k] = float(v)
    means = re.findall(r"^mean:(.*)$", stdout, re.M)
    vals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", means[-1])]
    out.update(zip(METRICS, vals))
    cls_rows = re.findall(r"^cls:(.*)$", stdout, re.M)
    cvals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", cls_rows[-1])]
    for k, lo, hi in zip(METRICS, cvals[0::2], cvals[1::2]):
        out[f"{k}_lo"], out[f"{k}_hi"] = lo, hi
    ates = re.findall(r"sq Trajectory error: ([-\d.]+), std: ([-\d.]+), "
                      r"95% cls: \[([-\d.]+), ([-\d.]+)\]", stdout)
    res = re.findall(r"sq Rotation error: ([-\d.]+), std: ([-\d.]+)", stdout)
    for s, (a, astd, lo, hi) in enumerate(ates):
        out[f"seq{s}_ate"], out[f"seq{s}_ate_std"] = float(a), float(astd)
        out[f"seq{s}_ate_lo"], out[f"seq{s}_ate_hi"] = float(lo), float(hi)
    for s, (rm, rstd) in enumerate(res):
        out[f"seq{s}_re"], out[f"seq{s}_re_std"] = float(rm), float(rstd)
    for key in ("fx", "fy", "cx", "cy"):
        for s, (m, sd) in enumerate(
                re.findall(rf"{key}: ([-\d.]+), std: ([-\d.]+)", stdout)):
            out[f"seq{s}_{key}"], out[f"seq{s}_{key}_std"] = float(m), float(sd)
    return out


def parse_ours(stdout: str) -> dict[str, float]:
    out = {}
    aligns = re.findall(r"Aligning shift and scale \| t_gt: ([-\d.]+) \| "
                        r"s_gt: ([-\d.]+) \| t_pred: ([-\d.]+) \| "
                        r"s_pred: ([-\d.]+)", stdout)
    for k, v in zip(("t_gt", "s_gt", "t_pred", "s_pred"), aligns[-1]):
        out[k] = float(v)
    m = re.search(r"^abs_rel=.*$", stdout, re.M)
    vals = dict(re.findall(r"(\w+)=([-\w.+]+)", m.group(0)))
    out.update({k: float(vals[k]) for k in METRICS})
    cls_rows = re.findall(r"^cls:(.*)$", stdout, re.M)
    cvals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", cls_rows[-1])]
    for k, lo, hi in zip(METRICS, cvals[0::2], cvals[1::2]):
        out[f"{k}_lo"], out[f"{k}_hi"] = lo, hi
    pose_rows = re.findall(r"ATE ([-\d.]+)±([-\d.]+) \[([-\d.]+), "
                           r"([-\d.]+)\] \| RE ([-\d.]+)±([-\d.]+)", stdout)
    for s, (a, astd, lo, hi, rm, rstd) in enumerate(pose_rows):
        out[f"seq{s}_ate"], out[f"seq{s}_ate_std"] = float(a), float(astd)
        out[f"seq{s}_ate_lo"], out[f"seq{s}_ate_hi"] = float(lo), float(hi)
        out[f"seq{s}_re"], out[f"seq{s}_re_std"] = float(rm), float(rstd)
    intr_rows = re.findall(r"fx: ([-\d.]+)±([-\d.]+) fy: ([-\d.]+)±([-\d.]+) "
                           r"cx: ([-\d.]+)±([-\d.]+) cy: ([-\d.]+)±([-\d.]+)",
                           stdout)
    for s, row in enumerate(intr_rows):
        for j, key in enumerate(("fx", "fy", "cx", "cy")):
            out[f"seq{s}_{key}"] = float(row[2 * j])
            out[f"seq{s}_{key}_std"] = float(row[2 * j + 1])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--encoder", default="vits", choices=["vits", "vitl"])
    ap.add_argument("--lora_type", default="lora")
    ap.add_argument("--lora_rank", type=int, default=4)
    ap.add_argument("--num_layers", type=int, default=18)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--atol", type=float, default=5e-3)
    ap.add_argument("--rtol", type=float, default=1e-2)
    args = ap.parse_args(argv)

    work = tempfile.mkdtemp(prefix="parity_pv_")
    wf = os.path.join(work, "weights")
    splits_ref = os.path.join(work, "splits_ref")
    splits_ours = os.path.join(work, "splits_ours")
    try:
        # randomized depth model + pose stack in ONE folder (the driver
        # loads depth_model.pth AND pose_encoder/pose/intrinsics_head.pth
        # from load_weights_folder, evaluate_depth_video_pose.py:58-113)
        if REPO not in sys.path:
            sys.path.insert(0, REPO)
        from tools import parity_pose, parity_released

        dm_args = argparse.Namespace(
            encoder=args.encoder, lora_type=args.lora_type,
            lora_rank=args.lora_rank, seed=args.seed,
            disable_residual_block=True, disable_conv_head=True,
            temporal_lora=False, inv_sigmoid=False)
        parity_released.make_random_reference_weights(wf, dm_args)
        parity_pose.make_random_pose_weights(wf, args.num_layers, args.seed)
        make_split_files(splits_ref)
        make_split_files(splits_ours)
        pre_dir = os.path.join(wf, "_empty_pretrained")
        os.makedirs(pre_dir, exist_ok=True)
        import torch

        torch.save({}, os.path.join(pre_dir,
                                    f"video_depth_anything_{args.encoder}.pth"))
        os.makedirs(os.path.join(wf, "eval", "scared_video"), exist_ok=True)

        flags = ["--data_path", args.data_path, "--load_weights_folder", wf,
                 "--model_type", "endodav", "--encoder", args.encoder,
                 "--lora_type", args.lora_type, "--lora_rank", str(args.lora_rank),
                 "--eval_split", "scared_video", "--eval_mono",
                 "--pretrained_path", pre_dir, "--num_layers", str(args.num_layers),
                 "--disable_residual_block", "--disable_conv_head",
                 "--num_workers", "0"]
        env_ref = dict(os.environ, ENDODAV_REF_SPLITS_DIR=splits_ref,
                       ENDODAV_REF_STUB_VIS="1")
        env_ours = dict(os.environ, ENDODAV_TPU_SPLITS_DIR=splits_ours,
                        ENDODAV_FORCE_PLATFORM="cpu")
        wrapper = os.path.join(REPO, "tools", "_ref_eval_wrapper.py")
        ref_out = run(ref_inputs=[args.data_path, work], capture=work,
                      cmd=[sys.executable, "-u", wrapper,
                       "evaluate_depth_video_pose.py", *flags,
                       "--visualize_depth"], env=env_ref)
        our_out = run([sys.executable, "-u",
                       os.path.join(REPO, "evaluate_depth_video_pose.py"),
                       *flags], env=env_ours)
        ref_vals = parse_reference(ref_out)
        our_vals = parse_ours(our_out)

        ok = True
        print(f"\n{'metric':>14} | {'reference':>12} | {'ours':>12} | {'diff':>10}")
        for k, rv in ref_vals.items():
            if k not in our_vals:
                print(f"{k:>14} | {rv:12.4f} | {'missing':>12}   <-- MISMATCH")
                ok = False
                continue
            d = abs(rv - our_vals[k])
            tol = args.atol + args.rtol * abs(rv)
            flag = "" if d <= tol else "  <-- MISMATCH"
            ok &= d <= tol
            print(f"{k:>14} | {rv:12.4f} | {our_vals[k]:12.4f} | {d:10.4f}{flag}")
        print("\n[parity_pose_video] " + ("PASS — combined driver protocols agree"
                                          if ok else "FAIL — investigate above"))
        return 0 if ok else 1
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
