"""Pose-protocol parity vs the reference's evaluate_pose.py + export_gt_pose.py.

Companion to tools/parity_released.py (depth-video driver): runs the
reference's ACTUAL `export_gt_pose.py` and `evaluate_pose.py` (unmodified,
via tools/_ref_eval_wrapper.py CPU patches + the ENDODAV_REF_SPLITS_DIR
redirect — the reference mount ships without the pose split/curve files
and is read-only) and this repo's CLIs on the SAME randomized pose stack
(pose_encoder.pth / pose.pth / intrinsics_head.pth) + synthetic SCARED
tree, then compares:

  * the exported gt_poses npz arrays (export protocol, exactly),
  * every printed metric: per-sequence ATE mean/std + 95% CI, RE
    mean/std, and fx/fy/cx/cy intrinsics stats
    (evaluate_pose.py:183-231).

    python tools/parity_pose.py --data_path /tmp/scared_synth

Exercised reference surface: datasets.SCAREDRAWDataset (pairs loader),
ResnetEncoder/PoseDecoder/IntrinsicsHead forwards,
transformation_from_parameters, dump_xyz/dump_r, compute_ate/compute_re
(5-frame tracks), scipy CI, and the gt-export pinv chain
(export_gt_pose.py:38-63).
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQS = {1: "dataset5/keyframe1", 2: "dataset3/keyframe3"}


def make_random_pose_weights(folder: str, num_layers: int, seed: int) -> None:
    """Randomize the reference pose stack (every parameter AND the BN
    running stats, so eval-mode BatchNorm semantics are exercised) and
    save the three .pth files both drivers load."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import refshim

    _, _, encoders, decoders = refshim.import_reference()
    import torch

    torch.manual_seed(seed)
    enc = encoders.ResnetEncoder(num_layers, False, 2)
    dec = decoders.PoseDecoder(enc.num_ch_enc, 1, 2)
    intr = decoders.IntrinsicsHead(enc.num_ch_enc)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in (enc, dec, intr):
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
            for bn, b in m.named_buffers():  # BN stats only, not constants
                if not b.dtype.is_floating_point:
                    continue
                if bn.endswith("running_mean"):
                    b.copy_(torch.randn(b.shape, generator=g) * 0.2)
                elif bn.endswith("running_var"):
                    b.copy_(0.5 + 0.5 * torch.rand(b.shape, generator=g))
    os.makedirs(folder, exist_ok=True)
    torch.save(enc.state_dict(), os.path.join(folder, "pose_encoder.pth"))
    torch.save(dec.state_dict(), os.path.join(folder, "pose.pth"))
    torch.save(intr.state_dict(), os.path.join(folder, "intrinsics_head.pth"))
    print(f"[parity_pose] randomized pose stack -> {folder}")


def make_split_files(splits_dir: str, n_frames: int) -> None:
    """Fabricate endovis/test_files_sequence{1,2}.txt for the synthetic
    tree.  Line f needs frame_data f-1 (gt export) and frames f, f+1
    (the [0,1] pose pair), so f in 1..n-2."""
    d = os.path.join(splits_dir, "endovis")
    os.makedirs(os.path.join(d, "curve"), exist_ok=True)
    for seq, folder in SEQS.items():
        with open(os.path.join(d, f"test_files_sequence{seq}.txt"), "w") as f:
            for i in range(1, n_frames - 1):
                f.write(f"{folder} {i} l\n")


def run(cmd, env=None, ref_inputs=None, capture=None):
    print("[parity_pose] $", " ".join(cmd), flush=True)
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


def parse_metrics(stdout: str) -> dict[str, float]:
    """Both drivers print the same sentences; pull every number."""
    out = {}
    for seq in (1, 2):
        m = re.search(rf"sq{seq} Trajectory error: ([-\d.]+), std: ([-\d.]+), "
                      rf"95% cls: \[([-\d.]+), ([-\d.]+)\]", stdout)
        if not m:
            raise RuntimeError(f"no sq{seq} trajectory row in:\n{stdout[-2000:]}")
        out[f"ate{seq}"], out[f"ate{seq}_std"] = float(m.group(1)), float(m.group(2))
        out[f"ate{seq}_lo"], out[f"ate{seq}_hi"] = float(m.group(3)), float(m.group(4))
        m = re.search(rf"sq{seq} Rotation error: ([-\d.]+), std: ([-\d.]+)", stdout)
        if not m:
            raise RuntimeError(f"no sq{seq} rotation row in:\n{stdout[-2000:]}")
        out[f"re{seq}"], out[f"re{seq}_std"] = float(m.group(1)), float(m.group(2))
    for k in ("fx", "fy", "cx", "cy"):
        m = re.search(rf"{k}: ([-\d.]+), std: ([-\d.]+)", stdout)
        if m:
            out[k], out[f"{k}_std"] = float(m.group(1)), float(m.group(2))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--n_frames", type=int, default=24,
                    help="frames per synthetic sequence (split lines = n-2)")
    ap.add_argument("--num_layers", type=int, default=18)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--weights_folder", default=None,
                    help="existing pose stack (.pth); randomized when omitted")
    ap.add_argument("--keep", action="store_true", help="keep temp dirs")
    ap.add_argument("--atol", type=float, default=5e-3)
    ap.add_argument("--rtol", type=float, default=1e-2)
    args = ap.parse_args(argv)

    work = tempfile.mkdtemp(prefix="parity_pose_")
    wf = args.weights_folder or os.path.join(work, "weights")
    splits_ref = os.path.join(work, "splits_ref")
    splits_ours = os.path.join(work, "splits_ours")
    try:
        if not args.weights_folder:
            make_random_pose_weights(wf, args.num_layers, args.seed)
        make_split_files(splits_ref, args.n_frames)
        make_split_files(splits_ours, args.n_frames)

        # FIX_UNSQUEEZE: the reference's evaluate_pose.py crashes as
        # shipped (mono_dataset.py:206-209 "# edit" unsqueeze vs the
        # driver's torch.cat(dim=1)); see _ref_eval_wrapper.py.
        env_ref = dict(os.environ, ENDODAV_REF_SPLITS_DIR=splits_ref,
                       ENDODAV_REF_FIX_UNSQUEEZE="1")
        env_ours = dict(os.environ, ENDODAV_TPU_SPLITS_DIR=splits_ours,
                        ENDODAV_FORCE_PLATFORM="cpu")
        wrapper = os.path.join(REPO, "tools", "_ref_eval_wrapper.py")

        # --- gt export parity (exact)
        for seq in (1, 2):
            run([sys.executable, "-u", wrapper, "export_gt_pose.py",
                 "--data_path", args.data_path, "--sequence", f"sequence{seq}"],
                env=env_ref, ref_inputs=[args.data_path, work], capture=work)
        run([sys.executable, "-u", os.path.join(REPO, "export_gt_pose.py"),
             "--data_path", args.data_path, "--what", "pose"], env=env_ours)
        ok = True
        for seq in (1, 2):
            ref = np.load(os.path.join(splits_ref, "endovis", "curve",
                                       f"gt_poses_sequence{seq}.npz"))["data"]
            ours = np.load(os.path.join(splits_ours, "endovis", "curve",
                                        f"gt_poses_sequence{seq}.npz"))["data"]
            same = ref.shape == ours.shape and np.allclose(ref, ours, atol=1e-6)
            ok &= same
            print(f"[parity_pose] gt export seq{seq}: ref {ref.shape} vs ours "
                  f"{ours.shape} -> {'MATCH' if same else 'MISMATCH'}")

        # --- eval driver parity
        flags = ["--data_path", args.data_path, "--load_weights_folder", wf,
                 "--height", str(args.height), "--width", str(args.width),
                 "--num_layers", str(args.num_layers), "--num_workers", "0"]
        ref_out = run([sys.executable, "-u", wrapper, "evaluate_pose.py", *flags],
                      ref_inputs=[args.data_path, work], capture=work,
                      env=env_ref)
        our_out = run([sys.executable, "-u",
                       os.path.join(REPO, "evaluate_pose.py"), *flags],
                      env=env_ours)
        ref_vals = parse_metrics(ref_out)
        our_vals = parse_metrics(our_out)

        print(f"\n{'metric':>9} | {'reference':>12} | {'ours':>12} | {'diff':>10}")
        for k, rv in ref_vals.items():
            if k not in our_vals:
                print(f"{k:>9} | {rv:12.4f} | {'missing':>12}   <-- MISMATCH")
                ok = False
                continue
            d = abs(rv - our_vals[k])
            tol = args.atol + args.rtol * abs(rv)
            flag = "" if d <= tol else "  <-- MISMATCH"
            ok &= d <= tol
            print(f"{k:>9} | {rv:12.4f} | {our_vals[k]:12.4f} | {d:10.4f}{flag}")
        print("\n[parity_pose] " + ("PASS — pose protocols agree"
                                    if ok else "FAIL — investigate above"))
        return 0 if ok else 1
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
