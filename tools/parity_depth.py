"""Single-frame depth-driver protocol parity vs the reference's
evaluate_depth.py + export_gt_depth.py.

Completes the driver-parity triplet (parity_released.py = video driver,
parity_pose.py = pose driver): runs the reference's ACTUAL
`export_gt_depth.py` and `evaluate_depth.py --ext_disp_to_eval`
(unmodified, via tools/_ref_eval_wrapper.py) and this repo's CLIs on the
same synthetic tree + the same random disparity stack, then compares

  * the exported gt_depths.npz arrays (exactly),
  * the printed protocol: median-scaling ratio med/std, the 7 depth
    metrics, and each metric's 95% CI (evaluate_depth.py:182-231).

`--ext_disp_to_eval` isolates the DRIVER protocol (cv2-resize semantics,
1/disp inversion, masking, median scaling, clipping, CI) from the model
graph, which is separately full-graph parity-tested
(tests/test_fullmodel_parity.py).

    python tools/parity_depth.py --data_path /tmp/scared_synth
"""

from __future__ import annotations

# run as `python tools/<name>.py` from anywhere: put the repo root on sys.path
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import re
import shutil
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEQS = ["dataset5/keyframe1", "dataset3/keyframe3"]
METRICS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def make_split_files(splits_dir: str, n_frames: int) -> None:
    """endovis/test_files.txt: line f needs scene_points f-1 (gt export)
    and left/{f}.png (dataset color), so f in 1..n-1."""
    d = os.path.join(splits_dir, "endovis")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "test_files.txt"), "w") as f:
        for folder in SEQS:
            for i in range(1, n_frames):
                f.write(f"{folder} {i} l\n")


def run(cmd, env=None, ref_inputs=None, capture=None):
    print("[parity_depth] $", " ".join(cmd), flush=True)
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


def parse_reference(stdout: str):
    out = {}
    m = re.search(r"^mean:(.*)$", stdout, re.M)
    if not m:
        raise RuntimeError(f"no 'mean:' row in reference output:\n{stdout[-2000:]}")
    vals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", m.group(1))]
    if len(vals) != 7:
        raise RuntimeError(f"expected 7 metrics, got {vals}")
    out.update(zip(METRICS, vals))
    m = re.search(r"^cls:(.*)$", stdout, re.M)
    if m:
        cvals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", m.group(1))]
        for k, lo, hi in zip(METRICS, cvals[0::2], cvals[1::2]):
            out[f"{k}_lo"], out[f"{k}_hi"] = lo, hi
    m = re.search(r"Scaling ratios \| med: ([-\d.]+) \| std: ([-\d.]+)", stdout)
    if m:
        out["ratio_med"], out["ratio_std"] = float(m.group(1)), float(m.group(2))
    return out


def parse_ours(stdout: str):
    out = {}
    m = re.search(r"^abs_rel=.*$", stdout, re.M)
    if not m:
        raise RuntimeError(f"no metric row in our output:\n{stdout[-2000:]}")
    vals = dict(re.findall(r"(\w+)=([-\w.+]+)", m.group(0)))
    out.update({k: float(vals[k]) for k in METRICS})
    m = re.search(r"^cls:(.*)$", stdout, re.M)
    if m:
        cvals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", m.group(1))]
        for k, lo, hi in zip(METRICS, cvals[0::2], cvals[1::2]):
            out[f"{k}_lo"], out[f"{k}_hi"] = lo, hi
    m = re.search(r"Scaling ratios \| med: ([-\d.]+) \| std: ([-\d.]+)", stdout)
    if m:
        out["ratio_med"], out["ratio_std"] = float(m.group(1)), float(m.group(2))
    return out


def run_afsfm_leg(args, work, env_ref, env_ours, wrapper) -> bool:
    """Reference evaluate_depth.py on a random afsfm checkpoint, with and
    without --post_process (metrics must be identical — the flipped
    forwards RUN and are discarded), plus our CLI on the SAME torch
    weights through the encoder.pth/depth.pth conversion path."""
    import sys as _s

    _s.path.insert(0, os.path.join(REPO, "tests"))
    import refshim

    refshim.install_shims()
    if refshim.REFERENCE_ROOT not in _s.path:
        _s.path.insert(0, refshim.REFERENCE_ROOT)
    import torch

    import models.decoders as ref_decoders
    import models.encoders as ref_encoders

    torch.manual_seed(7)
    enc = ref_encoders.ResnetEncoder(18, False)
    dec = ref_decoders.DepthDecoder(enc.num_ch_enc, scales=range(4))
    wf2 = os.path.join(work, "weights_afsfm")
    os.makedirs(os.path.join(wf2, "eval", "endovis"), exist_ok=True)
    torch.save(enc.state_dict(), os.path.join(wf2, "encoder.pth"))
    torch.save(dec.state_dict(), os.path.join(wf2, "depth.pth"))

    # H=64 W=96: the ResNet/U-Net stride chain needs /32-divisible extents
    flags = ["--data_path", args.data_path, "--eval_split", "endovis",
             "--eval_mono", "--model_type", "afsfm", "--num_layers", "18",
             "--height", "64", "--width", "96",
             "--load_weights_folder", wf2, "--num_workers", "0"]
    ref_plain = parse_reference(run(
        [sys.executable, "-u", wrapper, "evaluate_depth.py", *flags],
        env=env_ref, ref_inputs=[args.data_path, work], capture=work))
    ref_pp = parse_reference(run(
        [sys.executable, "-u", wrapper, "evaluate_depth.py", *flags,
         "--post_process"], env=env_ref,
        ref_inputs=[args.data_path, work], capture=work))
    ours_pp = parse_ours(run(
        [sys.executable, "-u", os.path.join(REPO, "evaluate_depth.py"),
         *flags, "--post_process"], env=env_ours))

    ok = True
    print(f"\n[parity_depth] afsfm model leg "
          f"({'metric':>10} | {'ref':>9} | {'ref+pp':>9} | {'ours+pp':>9})")
    for k in METRICS:
        dead = abs(ref_pp[k] - ref_plain[k]) < 1e-9
        close = abs(ours_pp[k] - ref_plain[k]) <= args.atol + args.rtol * abs(ref_plain[k])
        ok &= dead and close
        print(f"  {k:>10} | {ref_plain[k]:9.4f} | {ref_pp[k]:9.4f} | "
              f"{ours_pp[k]:9.4f}{'' if dead and close else '  <-- MISMATCH'}")
    print("[parity_depth] afsfm --post_process A/B: "
          + ("reference metrics IDENTICAL (blend executed-dead) and ours match"
             if ok else "MISMATCH"))
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--n_frames", type=int, default=24)
    ap.add_argument("--pred_hw", type=int, nargs=2, default=(48, 60),
                    help="resolution of the random ext disparities")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--afsfm", action="store_true", default=True,
                    help="run the afsfm model-path --post_process leg")
    ap.add_argument("--no_afsfm", dest="afsfm", action="store_false")
    ap.add_argument("--atol", type=float, default=5e-3)
    ap.add_argument("--rtol", type=float, default=1e-2)
    args = ap.parse_args(argv)

    work = tempfile.mkdtemp(prefix="parity_depth_")
    splits_ref = os.path.join(work, "splits_ref")
    splits_ours = os.path.join(work, "splits_ours")
    wf = os.path.join(work, "weights")  # only for the drivers' results.txt
    try:
        make_split_files(splits_ref, args.n_frames)
        make_split_files(splits_ours, args.n_frames)
        os.makedirs(os.path.join(wf, "eval", "endovis"), exist_ok=True)

        n_lines = 2 * (args.n_frames - 1)
        rng = np.random.default_rng(args.seed)
        preds = rng.uniform(0.05, 0.5,
                            (n_lines, *args.pred_hw)).astype(np.float32)
        pred_path = os.path.join(work, "pred_disps.npy")
        np.save(pred_path, preds)

        env_ref = dict(os.environ, ENDODAV_REF_SPLITS_DIR=splits_ref,
                       ENDODAV_REF_FIX_UNSQUEEZE="1")
        env_ours = dict(os.environ, ENDODAV_TPU_SPLITS_DIR=splits_ours,
                        ENDODAV_FORCE_PLATFORM="cpu")
        wrapper = os.path.join(REPO, "tools", "_ref_eval_wrapper.py")

        # --- gt export parity (exact)
        run([sys.executable, "-u", wrapper, "export_gt_depth.py",
             "--data_path", args.data_path, "--split", "endovis",
             "--useage", "eval"], env=env_ref,
            ref_inputs=[args.data_path, work], capture=work)
        run([sys.executable, "-u", os.path.join(REPO, "export_gt_depth.py"),
             "--data_path", args.data_path, "--what", "depth"], env=env_ours)
        ref_gt = np.load(os.path.join(splits_ref, "endovis", "gt_depths.npz"))["data"]
        our_gt = np.load(os.path.join(splits_ours, "endovis", "gt_depths.npz"))["data"]
        ok = ref_gt.shape == our_gt.shape and np.allclose(ref_gt, our_gt, atol=1e-6)
        print(f"[parity_depth] gt export: ref {ref_gt.shape} vs ours "
              f"{our_gt.shape} -> {'MATCH' if ok else 'MISMATCH'}")

        # --- eval driver parity (ext_disp mode)
        flags = ["--data_path", args.data_path, "--eval_split", "endovis",
                 "--eval_mono", "--ext_disp_to_eval", pred_path,
                 "--load_weights_folder", wf, "--num_workers", "0"]
        ref_out = run([sys.executable, "-u", wrapper, "evaluate_depth.py",
                       *flags], env=env_ref,
                      ref_inputs=[args.data_path, work], capture=work)
        our_out = run([sys.executable, "-u",
                       os.path.join(REPO, "evaluate_depth.py"), *flags],
                      env=env_ours)
        ref_vals = parse_reference(ref_out)
        our_vals = parse_ours(our_out)

        # --- --post_process leg: the reference's flag doubles the batch
        # with a flipped copy and then keeps only the unflipped row
        # (pred_disp[0], evaluate_depth.py:152-154,165 — the Monodepth-v1
        # blend batch_post_process_disparity is defined but never called),
        # so metrics must be IDENTICAL with and without the flag.  Proves
        # the dead-code claim by EXECUTING both drivers with it (round-4
        # VERDICT task 6) rather than asserting it from reading the code.
        pp_ref = parse_reference(run(
            [sys.executable, "-u", wrapper, "evaluate_depth.py",
             *flags, "--post_process"], env=env_ref,
            ref_inputs=[args.data_path, work], capture=work))
        pp_ours = parse_ours(run(
            [sys.executable, "-u", os.path.join(REPO, "evaluate_depth.py"),
             *flags, "--post_process"], env=env_ours))
        pp_ok = True
        for k, rv in ref_vals.items():
            pp_ok &= abs(pp_ref.get(k, np.nan) - rv) < 1e-9
            pp_ok &= abs(pp_ours.get(k, np.nan) - our_vals.get(k, np.nan)) < 1e-9
        print(f"[parity_depth] --post_process leg: metrics "
              f"{'UNCHANGED on both drivers (dead-code claim executed)' if pp_ok else 'CHANGED  <-- MISMATCH'}")
        ok &= pp_ok

        # --- afsfm MODEL-path --post_process A/B on the reference driver:
        # with a real model the flag actually RUNS the flipped forwards
        # (input batch doubled) before discarding them — executing the
        # reference twice proves batch_post_process_disparity dead on the
        # model path too, and the converted-weight drive checks our CLI
        # against the reference on the same random afsfm checkpoint.
        if args.afsfm:
            ok &= run_afsfm_leg(args, work, env_ref, env_ours, wrapper)

        print(f"\n{'metric':>12} | {'reference':>12} | {'ours':>12} | {'diff':>10}")
        for k, rv in ref_vals.items():
            if k not in our_vals:
                print(f"{k:>12} | {rv:12.4f} | {'missing':>12}   <-- MISMATCH")
                ok = False
                continue
            d = abs(rv - our_vals[k])
            tol = args.atol + args.rtol * abs(rv)
            flag = "" if d <= tol else "  <-- MISMATCH"
            ok &= d <= tol
            print(f"{k:>12} | {rv:12.4f} | {our_vals[k]:12.4f} | {d:10.4f}{flag}")
        print("\n[parity_depth] " + ("PASS — depth-driver protocols agree"
                                     if ok else "FAIL — investigate above"))
        return 0 if ok else 1
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
