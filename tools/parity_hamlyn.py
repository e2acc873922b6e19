"""Hamlyn video-driver protocol parity vs the reference's
evaluate_depth_video_hamlyn.py (pred_root npy re-eval mode).

Fourth leg of the driver-parity harness (after parity_released.py /
parity_pose.py / parity_depth.py): runs the reference's ACTUAL
`evaluate_depth_video_hamlyn.py --pred_root` (unmodified, via
tools/_ref_eval_wrapper.py with the splits redirect) and our CLI on the
same synthetic Hamlyn tree + the same random depth npys, then compares
the printed protocol: the aggregate shift/scale alignment stats, the 7
depth metric means, and each metric's 95% CI
(evaluate_depth_video_hamlyn.py:178-258).  pred_root mode isolates the
HamlynVideos loader + alignment + metric protocol from the model graph.

    python tools/parity_hamlyn.py --data_path /tmp/hamlyn_synth
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
SEQS = ["rectified01", "rectified05"]
METRICS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def make_tree(data_path: str, pred_root: str, n_frames: int, hw, seed: int):
    """Synthetic Hamlyn tree: <seq>/depth01/NNNN.png uint16 depths in
    (MIN_DEPTH, 150) + pred_root/<seq>/depth/NNNN.npy float depths."""
    import cv2

    rng = np.random.default_rng(seed)
    h, w = hw
    for seq in SEQS:
        ddir = os.path.join(data_path, seq, "depth01")
        pdir = os.path.join(pred_root, seq, "depth")
        os.makedirs(ddir, exist_ok=True)
        os.makedirs(pdir, exist_ok=True)
        for i in range(n_frames):
            gt = rng.uniform(5, 140, (h, w)).astype(np.uint16)
            cv2.imwrite(os.path.join(ddir, f"{i:06d}.png"), gt)
            pred = rng.uniform(0.5, 5.0, (h, w)).astype(np.float32)
            np.save(os.path.join(pdir, f"{i:06d}.npy"), pred)


def make_split_files(splits_dir: str) -> None:
    d = os.path.join(splits_dir, "hamlyn_video")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "val_files_all.txt"), "w") as f:
        f.write("\n".join(SEQS) + "\n")


def run(cmd, env=None, ref_inputs=None, capture=None):
    print("[parity_hamlyn] $", " ".join(cmd), flush=True)
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


def parse(stdout: str) -> dict[str, float]:
    """Both drivers print the same sentences for the aggregate rows; the
    LAST occurrence of each is the final summary (the reference also
    prints per-sequence rows above)."""
    out = {}
    aligns = re.findall(r"Aligning shift and scale \| t_gt: ([-\d.]+) \| "
                        r"s_gt: ([-\d.]+) \| t_pred: ([-\d.]+) \| "
                        r"s_pred: ([-\d.]+)", stdout)
    if aligns:
        for k, v in zip(("t_gt", "s_gt", "t_pred", "s_pred"), aligns[-1]):
            out[k] = float(v)
    means = re.findall(r"^mean:(.*)$", stdout, re.M)
    if means:
        vals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", means[-1])]
        out.update(zip(METRICS, vals))
    else:
        m = re.search(r"^abs_rel=.*$", stdout, re.M)
        if not m:
            raise RuntimeError(f"no metric row in:\n{stdout[-2000:]}")
        vals = dict(re.findall(r"(\w+)=([-\w.+]+)", m.group(0)))
        out.update({k: float(vals[k]) for k in METRICS})
    cls_rows = re.findall(r"^cls:(.*)$", stdout, re.M)
    if cls_rows:
        cvals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", cls_rows[-1])]
        for k, lo, hi in zip(METRICS, cvals[0::2], cvals[1::2]):
            out[f"{k}_lo"], out[f"{k}_hi"] = lo, hi
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_path", default=None,
                    help="existing synthetic hamlyn tree; generated when omitted")
    ap.add_argument("--n_frames", type=int, default=12)
    ap.add_argument("--hw", type=int, nargs=2, default=(48, 60))
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--depth_align", default="scale_shift",
                    choices=["scale", "scale_shift"])
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--atol", type=float, default=5e-3)
    ap.add_argument("--rtol", type=float, default=1e-2)
    args = ap.parse_args(argv)

    work = tempfile.mkdtemp(prefix="parity_hamlyn_")
    data_path = args.data_path or os.path.join(work, "data")
    pred_root = os.path.join(work, "pred_root")
    splits_ref = os.path.join(work, "splits_ref")
    splits_ours = os.path.join(work, "splits_ours")
    try:
        make_tree(data_path, pred_root, args.n_frames, args.hw, args.seed)
        make_split_files(splits_ref)
        make_split_files(splits_ours)

        flags = ["--data_path", data_path, "--pred_root", pred_root,
                 "--eval_split", "hamlyn_video", "--eval_mono",
                 "--depth_align", args.depth_align]
        env_ref = dict(os.environ, ENDODAV_REF_SPLITS_DIR=splits_ref)
        env_ours = dict(os.environ, ENDODAV_TPU_SPLITS_DIR=splits_ours,
                        ENDODAV_FORCE_PLATFORM="cpu")
        wrapper = os.path.join(REPO, "tools", "_ref_eval_wrapper.py")
        ref_out = run([sys.executable, "-u", wrapper,
                       "evaluate_depth_video_hamlyn.py", *flags], env=env_ref,
                      ref_inputs=[work], capture=work)
        our_out = run([sys.executable, "-u",
                       os.path.join(REPO, "evaluate_depth_video_hamlyn.py"),
                       *flags], env=env_ours)
        ref_vals = parse(ref_out)
        our_vals = parse(our_out)

        ok = True
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
        print("\n[parity_hamlyn] " + ("PASS — hamlyn protocols agree"
                                      if ok else "FAIL — investigate above"))
        return 0 if ok else 1
    finally:
        if not args.keep:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
