"""One-command eval-protocol parity vs the reference implementation.

Runs the reference's ACTUAL `evaluate_depth_video.py` (unmodified, via
tools/_ref_eval_wrapper.py CPU patches) and this repo's CLI on the SAME
weights and data tree, then compares every printed metric
(abs_rel..a3, TAE, TAS + the abs_rel confidence interval).

This makes released-weight accuracy parity a single command the moment
real weights/data exist:

    python tools/parity_released.py --data_path /data/scared \
        --weights_folder /ckpts/weights_last --lora_type dvlora ...

and doubles as the *protocol* parity harness on synthetic data with
randomized weights (the released checkpoint in the reference mount is
truncated; VERDICT round-2 items 2 & 5):

    python tools/parity_released.py --data_path /tmp/scared_synth \
        --random_weights --disable_residual_block --disable_conv_head

Exercised reference surface: datasets.SCAREDVideos, infer_video_depth,
utils/layers.py:disp_to_depth, eval_utils median_scaling /
align_shift_and_scale, utils/utils.py:compute_errors, eval_utils
tae/tas (:104-143), scipy CI (evaluate_depth_video.py:163-253).
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3", "tae", "tas")


def make_random_reference_weights(folder: str, args) -> None:
    """Build the reference endodav with every parameter randomized
    (same recipe as tests/test_fullmodel_parity.py) and save its
    state_dict as depth_model.pth — loadable by BOTH drivers."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import refshim

    endodav_file, _, _, _ = refshim.import_reference()
    import torch

    cfgs = {
        "vits": {"encoder": "vits", "features": 64, "out_channels": [48, 96, 192, 384]},
        "vitl": {"encoder": "vitl", "features": 256, "out_channels": [256, 512, 1024, 1024]},
    }
    rbi = [] if args.disable_residual_block else [2, 5, 8, 11]
    torch.manual_seed(0)
    tm = endodav_file.endodav(
        **cfgs[args.encoder], r=args.lora_rank, lora_type=args.lora_type,
        image_shape=(224, 280), pretrained_path=None,
        residual_block_indexes=rbi, include_cls_token=True,
        inv_sigmoid=args.inv_sigmoid, temporal_lora=args.temporal_lora,
        disable_conv_head=args.disable_conv_head)
    g = torch.Generator().manual_seed(args.seed)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
    os.makedirs(folder, exist_ok=True)
    torch.save(tm.state_dict(), os.path.join(folder, "depth_model.pth"))
    print(f"[parity] randomized reference weights -> {folder}/depth_model.pth")


def parse_reference(stdout: str):
    m = re.search(r"^mean:(.*)$", stdout, re.M)
    if not m:
        raise RuntimeError(f"no 'mean:' row in reference output:\n{stdout[-2000:]}")
    vals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", m.group(1))]
    if len(vals) != 9:
        raise RuntimeError(f"expected 9 metrics, got {vals}")
    ci = None
    mc = re.search(r"^cls: (.*)$", stdout, re.M)
    if mc:
        cvals = [float(x) for x in re.findall(r"[-+]?\d+\.\d+", mc.group(1))]
        if len(cvals) >= 2:
            ci = (cvals[0], cvals[1])  # abs_rel CI
    return dict(zip(METRICS, vals)), ci


def parse_ours(stdout: str):
    m = re.search(r"^abs_rel=.*$", stdout, re.M)
    if not m:
        raise RuntimeError(f"no metric row in our output:\n{stdout[-2000:]}")
    vals = dict(re.findall(r"(\w+)=([-\w.+]+)", m.group(0)))
    out = {k: float(vals[k]) for k in METRICS}
    ci = None
    mc = re.search(r"abs_rel 95% CI: \[([-\d.]+), ([-\d.]+)\]", stdout)
    if mc:
        ci = (float(mc.group(1)), float(mc.group(2)))
    return out, ci


def run(cmd, env=None, ref_inputs=None, capture=None):
    print("[parity] $", " ".join(cmd), flush=True)
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


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--weights_folder", default=None,
                    help="folder containing depth_model.pth (torch)")
    ap.add_argument("--random_weights", action="store_true",
                    help="randomize a reference model instead (protocol parity mode)")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--encoder", default="vits", choices=["vits", "vitl"])
    ap.add_argument("--lora_type", default="lora")
    ap.add_argument("--lora_rank", type=int, default=4)
    ap.add_argument("--eval_split", default="scared_video")
    ap.add_argument("--depth_align", default="scale_shift", choices=["scale", "scale_shift", "none"])
    ap.add_argument("--disable_residual_block", action="store_true")
    ap.add_argument("--disable_conv_head", action="store_true")
    ap.add_argument("--temporal_lora", action="store_true")
    ap.add_argument("--inv_sigmoid", action="store_true")
    ap.add_argument("--ours_platform", default="cpu",
                    help="JAX platform for our CLI subprocess (cpu keeps the TPU free; "
                         "set to empty to use the session default)")
    ap.add_argument("--atol", type=float, default=5e-3,
                    help="per-metric tolerance: |ref - ours| <= atol + rtol*|ref| "
                         "(ref prints only 3 decimals)")
    ap.add_argument("--rtol", type=float, default=1e-2)
    ap.add_argument("--int8_gate", action="store_true",
                    help="also score the int8 serving path (ENDODAV_INT8=1) "
                         "against our bf16 leg and fail on AbsRel/delta1 "
                         "regression beyond --int8_tol (relative)")
    ap.add_argument("--int8_tol", type=float, default=0.005)
    args = ap.parse_args(argv)

    wf = args.weights_folder
    tmp = None
    if args.random_weights:
        tmp = tempfile.mkdtemp(prefix="parity_w_")
        make_random_reference_weights(tmp, args)
        wf = tmp
    if not wf or not os.path.exists(os.path.join(wf, "depth_model.pth")):
        ap.error("need --weights_folder with depth_model.pth, or --random_weights")
    # the reference driver writes results.txt here unconditionally
    os.makedirs(os.path.join(wf, "eval", args.eval_split), exist_ok=True)

    # the reference constructor unconditionally torch.loads
    # pretrained_path/video_depth_anything_<enc>.pth before the driver
    # overwrites every weight from depth_model.pth — an empty state_dict
    # satisfies it (strict=False) without influencing the comparison.
    pre_dir = os.path.join(wf, "_empty_pretrained")
    os.makedirs(pre_dir, exist_ok=True)
    pre_pth = os.path.join(pre_dir, f"video_depth_anything_{args.encoder}.pth")
    if not os.path.exists(pre_pth):
        import torch

        torch.save({}, pre_pth)

    flags = [
        "--data_path", args.data_path, "--load_weights_folder", wf,
        "--model_type", "endodav", "--encoder", args.encoder,
        "--lora_type", args.lora_type, "--lora_rank", str(args.lora_rank),
        "--eval_split", args.eval_split, "--depth_align", args.depth_align,
        "--eval_mono", "--pretrained_path", pre_dir,
    ]
    for name in ("disable_residual_block", "disable_conv_head", "temporal_lora", "inv_sigmoid"):
        if getattr(args, name):
            flags.append(f"--{name}")

    ref_out = run([sys.executable, "-u", os.path.join(REPO, "tools", "_ref_eval_wrapper.py"),
                   "evaluate_depth_video.py", *flags],
                  ref_inputs=[args.data_path, wf])
    ref_vals, ref_ci = parse_reference(ref_out)

    env = dict(os.environ)
    if args.ours_platform:
        env["ENDODAV_FORCE_PLATFORM"] = args.ours_platform
    our_out = run([sys.executable, "-u", os.path.join(REPO, "evaluate_depth_video.py"), *flags],
                  env=env)
    our_vals, our_ci = parse_ours(our_out)

    int8_vals = None
    if args.int8_gate:
        # bf16-vs-int8 accuracy gate for the int8 serving default (round-4
        # VERDICT task 8): score the SAME weights through the int8 GEMM
        # path (ENDODAV_INT8=1 — the explicit override works at every
        # encoder) and auto-fail if AbsRel degrades beyond the threshold
        # relative to our bf16 leg.  With released weights mounted this is
        # the one-command validation of the vitl int8 default; today it
        # runs both legs on the synthetic/random weights.
        env8 = dict(env, ENDODAV_INT8="1")
        int8_out = run([sys.executable, "-u",
                        os.path.join(REPO, "evaluate_depth_video.py"), *flags],
                       env=env8)
        int8_vals, _ = parse_ours(int8_out)

    print(f"\n{'metric':>9} | {'reference':>12} | {'ours':>12} | {'diff':>10}")
    ok = True
    for k in METRICS:
        d = abs(ref_vals[k] - our_vals[k])
        tol = args.atol + args.rtol * abs(ref_vals[k])
        flag = "" if d <= tol else "  <-- MISMATCH"
        ok &= d <= tol
        print(f"{k:>9} | {ref_vals[k]:12.4f} | {our_vals[k]:12.4f} | {d:10.4f}{flag}")
    if ref_ci and our_ci:
        d = max(abs(ref_ci[0] - our_ci[0]), abs(ref_ci[1] - our_ci[1]))
        tol = args.atol + args.rtol * abs(ref_ci[0])
        flag = "" if d <= tol else "  <-- MISMATCH"
        ok &= d <= tol
        print(f"{'absrel_ci':>9} | [{ref_ci[0]:.4f}, {ref_ci[1]:.4f}] | "
              f"[{our_ci[0]:.4f}, {our_ci[1]:.4f}] | {d:10.4f}{flag}")
    if int8_vals is not None:
        print(f"\n{'int8 gate':>9} | {'bf16':>12} | {'int8':>12} | rel delta "
              f"(fail > {args.int8_tol:.3%})")
        for k in ("abs_rel", "a1"):
            rel = (int8_vals[k] - our_vals[k]) / max(abs(our_vals[k]), 1e-9)
            # degradation = abs_rel UP or delta1 DOWN
            bad = rel > args.int8_tol if k == "abs_rel" else -rel > args.int8_tol
            ok &= not bad
            print(f"{k:>9} | {our_vals[k]:12.4f} | {int8_vals[k]:12.4f} | "
                  f"{rel:+.4%}{'  <-- INT8 REGRESSION' if bad else ''}")

    print("\n[parity] " + ("PASS — protocols agree" if ok else "FAIL — investigate above"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
