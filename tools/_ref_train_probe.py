"""Reference train-step probe — run via tools/_ref_eval_wrapper.py.

Builds the reference's ACTUAL Trainer (trainer_end_to_end_video.py) on a
synthetic tree with randomized weights, executes exactly one run_epoch
iteration's compute (flatten -> process_batch_0 -> optimizer_0 step ->
process_batch, trainer:395-431 — no main-optimizer step, losses are
forward values), and dumps everything the parity comparison needs:

  out_dir/
    batch.npz        the PRE-flatten dataloader batch (torch layouts)
    losses.json      phase-0 and main losses dicts (+ determinism check)
    *.pth            the randomized state_dicts of all 8 components

Usage (through the wrapper, with ENDODAV_REF_SPLITS_DIR set):
    python tools/_ref_eval_wrapper.py tools/_ref_train_probe.py \
        --data_path <tree> --out_dir <dir> [trainer flags...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import torch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--T", type=int, default=4)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=96)
    ap.add_argument("--encoder", default="vits")
    ap.add_argument("--lora_type", default="lora")
    ap.add_argument("--lora_rank", type=int, default=4)
    args, extra = ap.parse_known_args()

    os.makedirs(args.out_dir, exist_ok=True)
    log_dir = os.path.join(args.out_dir, "logs")
    pre_dir = os.path.join(args.out_dir, "_empty_pretrained")
    os.makedirs(pre_dir, exist_ok=True)
    torch.save({}, os.path.join(pre_dir, f"video_depth_anything_{args.encoder}.pth"))

    sys.argv = ["trainer", "--data_path", args.data_path, "--log_dir", log_dir,
                "--model_type", "endodav", "--encoder", args.encoder,
                "--lora_type", args.lora_type, "--lora_rank", str(args.lora_rank),
                "--pretrained_path", pre_dir, "--no_cuda",
                "--batch_size", "1", "--T", str(args.T),
                "--height", str(args.height), "--width", str(args.width),
                "--num_workers", "0", "--weights_init", "scratch",
                "--disable_residual_block", "--disable_conv_head",
                *extra]

    from options import MonodepthOptions

    import trainer_end_to_end_video as tev

    opt = MonodepthOptions().parse()
    trainer = tev.Trainer(opt)

    # randomize EVERY parameter and the BN running stats of all components.
    # Only running_mean/running_var buffers — other registered buffers
    # (the motion modules' sinusoidal pe, rope freqs) are protocol
    # CONSTANTS that both frameworks must derive identically.
    g = torch.Generator().manual_seed(args.seed)
    with torch.no_grad():
        for name in sorted(trainer.models):
            m = trainer.models[name]
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g, dtype=torch.float32) * 0.05)
            for bn, b in m.named_buffers():
                if not b.dtype.is_floating_point:
                    continue
                if bn.endswith("running_mean"):
                    b.copy_(torch.randn(b.shape, generator=g) * 0.2)
                elif bn.endswith("running_var"):
                    b.copy_(0.5 + 0.5 * torch.rand(b.shape, generator=g))

    for name, m in trainer.models.items():
        torch.save(m.state_dict(), os.path.join(args.out_dir, f"{name}.pth"))

    # one deterministic dataloader batch (the dataset draws from python
    # random, np.random AND torch RNG — seed all three)
    import random

    random.seed(args.seed)
    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    inputs = next(iter(trainer.train_loader))
    np.savez_compressed(
        os.path.join(args.out_dir, "batch.npz"),
        **{repr(k): v.numpy() for k, v in inputs.items()
           if isinstance(v, torch.Tensor)})

    # run_epoch's single-iteration compute (trainer:395-431)
    if opt.T > -1:
        for key in inputs.keys():
            if isinstance(inputs[key], torch.Tensor):
                inputs[key] = inputs[key].flatten(0, 1)

    def snap(losses):
        return {k: float(v) for k, v in losses.items()}

    # train() initializes these before run_epoch (trainer:376-394)
    trainer.epoch = 0
    trainer.step = 0

    trainer.set_train_0()
    _, l0_a = trainer.process_batch_0(dict(inputs))
    _, l0_b = trainer.process_batch_0(dict(inputs))  # determinism self-check
    trainer.model_optimizer_0.zero_grad()
    l0_a["loss"].backward()
    trainer.model_optimizer_0.step()

    trainer.set_train()
    outputs, losses = trainer.process_batch(dict(inputs))
    np.savez_compressed(
        os.path.join(args.out_dir, "disps.npz"),
        **{f"disp{s}": outputs[("disp", s)].detach().cpu().numpy()
           for s in trainer.opt.scales})

    out = {
        "phase0": snap(l0_a),
        "phase0_recompute": snap(l0_b),
        "main": snap(losses),
    }
    with open(os.path.join(args.out_dir, "losses.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("[ref_train_probe] phase0 loss", out["phase0"]["loss"],
          "main loss", out["main"]["loss"])


if __name__ == "__main__":
    main()
