"""Single-image / folder inference demo (test_simple.py:66-172 parity):
loads a depth model, predicts disparity for each image, saves
`<name>_disp.npy` and a magma-colormapped jpeg."""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="simple depth prediction")
    p.add_argument("--image_path", type=str, required=True, help="image file or folder")
    p.add_argument("--load_weights_folder", type=str, default=None)
    p.add_argument("--pretrained_path", type=str, default=None)
    p.add_argument("--model_type", type=str, default="endodac", choices=["endodav", "endodac", "afsfm"])
    p.add_argument("--encoder", type=str, default="vits")
    p.add_argument("--lora_type", type=str, default="lora")
    p.add_argument("--lora_rank", type=int, default=4)
    p.add_argument("--residual_block_indexes", nargs="*", type=int, default=[2, 5, 8, 11])
    p.add_argument("--include_cls_token", default=True)
    p.add_argument("--disable_residual_block", action="store_true")
    p.add_argument("--disable_conv_head", action="store_true")
    p.add_argument("--pre_norm", action="store_true")
    p.add_argument("--inv_sigmoid", action="store_true")
    p.add_argument("--out_sigmoid", action="store_true")
    p.add_argument("--temporal_lora", action="store_true")
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=150.0)
    p.add_argument("--num_layers", type=int, default=18)
    p.add_argument("--scales", nargs="+", type=int, default=[0, 1, 2, 3])
    p.add_argument("--ext", type=str, default="png")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--merge_lora", action="store_true",
                   help="fold LoRA deltas into base weights for serving (exact)")
    return p.parse_args()


def test_simple(opt):
    from endodav_tpu.data.readers import read_image
    from endodav_tpu.eval import engine
    from endodav_tpu.geometry import disp_to_depth
    from endodav_tpu.ops.resize import resize2d

    model, variables = engine.build_depth_model(opt)

    @jax.jit
    def fwd(img):
        if opt.model_type == "endodav":
            return model.apply(variables, img[:, None])[("disp", 0)]
        return model.apply(variables, img)[("disp", 0)]

    if os.path.isfile(opt.image_path):
        paths = [opt.image_path]
        out_dir = opt.output_dir or os.path.dirname(opt.image_path)
    else:
        paths = sorted(glob.glob(os.path.join(opt.image_path, f"*.{opt.ext}")))
        out_dir = opt.output_dir or opt.image_path
    os.makedirs(out_dir, exist_ok=True)

    import matplotlib.cm as cm
    from PIL import Image

    for path in paths:
        img = read_image(path).astype(np.float32) / 255.0
        h, w = img.shape[:2]
        disp = fwd(jnp.asarray(img[None]))
        disp = resize2d(disp, (h, w), "bilinear", align_corners=True)
        disp_np = np.asarray(disp)[0, ..., 0]
        name = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(out_dir, f"{name}_disp.npy"), disp_np)

        vmax = np.percentile(disp_np, 95)
        normed = np.clip(disp_np / max(vmax, 1e-9), 0, 1)
        colored = (cm.get_cmap("magma")(normed)[..., :3] * 255).astype(np.uint8)
        Image.fromarray(colored).save(os.path.join(out_dir, f"{name}_disp.jpeg"))
        print(f"saved {name}_disp.npy / .jpeg")


def main():
    test_simple(parse_args())


if __name__ == "__main__":
    main()
