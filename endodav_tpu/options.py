"""CLI option surface (options.py:18-343 parity).

One argparse namespace shared by training and every eval entry point,
with the same flag names and defaults as the reference so shell scripts
port unchanged.  TPU-specific flags replace the CUDA/DataParallel ones:
`--no_cuda`/`--use_dp` are kept as accepted-but-advisory aliases and
`--mesh_shape` controls the jax device mesh.
"""

from __future__ import annotations

import argparse
import os

__all__ = ["EndoDAVOptions"]


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


class EndoDAVOptions:
    def __init__(self):
        p = argparse.ArgumentParser(description="endodav_tpu options")
        self.parser = p

        # PATHS
        p.add_argument("--data_path", type=str, default=os.path.join(os.getcwd(), "endovis_data"))
        p.add_argument("--log_dir", type=str, default=os.path.join(os.path.expanduser("~"), "tmp"))

        # MODEL
        p.add_argument("--encoder", type=str, choices=["vits", "vitb", "vitl"], default="vits")
        p.add_argument("--pre_norm", action="store_true")
        p.add_argument("--inv_sigmoid", action="store_true")
        p.add_argument("--out_sigmoid", action="store_true")
        p.add_argument("--pretrained_path", type=str, default=None,
                       help="dir holding video_depth_anything_<enc>.pth / depth_anything_<arch>.pth")
        p.add_argument("--lora_type", type=str, choices=["lora", "dvlora", "ssb", "dash", "none"],
                       default="dvlora")
        p.add_argument("--lora_rank", type=int, default=4)
        p.add_argument("--warm_up_step", type=int, default=20000)
        p.add_argument("--tune_depth_interval", type=int, default=-1)
        p.add_argument("--temporal_lora", action="store_true")
        p.add_argument("--tune_temporal_interval", type=int, default=100)
        p.add_argument("--tune_spatial_interval", type=int, default=300)
        p.add_argument("--disable_residual_block", action="store_true")
        p.add_argument("--disable_conv_head", action="store_true")
        p.add_argument("--residual_block_indexes", nargs="*", type=int, default=[2, 5, 8, 11])
        p.add_argument("--include_cls_token", type=str2bool, default=True)
        p.add_argument("--learn_intrinsics", type=str2bool, default=True)

        # TRAINING
        p.add_argument("--model_name", type=str, default="endodav")
        p.add_argument("--split", type=str, choices=["endovis", "scared_video"], default="scared_video")
        p.add_argument("--num_layers", type=int, default=18, choices=[18, 34, 50, 101, 152])
        p.add_argument("--frame_max_interval", type=int, default=1)
        p.add_argument("--random_train", action="store_true")
        p.add_argument("--dataset", type=str, default="scared_video", choices=["endovis", "scared_video"])
        p.add_argument("--png", action="store_true")
        p.add_argument("--height", type=int, default=256)
        p.add_argument("--width", type=int, default=320)
        p.add_argument("--depth_reproj", type=float, default=0.0)
        p.add_argument("--depth_flow", type=float, default=0.0)
        p.add_argument("--disparity_smoothness", type=float, default=1e-3)
        p.add_argument("--position_smoothness", type=float, default=1e-3)
        p.add_argument("--transform_constraint", type=float, default=0.01)
        p.add_argument("--transform_smoothness", type=float, default=0.01)
        p.add_argument("--scales", nargs="+", type=int, default=[0, 1, 2, 3])
        p.add_argument("--min_depth", type=float, default=0.1)
        p.add_argument("--max_depth", type=float, default=150.0)
        p.add_argument("--use_stereo", action="store_true")
        p.add_argument("--frame_ids", nargs="+", type=int, default=[0, -1, 1])
        p.add_argument("--train_output_conv", action="store_true")
        p.add_argument("--legacy_frozen_groups", nargs="*", type=str, default=[],
                       help="schedule groups whose optimizer gate is forced to 0; pass "
                            "'spatial_uv temporal_ab temporal_uv' to reproduce the "
                            "reference's literal optimizer membership (its Adam never "
                            "registers lora_U/V or temporal params, trainer:80)")

        # OPTIMIZATION
        p.add_argument("--batch_size", type=int, default=8)
        p.add_argument("--T", type=int, default=-1)
        p.add_argument("--learning_rate", type=float, default=1e-4)
        p.add_argument("--num_epochs", type=int, default=20)
        p.add_argument("--scheduler_step_size", type=int, default=10)

        # ABLATION
        p.add_argument("--v1_multiscale", action="store_true")
        p.add_argument("--avg_reprojection", action="store_true")
        p.add_argument("--disable_automasking", action="store_true")
        p.add_argument("--predictive_mask", action="store_true")
        p.add_argument("--no_ssim", action="store_true")
        p.add_argument("--weights_init", type=str, default="pretrained", choices=["pretrained", "scratch"])
        p.add_argument("--pose_model_input", type=str, default="pairs", choices=["pairs", "all"])
        p.add_argument("--pose_model_type", type=str, default="separate_resnet",
                       choices=["posecnn", "separate_resnet", "shared"])

        # SYSTEM (TPU)
        p.add_argument("--no_cuda", action="store_true", help="accepted for script parity; ignored")
        p.add_argument("--num_workers", type=int, default=4)
        p.add_argument("--use_dp", action="store_true",
                       help="accepted for script parity; data-parallel is always mesh-based")
        p.add_argument("--mesh_shape", type=str, default="",
                       help="device mesh as 'data=N' (default: all local devices on one data axis)")
        p.add_argument("--compute_dtype", type=str, default="float32",
                       choices=["float32", "bfloat16"])

        # LOADING
        p.add_argument("--load_weights_folder", type=str, default=None)
        p.add_argument("--models_to_load", nargs="+", type=str,
                       default=["position_encoder", "position"])

        # LOGGING
        p.add_argument("--log_frequency", type=int, default=400)
        p.add_argument("--save_frequency", type=int, default=5)

        # EVALUATION
        p.add_argument("--model_type", type=str, choices=["endodav", "endodac", "afsfm"],
                       default="endodav")
        p.add_argument("--eval_stereo", action="store_true")
        p.add_argument("--eval_mono", action="store_true")
        p.add_argument("--disable_median_scaling", action="store_true")
        p.add_argument("--depth_align", type=str, default="scale_shift", choices=["scale", "scale_shift"])
        p.add_argument("--pred_depth_scale_factor", type=float, default=1)
        p.add_argument("--ext_disp_to_eval", type=str)
        p.add_argument("--pred_root", type=str, default=None)
        p.add_argument("--disp2depth", action="store_true")
        p.add_argument("--eval_split", type=str, default="scared_video",
                       choices=["hamlyn", "c3vd", "endovis", "scared_video", "hamlyn_video"])
        p.add_argument("--save_pred_disps", action="store_true")
        p.add_argument("--visualize_depth", action="store_true")
        p.add_argument("--no_eval", action="store_true")
        p.add_argument("--eval_eigen_to_benchmark", action="store_true")
        p.add_argument("--eval_out_dir", type=str)
        p.add_argument("--post_process", action="store_true")
        # extension: ACTUALLY apply the Monodepth-v1 flip blend.  The
        # reference's --post_process runs the flipped second forward but
        # its batch_post_process_disparity is dead code (defined, never
        # called — evaluate_depth.py:35-47 vs :152-166), so metrics are
        # unchanged; this flag opts into the real blend.
        p.add_argument("--post_process_blend", action="store_true")
        p.add_argument("--max_length", type=int, default=None)
        p.add_argument("--save_recon", action="store_true")

        # inference batching knobs (TPU window parallelism)
        p.add_argument("--chunk_windows", type=int, default=2,
                       help="video-depth windows batched per forward pass "
                            "(v5e vits throughput optimum: 4 at 518px, "
                            "5-10 at 224x280 — PERFORMANCE.md; window "
                            "count pads up to a multiple of this)")
        p.add_argument("--depth_image_shape", nargs=2, type=int, default=[224, 280],
                       help="model-internal (H, W); the 518px config is "
                            "'--depth_image_shape 518 518' with keep-aspect "
                            "lower-bound sizing (endodav.py:162-180)")
        p.add_argument("--host_preprocess", action="store_true",
                       help="build the training pyramid + jitter on host "
                            "(default: on device from scale-0 tensors)")
        p.add_argument("--serve_mesh", type=str, default="",
                       help="'data=N': shard video-depth window chunks over N "
                            "devices (throughput); 'model=N': tensor-parallel "
                            "ViT trunk over N devices (per-window latency; "
                            "needs --merge_lora)")
        p.add_argument("--fast_stitch", action="store_true",
                       help="single-kernel on-device window stitch (serving fast path)")
        p.add_argument("--merge_lora", action="store_true",
                       help="fold LoRA deltas into the base weights for "
                            "serving (exact; -6%% forward time, "
                            "models/lora.py:merge_lora_params)")

    def parse(self, args=None):
        return self.parser.parse_args(args)
