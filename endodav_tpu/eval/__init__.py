from . import depthcrafter, metrics, metrics_device
from .streaming import DepthStreamer
from .video_inference import infer_video_depth, infer_video_depth_single_frame, window_indices

__all__ = [
    "depthcrafter",
    "metrics",
    "metrics_device",
    "DepthStreamer",
    "infer_video_depth",
    "infer_video_depth_single_frame",
    "window_indices",
]
