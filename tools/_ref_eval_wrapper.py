"""Run a /root/reference eval driver unmodified on this CPU-only box.

Usage: python tools/_ref_eval_wrapper.py <driver.py> [driver flags...]

The reference scripts assume a CUDA torch and an older scipy; this
wrapper installs runtime patches (plus the tests/refshim.py module shims
for torchvision/fvcore) so the reference's *actual* protocol code —
dataset loaders, infer_video_depth, alignment, compute_errors, TAE/TAS,
confidence intervals — executes byte-for-byte for parity comparison.

Patches (wrapper-side only; the reference tree is never modified):
  * torch.Tensor.cuda / torch.nn.Module.cuda -> identity (CPU)
  * torch.load -> map_location="cpu"
  * scipy.stats t.interval(alpha=...) -> confidence= (renamed in scipy 1.9)
"""

from __future__ import annotations

import os
import runpy
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
import refshim  # noqa: E402


def main():
    driver = sys.argv[1]
    if not os.path.isabs(driver):
        driver = os.path.join(refshim.REFERENCE_ROOT, driver)

    refshim.install_shims()

    import functools

    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    _load = torch.load
    torch.load = functools.partial(_load, map_location="cpu")

    def _decuda(a):
        if isinstance(a, str) and a.startswith("cuda"):
            return "cpu"
        if isinstance(a, torch.device) and a.type == "cuda":
            return torch.device("cpu")
        return a

    _to = torch.Tensor.to

    def _to_cpu(self, *a, **k):
        a = tuple(_decuda(x) for x in a)
        if "device" in k:
            k["device"] = _decuda(k["device"])
        return _to(self, *a, **k)

    torch.Tensor.to = _to_cpu

    import scipy.stats as st

    class _IntervalShim:
        def __init__(self, dist):
            self._dist = dist

        def __getattr__(self, name):
            return getattr(self._dist, name)

        def interval(self, *args, alpha=None, **kwargs):
            if alpha is not None:
                kwargs["confidence"] = alpha
            return self._dist.interval(*args, **kwargs)

    st.t = _IntervalShim(st.t)

    # Optional splits redirect: the reference mount is read-only and ships
    # WITHOUT the pose split/curve files its own evaluate_pose.py +
    # export_gt_pose.py expect (splits/endovis/test_files_sequence*.txt,
    # curve/gt_poses_*.npz) — and those drivers also WRITE npz files into
    # the splits tree.  ENDODAV_REF_SPLITS_DIR=<dir> serves reads from and
    # directs writes to <dir>/... for any path under reference/splits/,
    # leaving /root/reference untouched.
    redirect = os.environ.get("ENDODAV_REF_SPLITS_DIR")
    if redirect:
        ref_splits = os.path.join(refshim.REFERENCE_ROOT, "splits")

        def _redir(path):
            if isinstance(path, (str, os.PathLike)):
                p = os.fspath(path)
                if p.startswith(ref_splits):
                    return os.path.join(redirect, os.path.relpath(p, ref_splits))
            return path

        import builtins

        import numpy as np

        _open, _npload, _npsavez = builtins.open, np.load, np.savez_compressed
        builtins.open = lambda file, *a, **k: _open(_redir(file), *a, **k)
        np.load = lambda file, *a, **k: _npload(_redir(file), *a, **k)
        np.savez_compressed = lambda file, *a, **k: _npsavez(_redir(file), *a, **k)

    if refshim.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, refshim.REFERENCE_ROOT)

    # ENDODAV_REF_FIX_UNSQUEEZE=1: the reference's MonoDataset.__getitem__
    # ends with a marked "# edit" that unsqueeze(0)s EVERY tensor
    # (datasets/mono_dataset.py:206-209), so its own DataLoader consumers —
    # evaluate_pose.py:132 (torch.cat dim=1 -> conv2d), evaluate_depth.py,
    # evaluate_depth_video_pose.py — crash on shape before step 1 as
    # shipped (the video pipeline uses SCAREDVideos, which overrides
    # __getitem__ and is unaffected).  This opt-in patch reverses that one
    # edit so the downstream protocol math (what parity tests compare) can
    # execute with the monodepth2 shapes the drivers were written for.
    if os.environ.get("ENDODAV_REF_FIX_UNSQUEEZE"):
        import torch as _torch

        import datasets.mono_dataset as _md

        _orig_getitem = _md.MonoDataset.__getitem__

        def _squeezed_getitem(self, idx):
            out = _orig_getitem(self, idx)
            for k, v in out.items():
                if isinstance(v, _torch.Tensor) and v.ndim >= 1 and v.shape[0] == 1:
                    out[k] = v.squeeze(0)
            return out

        _md.MonoDataset.__getitem__ = _squeezed_getitem

    # ENDODAV_REF_STUB_VIS=1: stub the mp4/trajectory-plot writers.
    # evaluate_depth_video_pose.py only defines eval_dir under
    # --visualize_depth (:170-172) yet writes results_eval.txt/pose_eval.txt
    # through it unconditionally (:252,:317) — so the driver NEEDS
    # --visualize_depth to not crash, but save_video requires the absent
    # imageio-ffmpeg plugin.  The stubs drop the visual artifacts only;
    # every metric and npy write still runs.
    if os.environ.get("ENDODAV_REF_STUB_VIS"):
        import utils.eval_utils as _eu

        _eu.save_video = lambda *a, **k: None
        _eu.vis_pose_sq = lambda *a, **k: None

    sys.argv = [driver] + sys.argv[2:]
    runpy.run_path(driver, run_name="__main__")


if __name__ == "__main__":
    main()
