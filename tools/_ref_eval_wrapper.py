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

    if refshim.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, refshim.REFERENCE_ROOT)
    sys.argv = [driver] + sys.argv[2:]
    runpy.run_path(driver, run_name="__main__")


if __name__ == "__main__":
    main()
