"""Load the reference PyTorch model as a numerical oracle for parity tests.

The reference's `op` package JIT-compiles CUDA at import time, which fails on
this CPU-only-torch machine; we register a spec-derived pure-torch `op`
module in sys.modules first, then import /root/reference/model.py unmodified.
Nothing from the reference is copied into this repo — it is imported
read-only at test time purely as a golden oracle.
"""

import importlib.util
import sys
import types

import pytest

REFERENCE = "/root/reference"


def _make_op_module():
    import math

    import torch
    import torch.nn.functional as F

    def upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
        """Spec: zero-insert upsample (zeros after each sample), pad/crop,
        correlate with flipped kernel, stride-downsample."""
        b, c, h, w = input.shape
        kh, kw = kernel.shape
        p0, p1 = pad
        x = input.reshape(b * c, 1, h, w)
        if up > 1:
            z = x.new_zeros(b * c, 1, h, up, w, up)
            z[:, :, :, 0, :, 0] = x.reshape(b * c, 1, h, 1, w, 1)[:, :, :, 0, :, 0]
            x = z.reshape(b * c, 1, h * up, w * up)
        x = F.pad(x, (max(p0, 0), max(p1, 0), max(p0, 0), max(p1, 0)))
        x = x[:, :,
              max(-p0, 0): x.shape[2] - max(-p1, 0),
              max(-p0, 0): x.shape[3] - max(-p1, 0)]
        kf = torch.flip(kernel, (0, 1)).reshape(1, 1, kh, kw).to(x.dtype)
        x = F.conv2d(x, kf)
        x = x[:, :, ::down, ::down]
        return x.reshape(b, c, x.shape[2], x.shape[3])

    def fused_leaky_relu(input, bias=None, negative_slope=0.2, scale=2 ** 0.5):
        if bias is not None:
            shape = [1, bias.shape[0]] + [1] * (input.ndim - 2)
            input = input + bias.reshape(shape)
        return F.leaky_relu(input, negative_slope) * scale

    class FusedLeakyReLU(torch.nn.Module):
        def __init__(self, channel, bias=True, negative_slope=0.2, scale=2 ** 0.5):
            super().__init__()
            self.bias = torch.nn.Parameter(torch.zeros(channel)) if bias else None
            self.negative_slope = negative_slope
            self.scale = scale

        def forward(self, input):
            return fused_leaky_relu(input, self.bias, self.negative_slope, self.scale)

    mod = types.ModuleType("op")
    mod.upfirdn2d = upfirdn2d
    mod.fused_leaky_relu = fused_leaky_relu
    mod.FusedLeakyReLU = FusedLeakyReLU
    return mod


_cache = {}


def load_reference_util(name):
    """Import a /root/reference/Util/<name>.py module read-only, with shims
    for the deps this CPU-only-torch box lacks (torchvision, the CUDA op
    package, and — for content_aware_pruning — the BiSeNet import, which the
    pipeline tests never call)."""
    key = f"Util.{name}"
    if key in _cache:
        return _cache[key]
    load_reference_model()  # installs the 'op' shim
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    for sub in ("utils", "transforms"):
        if not hasattr(tv, sub):
            mod = types.ModuleType(f"torchvision.{sub}")
            if sub == "transforms":
                mod.Compose = lambda ts: ts
                mod.ToTensor = lambda: None
                mod.Normalize = lambda *a, **k: None
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
    sys.modules.setdefault("model", load_reference_model())
    if "Util" not in sys.modules:
        util_pkg = types.ModuleType("Util")
        util_pkg.__path__ = [f"{REFERENCE}/Util"]
        sys.modules["Util"] = util_pkg
    if "Util.face_parsing.BiSeNet" not in sys.modules:
        # content_aware_pruning imports BiSeNet at module top; the scoring
        # functions under test never construct it.
        fp_pkg = types.ModuleType("Util.face_parsing")
        fp_pkg.__path__ = [f"{REFERENCE}/Util/face_parsing"]
        sys.modules["Util.face_parsing"] = fp_pkg
        bn = types.ModuleType("Util.face_parsing.BiSeNet")
        bn.BiSeNet = type("BiSeNet", (), {})
        sys.modules["Util.face_parsing.BiSeNet"] = bn
    # deps between Util modules (content_aware_pruning -> network_util, etc.)
    order = {"content_aware_pruning": ["network_util"],
             "pruning_util": ["network_util", "pruning_metrics"],
             "mask_util": ["network_util"]}
    for dep in order.get(name, []):
        load_reference_util(dep)
    spec = importlib.util.spec_from_file_location(
        key, f"{REFERENCE}/Util/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    _cache[key] = mod
    return mod


def load_reference_model():
    """Import /root/reference/model.py with the CPU op shim. Returns module."""
    if "model" in _cache:
        return _cache["model"]
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not available")
    sys.modules["op"] = _make_op_module()
    spec = importlib.util.spec_from_file_location(
        "reference_model", f"{REFERENCE}/model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    _cache["model"] = mod
    return mod
