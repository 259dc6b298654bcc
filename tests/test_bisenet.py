"""BiSeNet JAX port parity vs the reference torch implementation (with the
resnet18 pretrained-download monkeypatched out — this environment has no
network egress, mirroring how the real 79999_iter.pth import would work)."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from content_aware_gan_compression_tpu.models.bisenet import (
    bisenet_apply, bisenet_init, make_parse_fn,
)
from content_aware_gan_compression_tpu.utils import torch_state_dict_to_pytree


@pytest.fixture(scope="module")
def ref_bisenet():
    import os
    if not os.path.isdir("/root/reference/Util/face_parsing"):
        pytest.skip("reference not available")
    # stub the pretrained download
    import torch.utils.model_zoo as modelzoo
    modelzoo.load_url = lambda url: {}
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.utils"] = tv.utils
    pkg = types.ModuleType("face_parsing")
    pkg.__path__ = ["/root/reference/Util/face_parsing"]
    sys.modules["face_parsing"] = pkg
    spec = importlib.util.spec_from_file_location(
        "face_parsing.resnet", "/root/reference/Util/face_parsing/resnet.py")
    rn = importlib.util.module_from_spec(spec)
    sys.modules["face_parsing.resnet"] = rn
    spec.loader.exec_module(rn)
    spec = importlib.util.spec_from_file_location(
        "face_parsing.BiSeNet", "/root/reference/Util/face_parsing/BiSeNet.py")
    bn = importlib.util.module_from_spec(spec)
    sys.modules["face_parsing.BiSeNet"] = bn
    spec.loader.exec_module(bn)
    torch.manual_seed(0)
    net = bn.BiSeNet(n_classes=19)
    # randomize BN stats so eval-mode BN is non-trivial
    for m in net.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def test_bisenet_parity(ref_bisenet):
    sd = {k: v.detach().numpy() for k, v in ref_bisenet.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    params = torch_state_dict_to_pytree(sd)
    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref_bisenet(torch.tensor(x))
    got = bisenet_apply(params, jnp.asarray(x))
    assert len(got) == 3
    for g, w in zip(got, want):
        assert g.shape == tuple(w.shape)
        np.testing.assert_allclose(np.asarray(g), w.numpy(),
                                   rtol=1e-3, atol=1e-3)
    # argmax parsing agreement (the quantity that actually matters)
    agree = (np.asarray(jnp.argmax(got[0], axis=1)) ==
             want[0].numpy().argmax(1)).mean()
    assert agree > 0.99


def test_bisenet_init_structure_runs():
    params = bisenet_init(jax.random.PRNGKey(0))
    parse_fn = make_parse_fn(params)
    x = jnp.zeros((1, 3, 64, 64))
    logits = parse_fn(x)
    assert logits.shape == (1, 19, 64, 64)
