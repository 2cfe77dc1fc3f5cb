"""Torchvision ResNet-34 weight-converter validation — no torchvision needed.

torchvision is not installed here, but torchvision.models.resnet34's
``state_dict`` layout is fully determined by its architecture: BasicBlock
stage plan (3, 4, 6, 3) with key names ``conv1.weight``, ``bn1.*``,
``layer{s}.{b}.conv{1,2}.weight``, ``layer{s}.{b}.bn{1,2}.*`` and
``layer{s}.{b}.downsample.{0,1}.*`` on the first block of every strided
stage.  This test hand-builds a torch twin with that exact layout, pushes
RANDOM weights + random BN running stats through
``models/resnet.py:load_torchvision_state_dict``, and asserts
SpatialEncoder forward parity against the reference's own
``SpatialEncoder.forward`` (lib/encoder.py:260-306) running on the twin —
in BN eval AND train modes.

The day real ImageNet weights appear, quality parity is a file copy, not
a debugging session.
"""

import types

import numpy as np
import pytest

from tests.reference_oracle import reference_available, extract_method

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


class _TorchBasicBlock(tnn.Module):
    """BasicBlock with torchvision's exact submodule names."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchvisionResNet34Twin(tnn.Module):
    """state_dict-layout twin of ``torchvision.models.resnet34``.

    Key set is identical (verified below against the documented layout):
    ``conv1.weight``, ``bn1.{weight,bias,running_mean,running_var,
    num_batches_tracked}``, ``layer{1..4}.{b}.…``, ``fc.{weight,bias}``.
    """

    STAGES = ((64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2))

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, (planes, blocks, stride) in enumerate(self.STAGES, start=1):
            downsample = None
            if stride != 1 or inplanes != planes:
                downsample = tnn.Sequential(
                    tnn.Conv2d(inplanes, planes, 1, stride, bias=False),
                    tnn.BatchNorm2d(planes),
                )
            layers = [_TorchBasicBlock(inplanes, planes, stride, downsample)]
            layers += [_TorchBasicBlock(planes, planes) for _ in range(1, blocks)]
            setattr(self, f"layer{i}", tnn.Sequential(*layers))
            inplanes = planes
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(512, 1000)


def _randomized_twin(seed=0):
    """Twin with random conv/BN weights AND random running stats, so BN
    eval mode is exercised with non-trivial statistics."""
    torch.manual_seed(seed)
    twin = TorchvisionResNet34Twin()
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.normal_(0.0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    return twin


def _ref_forward(twin, x_t, num_layers, train):
    """Run the reference's own SpatialEncoder.forward on the twin."""
    fwd = extract_method(
        "lib/encoder.py", "SpatialEncoder", "forward",
        {"torch": torch, "F": F, "nn": tnn},
    )
    self = types.SimpleNamespace(
        feature_scale=0.5, use_first_pool=False, num_layers=num_layers,
        index_interp="bilinear", model=twin,
    )
    twin.train(train)
    if train:
        return fwd(self, x_t)
    with torch.no_grad():
        return fwd(self, x_t)


def test_twin_state_dict_layout():
    """The twin's key set matches torchvision resnet34's documented layout."""
    keys = set(TorchvisionResNet34Twin().state_dict().keys())
    assert "conv1.weight" in keys and "bn1.running_var" in keys
    assert "layer1.2.conv2.weight" in keys            # 3 blocks in layer1
    assert "layer2.0.downsample.0.weight" in keys     # strided stage
    assert "layer2.0.downsample.1.running_mean" in keys
    assert "layer1.0.downsample.0.weight" not in keys  # layer1 never strides
    assert "layer3.5.bn2.bias" in keys                # 6 blocks in layer3
    assert "layer4.2.conv1.weight" in keys            # 3 blocks in layer4
    assert "fc.weight" in keys
    # every param/buffer follows one of the documented name shapes
    import re
    pat = re.compile(
        r"^(conv1\.weight|bn1\.\w+|fc\.(weight|bias)|"
        r"layer[1-4]\.\d+\.(conv[12]\.weight|bn[12]\.\w+|"
        r"downsample\.[01]\.\w+))$"
    )
    assert all(pat.match(k) for k in keys), sorted(
        k for k in keys if not pat.match(k)
    )


@pytest.mark.parametrize("num_layers", [2, 3])
@pytest.mark.parametrize("train", [False, True])
def test_spatial_encoder_forward_parity(num_layers, train):
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.models.resnet import (
        SpatialEncoder, load_torchvision_state_dict,
    )

    twin = _randomized_twin(seed=num_layers)
    # .copy(): .numpy() aliases torch storage, and a train-mode reference
    # forward updates running stats IN PLACE — don't let it mutate the
    # state_dict the converter consumes
    state_dict = {
        k: v.detach().numpy().copy() for k, v in twin.state_dict().items()
    }

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

    ref = _ref_forward(twin, torch.from_numpy(x), num_layers, train)
    ref = ref.detach().numpy()

    enc = SpatialEncoder(num_layers=num_layers)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = load_torchvision_state_dict(
        variables, state_dict, num_layers=num_layers
    )
    if train:
        out, _ = enc.apply(
            variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
        )
    else:
        out = enc.apply(variables, jnp.asarray(x), train=False)
    out = np.asarray(out)

    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_running_stat_update_matches_torch():
    """One train-mode forward updates flax batch_stats the way torch
    momentum-0.1 updates running stats (documented in resnet.py)."""
    import jax
    import jax.numpy as jnp

    from mpsnerf_tpu.models.resnet import (
        SpatialEncoder, load_torchvision_state_dict,
    )

    twin = _randomized_twin(seed=7)
    state_dict = {
        k: v.detach().numpy().copy() for k, v in twin.state_dict().items()
    }

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)

    _ref_forward(twin, torch.from_numpy(x), 2, train=True)  # updates stats
    ref_mean = twin.bn1.running_mean.detach().numpy()
    ref_var = twin.bn1.running_var.detach().numpy()

    enc = SpatialEncoder(num_layers=2)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    variables = load_torchvision_state_dict(variables, state_dict, num_layers=2)
    _, upd = enc.apply(
        variables, jnp.asarray(x), train=True, mutable=["batch_stats"]
    )
    got_mean = np.asarray(upd["batch_stats"]["bn1"]["mean"])
    got_var = np.asarray(upd["batch_stats"]["bn1"]["var"])

    np.testing.assert_allclose(got_mean, ref_mean, atol=1e-5, rtol=1e-5)
    # torch updates running_var with the UNBIASED batch variance; flax
    # uses the biased one.  With the conv1 output's n = 2*32*32 samples
    # per channel the relative gap is 1/(n-1) ≈ 5e-4 — assert within that.
    np.testing.assert_allclose(got_var, ref_var, rtol=2e-3)
