"""Numerical forward parity of the backbone weight conversion against a real
torch forward (SURVEY.md section 7.3 hard part #1).

The published accuracies sit on torchvision's exact ResNet-152 features at
448 input (extract_image_features.py:19-26) and the predict path on VGG-19
taps {27, 36} (predict_pytorch.py:34-37). torchvision is not installed here,
so the twins below re-build the exact torchvision module graphs in torch
(same state_dict key names, same padding/stride placement), load a random
state_dict into both frameworks, and assert activation parity. A conversion
or padding-semantics bug cannot survive this test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vqa_attention_networks_tpu.models import resnet, vgg  # noqa: E402


# ---------------------------------------------------------------------------
# torch twins of the torchvision graphs (state_dict-compatible key names)
# ---------------------------------------------------------------------------

class _Bottleneck(nn.Module):
    """torchvision.models.resnet.Bottleneck (v1.5: stride on the 3x3)."""

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class _ResNetTrunk(nn.Module):
    """torchvision resnet152 minus avgpool+fc — the reference's extractor
    (extract_image_features.py:19-26)."""

    def __init__(self, layers=resnet.STAGES):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                          bias=False),
                nn.BatchNorm2d(planes * 4),
            )
        layers = [_Bottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [_Bottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x


class _VGG19Features(nn.Module):
    """torchvision vgg19().features (key names features.<i>.weight/bias)."""

    def __init__(self):
        super().__init__()
        mods, cin = [], 3
        for item in vgg.VGG19_CFG:
            if item == "M":
                mods.append(nn.MaxPool2d(2, 2))
            else:
                mods.append(nn.Conv2d(cin, item, 3, padding=1))
                mods.append(nn.ReLU(inplace=True))
                cin = item
        self.features = nn.Sequential(*mods)

    def forward(self, x, taps):
        outs = []
        for i, m in enumerate(self.features):
            x = m(x)
            if i in taps:
                outs.append(x)
            if i >= max(taps):
                break
        return outs


def _randomize_state_dict(model: nn.Module, seed: int) -> None:
    """Random weights + non-trivial BN running stats, bounded so activations
    stay finite through 50 residual blocks."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for key, t in sd.items():
        if key.endswith("running_var"):
            t.copy_(0.5 + torch.rand(t.shape, generator=gen))
        elif key.endswith("running_mean"):
            t.copy_(0.1 * torch.randn(t.shape, generator=gen))
        elif key.endswith("num_batches_tracked"):
            continue
        elif t.ndim == 4:  # conv
            fan_in = t.shape[1] * t.shape[2] * t.shape[3]
            t.copy_(torch.randn(t.shape, generator=gen) * (1.0 / fan_in) ** 0.5)
        elif key.endswith(".weight"):  # bn gamma
            t.copy_(0.8 + 0.4 * torch.rand(t.shape, generator=gen))
        else:  # biases / bn beta
            t.copy_(0.05 * torch.randn(t.shape, generator=gen))
    model.load_state_dict(sd)


def _rel_err(got: np.ndarray, want: np.ndarray) -> float:
    return float(np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-12))


def test_resnet152_conversion_matches_torch_forward():
    torch.manual_seed(0)
    model = _ResNetTrunk().eval()
    _randomize_state_dict(model, seed=1)

    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = resnet.convert_torchvision_resnet152(sd)

    # 64x64 keeps the full 152-layer depth cheap on CPU; every stride-2
    # stage boundary (the padding-semantics trap) is still exercised.
    x = np.random.default_rng(2).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1).reshape(2, -1, 2048)  # NCHW -> [N,L,C]

    got = np.asarray(resnet.apply(params, jnp.asarray(x), dtype=jnp.float32))
    assert got.shape == want.shape
    err = _rel_err(got, want)
    assert err < 1e-4, f"converted ResNet-152 diverges from torch: {err:.2e}"


def test_resnet152_conversion_matches_torch_448():
    """One batch at the production 448 resolution (the reference's input,
    extract_image_features.py:55-60) on a depth-reduced trunk — full depth
    at 448 is minutes on this CPU; the padding semantics it guards are
    per-layer, not per-depth."""
    torch.manual_seed(0)
    model = _ResNetTrunk(layers=(1, 1, 1, 1)).eval()
    _randomize_state_dict(model, seed=3)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    import vqa_attention_networks_tpu.models.resnet as R

    # conversion reads stage depths from the state_dict keys via STAGES; use
    # the same converter with a temporary stage tuple
    old = R.STAGES
    try:
        R.STAGES = (1, 1, 1, 1)
        params = R.convert_torchvision_resnet152(sd)
    finally:
        R.STAGES = old

    x = np.random.default_rng(4).standard_normal((1, 448, 448, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1).reshape(1, -1, 2048)
    got = np.asarray(resnet.apply(params, jnp.asarray(x), dtype=jnp.float32))
    assert got.shape == (1, 196, 2048)  # the 14x14 grid the models consume
    err = _rel_err(got, want)
    assert err < 1e-4, f"converted trunk diverges from torch at 448: {err:.2e}"


def test_vgg19_conversion_matches_torch_taps():
    torch.manual_seed(0)
    model = _VGG19Features().eval()
    _randomize_state_dict(model, seed=5)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = vgg.convert_torchvision_vgg19(sd)

    x = np.random.default_rng(6).standard_normal((2, 64, 64, 3)).astype(
        np.float32
    )
    with torch.no_grad():
        wants = model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      taps=vgg.DEFAULT_TAPS)
    gots = vgg.apply(params, jnp.asarray(x), dtype=jnp.float32)
    assert len(gots) == len(wants) == 2
    for got, want in zip(gots, wants):
        want = want.numpy().transpose(0, 2, 3, 1)
        err = _rel_err(np.asarray(got), want)
        assert err < 1e-4, f"converted VGG-19 tap diverges from torch: {err:.2e}"
