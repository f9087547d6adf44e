"""DeepLabV3-ResNet101 weight-conversion parity (VERDICT r3 item 6).

The reference's TVCalib pitch segmentation runs torchvision's
``deeplabv3_resnet101`` from a SoccerNet-trained checkpoint
(reference plugins/calibration/tvcalib/inference.py:83-94). torchvision
is not installed in this container, so the oracle below replicates its
module structure and state-dict naming independently (resnet.py
_make_layer dilation semantics, segmentation.deeplabv3 ASPP/heads),
randomizes all parameters + BN buffers, converts, and compares logits.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

from tests.test_weight_parity import _randomize_module, _state_dict_np


def _build_torch_deeplabv3(num_classes, layers):
    """torchvision deeplabv3_resnet101 architecture + state-dict names."""

    class Bottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     dilation=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=dilation, dilation=dilation,
                                   bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            if self.downsample is not None:
                idt = self.downsample(x)
            return self.relu(y + idt)

    class ResNetDilated(nn.Module):
        def __init__(self, layers):
            super().__init__()
            self.inplanes, self.dilation = 64, 1
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0])
            self.layer2 = self._make_layer(128, layers[1], stride=2)
            self.layer3 = self._make_layer(256, layers[2], stride=2,
                                           dilate=True)
            self.layer4 = self._make_layer(512, layers[3], stride=2,
                                           dilate=True)

        def _make_layer(self, planes, blocks, stride=1, dilate=False):
            downsample = None
            previous_dilation = self.dilation
            if dilate:
                self.dilation *= stride
                stride = 1
            if stride != 1 or self.inplanes != planes * 4:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes * 4, 1, stride,
                              bias=False),
                    nn.BatchNorm2d(planes * 4))
            mods = [Bottleneck(self.inplanes, planes, stride,
                               downsample, previous_dilation)]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                mods.append(Bottleneck(self.inplanes, planes,
                                       dilation=self.dilation))
            return nn.Sequential(*mods)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer2(self.layer1(x))
            aux = self.layer3(x)
            return self.layer4(aux), aux

    class ASPPPooling(nn.Sequential):
        def __init__(self, in_ch, out_ch):
            super().__init__(nn.AdaptiveAvgPool2d(1),
                             nn.Conv2d(in_ch, out_ch, 1, bias=False),
                             nn.BatchNorm2d(out_ch), nn.ReLU())

        def forward(self, x):
            size = x.shape[-2:]
            for mod in self:
                x = mod(x)
            return F.interpolate(x, size=size, mode="bilinear",
                                 align_corners=False)

    class ASPP(nn.Module):
        def __init__(self, in_ch, rates, out_ch=256):
            super().__init__()
            mods = [nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, bias=False),
                nn.BatchNorm2d(out_ch), nn.ReLU())]
            for r in rates:
                mods.append(nn.Sequential(
                    nn.Conv2d(in_ch, out_ch, 3, padding=r, dilation=r,
                              bias=False),
                    nn.BatchNorm2d(out_ch), nn.ReLU()))
            mods.append(ASPPPooling(in_ch, out_ch))
            self.convs = nn.ModuleList(mods)
            self.project = nn.Sequential(
                nn.Conv2d(len(mods) * out_ch, out_ch, 1, bias=False),
                nn.BatchNorm2d(out_ch), nn.ReLU(), nn.Dropout(0.5))

        def forward(self, x):
            return self.project(
                torch.cat([m(x) for m in self.convs], dim=1))

    class DeepLabHead(nn.Sequential):
        def __init__(self, in_ch, num_classes):
            super().__init__(
                ASPP(in_ch, [12, 24, 36]),
                nn.Conv2d(256, 256, 3, padding=1, bias=False),
                nn.BatchNorm2d(256), nn.ReLU(),
                nn.Conv2d(256, num_classes, 1))

    class FCNHead(nn.Sequential):
        def __init__(self, in_ch, num_classes):
            inter = in_ch // 4
            super().__init__(
                nn.Conv2d(in_ch, inter, 3, padding=1, bias=False),
                nn.BatchNorm2d(inter), nn.ReLU(), nn.Dropout(0.1),
                nn.Conv2d(inter, num_classes, 1))

    class TorchDeepLabV3(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = ResNetDilated(layers)
            self.classifier = DeepLabHead(2048, num_classes)
            self.aux_classifier = FCNHead(1024, num_classes)

        def forward(self, x):
            size = x.shape[-2:]
            out, aux = self.backbone(x)

            def up(y):
                return F.interpolate(y, size=size, mode="bilinear",
                                     align_corners=False)
            return {"out": up(self.classifier(out)),
                    "aux": up(self.aux_classifier(aux))}

    return TorchDeepLabV3()


@pytest.mark.parametrize("layers,hw", [
    ((2, 2, 2, 2), (65, 97)),   # odd sizes stress explicit padding
    ((3, 4, 23, 3), (64, 96)),  # the real resnet101 depth
])
def test_deeplabv3_activation_parity(layers, hw):
    import jax.numpy as jnp
    from tracklab_tpu.models.convert import convert_deeplabv3_torch
    from tracklab_tpu.models.deeplabv3 import DeepLabV3

    tm = _build_torch_deeplabv3(num_classes=7, layers=layers)
    tm.eval()
    _randomize_module(tm, seed=11 + layers[2])

    H, W = hw
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    fm = DeepLabV3(num_classes=7, layers=layers)
    variables = convert_deeplabv3_torch(_state_dict_np(tm), fm,
                                        (1, H, W, 3))
    got = fm.apply(variables, jnp.asarray(x), train=False)
    for key in ("out", "aux"):
        w = want[key].numpy().transpose(0, 2, 3, 1)
        g = np.asarray(got[key])
        assert w.shape == g.shape
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-3,
                                   err_msg=key)


def test_deeplabv3_manifest_family():
    from tracklab_tpu.models.manifest import (
        expected_torch_keys, family_for_checkpoint,
    )
    assert family_for_checkpoint("train_59.pt") == "deeplabv3_pitch"
    assert family_for_checkpoint("pitch_seg_deeplabv3.pth") \
        == "deeplabv3_pitch"
    keys = expected_torch_keys("deeplabv3_pitch")
    assert "backbone.layer3.22.conv2.weight" in keys
    assert "classifier.0.convs.4.1.weight" in keys
    assert "classifier.0.project.1.running_mean" in keys
    assert "aux_classifier.4.bias" in keys
    # the real torch model produces exactly these tensors
    tm = _build_torch_deeplabv3(num_classes=29, layers=(3, 4, 23, 3))
    torch_keys = {k for k in tm.state_dict()
                  if not k.endswith("num_batches_tracked")}
    assert torch_keys == set(keys)


def test_deeplabv3_segment_lut():
    from tracklab_tpu.calibration.pitch import pitch_segments
    from tracklab_tpu.models.deeplabv3 import (
        PITCH_LINES_CLASSES, segment_class_lut,
    )
    names = list(pitch_segments())
    lut = np.asarray(segment_class_lut(names))
    assert lut.shape == (29,)
    assert lut[0] == 0  # background
    # every pitch-template segment is reachable from exactly one class
    mapped = lut[lut > 0]
    assert sorted(mapped) == list(range(1, len(names) + 1))
    # spot checks against the checkpoint class order
    assert lut[1 + PITCH_LINES_CLASSES.index("Circle central")] \
        == 1 + names.index("center_circle")
    assert lut[1 + PITCH_LINES_CLASSES.index("Side line left")] \
        == 1 + names.index("goal_line_left")
    # goal-frame classes drop to background
    assert lut[1 + PITCH_LINES_CLASSES.index("Goal left crossbar")] == 0
