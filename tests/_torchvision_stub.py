"""Functional pure-torch stand-in for `torchvision`, for driving the ACTUAL
reference source at /root/reference in an image where torchvision is absent.

The reference needs exactly three torchvision entry points on its executed
paths (`exp/gpv/models/backbone.py:93`, `backbone.py:11`,
`detr_roi_head.py:45`):

  - ``torchvision.models.resnet50(replace_stride_with_dilation=...,
    pretrained=..., norm_layer=...)`` — reimplemented below with
    torchvision's exact module graph and state-dict naming (conv1/bn1/
    layer{1..4}.{i}.conv{1..3}/bn{1..3}/downsample.{0,1}); ``pretrained``
    is accepted and ignored (no egress here — parity tests use random
    weights on both sides).
  - ``torchvision.models._utils.IntermediateLayerGetter`` — same contract:
    an nn.ModuleDict over the backbone's named children up to the last
    requested layer, forward returns an OrderedDict of renamed outputs.
  - ``torchvision.ops.roi_align(input, boxes, output_size, aligned=True)``
    — vectorized torch port of the torchvision CPU kernel semantics
    (sampling_ratio=-1 adaptive grid, aligned=True half-pixel offset,
    out-of-range sample zeroing, high-index clamping); validated against
    the element-wise NumPy oracle in tests/test_ops.py.

Plus the import-only surface other reference modules touch
(``torchvision.ops.boxes.box_area``, ``torchvision.ops.misc``).

This module carries real math, so everything here is also covered by its
own parity tests (tests/test_reference_gpv_e2e.py TestStubSelfChecks).
"""
from __future__ import annotations

import math
import sys
import types
from collections import OrderedDict

import torch
import torch.nn as nn


# ---------------------------------------------------------------------------
# ResNet-50 with torchvision's module graph / naming
# ---------------------------------------------------------------------------

def _conv3x3(in_planes, out_planes, stride=1, dilation=1):
    return nn.Conv2d(in_planes, out_planes, kernel_size=3, stride=stride,
                     padding=dilation, dilation=dilation, bias=False)


def _conv1x1(in_planes, out_planes, stride=1):
    return nn.Conv2d(in_planes, out_planes, kernel_size=1, stride=stride,
                     bias=False)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 dilation=1, norm_layer=None):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = norm_layer(planes)
        # torchvision places the stride on conv2 (the "ResNet v1.5" variant)
        self.conv2 = _conv3x3(planes, planes, stride, dilation)
        self.bn2 = norm_layer(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, layers, norm_layer=None,
                 replace_stride_with_dilation=None, num_classes=1000):
        super().__init__()
        norm_layer = norm_layer or nn.BatchNorm2d
        self._norm_layer = norm_layer
        if replace_stride_with_dilation is None:
            replace_stride_with_dilation = [False, False, False]
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, kernel_size=7, stride=2, padding=3,
                               bias=False)
        self.bn1 = norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2,
                                       dilate=replace_stride_with_dilation[0])
        self.layer3 = self._make_layer(256, layers[2], stride=2,
                                       dilate=replace_stride_with_dilation[1])
        self.layer4 = self._make_layer(512, layers[3], stride=2,
                                       dilate=replace_stride_with_dilation[2])
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * Bottleneck.expansion, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")

    def _make_layer(self, planes, blocks, stride=1, dilate=False):
        norm_layer = self._norm_layer
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * Bottleneck.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * Bottleneck.expansion,
                         stride),
                norm_layer(planes * Bottleneck.expansion))
        layers = [Bottleneck(self.inplanes, planes, stride, downsample,
                             previous_dilation, norm_layer)]
        self.inplanes = planes * Bottleneck.expansion
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes,
                                     dilation=self.dilation,
                                     norm_layer=norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet50(pretrained=False, replace_stride_with_dilation=None,
             norm_layer=None, **kwargs):
    """torchvision.models.resnet50 signature; `pretrained` is ignored
    (no egress — both sides of every parity test share random weights)."""
    del pretrained
    return ResNet([3, 4, 6, 3], norm_layer=norm_layer,
                  replace_stride_with_dilation=replace_stride_with_dilation,
                  **kwargs)


class IntermediateLayerGetter(nn.ModuleDict):
    """torchvision.models._utils.IntermediateLayerGetter contract:
    keep the model's named children (in order) up to the last requested
    layer; forward returns OrderedDict{out_name: activation}."""

    def __init__(self, model, return_layers):
        if not set(return_layers).issubset(
                name for name, _ in model.named_children()):
            raise ValueError("return_layers are not present in model")
        orig_return_layers = {str(k): str(v) for k, v in return_layers.items()}
        remaining = dict(orig_return_layers)
        layers = OrderedDict()
        for name, module in model.named_children():
            layers[name] = module
            if name in remaining:
                del remaining[name]
            if not remaining:
                break
        super().__init__(layers)
        self.return_layers = orig_return_layers

    def forward(self, x):
        out = OrderedDict()
        for name, module in self.items():
            x = module(x)
            if name in self.return_layers:
                out[self.return_layers[name]] = x
        return out


# ---------------------------------------------------------------------------
# roi_align (aligned=True, sampling_ratio=-1) — vectorized per box
# ---------------------------------------------------------------------------

def _bilinear_grid(feat, yy, xx):
    """feat (C,H,W), yy (P,), xx (Q,) -> (C,P,Q) bilinear samples with
    torchvision's clamping rules (see tests/test_ops.py _roi_align_ref)."""
    C, H, W = feat.shape
    valid_y = (yy >= -1.0) & (yy <= float(H))
    valid_x = (xx >= -1.0) & (xx <= float(W))
    y = yy.clamp(min=0.0)
    x = xx.clamp(min=0.0)
    y_low = y.long()
    x_low = x.long()
    y_over = y_low >= H - 1
    x_over = x_low >= W - 1
    y_low = torch.where(y_over, torch.full_like(y_low, H - 1), y_low)
    x_low = torch.where(x_over, torch.full_like(x_low, W - 1), x_low)
    y_high = torch.where(y_over, y_low, y_low + 1)
    x_high = torch.where(x_over, x_low, x_low + 1)
    y = torch.where(y_over, y_low.to(y.dtype), y)
    x = torch.where(x_over, x_low.to(x.dtype), x)
    ly = torch.where(valid_y, y - y_low.to(y.dtype), torch.zeros_like(y))
    hy = torch.where(valid_y, 1.0 - (y - y_low.to(y.dtype)),
                     torch.zeros_like(y))
    lx = torch.where(valid_x, x - x_low.to(x.dtype), torch.zeros_like(x))
    hx = torch.where(valid_x, 1.0 - (x - x_low.to(x.dtype)),
                     torch.zeros_like(x))
    f_ll = feat[:, y_low][:, :, x_low]    # (C,P,Q)
    f_lh = feat[:, y_low][:, :, x_high]
    f_hl = feat[:, y_high][:, :, x_low]
    f_hh = feat[:, y_high][:, :, x_high]
    return (hy[:, None] * hx[None, :] * f_ll
            + hy[:, None] * lx[None, :] * f_lh
            + ly[:, None] * hx[None, :] * f_hl
            + ly[:, None] * lx[None, :] * f_hh)


def roi_align(input, boxes, output_size, spatial_scale=1.0,
              sampling_ratio=-1, aligned=False):
    """torchvision.ops.roi_align for the argument subset the reference uses
    (detr_roi_head.py:54: list-of-per-image xyxy boxes, output_size=7,
    aligned=True, default spatial_scale/sampling_ratio)."""
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    ph_n, pw_n = output_size
    if isinstance(boxes, torch.Tensor):
        raise NotImplementedError("stub: pass a list of per-image boxes")
    B, C, H, W = input.shape
    assert len(boxes) == B
    offset = 0.5 if aligned else 0.0
    outs = []
    for b, img_boxes in enumerate(boxes):
        feat = input[b]
        for box in img_boxes:
            x0, y0, x1, y1 = [float(v) * spatial_scale for v in box]
            rsw, rsh = x0 - offset, y0 - offset
            rw, rh = x1 - x0, y1 - y0
            if not aligned:
                rw, rh = max(rw, 1.0), max(rh, 1.0)
            bh, bw = rh / ph_n, rw / pw_n
            if sampling_ratio > 0:
                gh = gw = sampling_ratio
            else:
                gh = max(int(math.ceil(rh / ph_n)), 1)
                gw = max(int(math.ceil(rw / pw_n)), 1)
            # sample coordinates: (pooled*grid,) per axis
            p_idx = torch.arange(ph_n, dtype=input.dtype)
            q_idx = torch.arange(pw_n, dtype=input.dtype)
            iy = torch.arange(gh, dtype=input.dtype)
            ix = torch.arange(gw, dtype=input.dtype)
            yy = (rsh + p_idx[:, None] * bh
                  + (iy[None, :] + 0.5) * bh / gh).reshape(-1)
            xx = (rsw + q_idx[:, None] * bw
                  + (ix[None, :] + 0.5) * bw / gw).reshape(-1)
            samples = _bilinear_grid(feat, yy, xx)  # (C, ph*gh, pw*gw)
            samples = samples.view(C, ph_n, gh, pw_n, gw)
            outs.append(samples.mean(dim=(2, 4)))
    return torch.stack(outs, 0) if outs else input.new_zeros(0, C, ph_n,
                                                             pw_n)


# ---------------------------------------------------------------------------
# sys.modules installation
# ---------------------------------------------------------------------------

def _module(name):
    import importlib.machinery
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules[name] = m
    return m


def box_area(boxes):  # torchvision's one-line formula
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def install():
    """Install (or upgrade in place) the torchvision stub in sys.modules.

    Idempotent; safe to call after an earlier partial stub — attributes are
    overwritten with the functional implementations above.
    """
    tv = _module("torchvision")
    tv.__version__ = "0.8.2"  # skips detr_misc's <0.7 compat imports
    ops = _module("torchvision.ops")
    boxes_mod = _module("torchvision.ops.boxes")
    boxes_mod.box_area = box_area
    misc = _module("torchvision.ops.misc")
    ops.roi_align = roi_align
    ops.boxes, ops.misc = boxes_mod, misc
    models = _module("torchvision.models")
    mutils = _module("torchvision.models._utils")
    mutils.IntermediateLayerGetter = IntermediateLayerGetter
    models._utils = mutils
    models.resnet50 = resnet50
    tv.ops, tv.models = ops, models
    return tv
