"""NASNet-A-Mobile reid backbone (torchreid nasnet.py) in Flax.

The last member of the reference's StrongSORT backbone zoo
(plugins/track/strong_sort/deep/models/nasnet.py:52-1131): stem cells +
4x(First/Normal) blocks with two reduction cells, built from separable
branches with NASNet's shifted zero-pad/crop pooling quirks
(ZeroPad2d((1,0,1,0)) then [1:,1:] crops — reproduced exactly).

Flax names mirror the torch keys with 'q' spelling literal
underscore-digit boundaries (``cellq0`` -> ``cell_0``), restored by
models/convert.py:_inception_torch_key; activation parity vs the
vendored source in tests/test_weight_parity.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ReidNASNetAMobile"]


def _bn(x, name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-3, dtype=jnp.float32, name=name)(x)


def _pad_crop_tl(x):
    """ZeroPad2d((1,0,1,0)) then [:, :, 1:, 1:]: net effect shifts the
    window grid by dropping the first row/col AFTER padding top-left —
    i.e. identity on content, but pooling afterwards sees the original
    tensor shifted; reproduce literally."""
    x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return x[:, 1:, 1:, :]


def _maxpool_pad(x):
    """MaxPoolPad (nasnet.py:52-64): pad TL, pool 3/2/p1, crop TL."""
    y = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)),
                constant_values=-jnp.inf)
    y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
    return y[:, 1:, 1:, :]


def _avgpool_pad(x):
    """AvgPoolPad: pad TL (zeros EXCLUDED from the mean:
    count_include_pad=False counts only in-bounds of the padded tensor,
    and the explicit TL zeros are in-bounds -> they DO count? No:
    count_include_pad=False excludes only the pool's OWN padding; the
    explicit ZeroPad2d zeros are ordinary values and participate).
    Reproduce: explicit TL zero-pad, avg_pool excluding its own pad,
    crop TL."""
    y = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    y = nn.avg_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                    count_include_pad=False)
    return y[:, 1:, 1:, :]


def _avgp31(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2,
                       count_include_pad=False)


def _maxp321(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)


def _avgp321(x):
    return nn.avg_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                       count_include_pad=False)


class _SepConv(nn.Module):
    """SeparableConv2d: depthwise_conv2d + pointwise_conv2d."""
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (self.kernel, self.kernel), strides=self.stride,
                    padding=[(self.pad, self.pad)] * 2,
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype, name="depthwise_conv2d")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise_conv2d")(x)


class _BranchSep(nn.Module):
    """BranchSeparables (nasnet.py:113-155): relu -> sep(k, s) -> bn ->
    relu -> sep(k, 1) -> bn; mode 'specific' pads/crops around the first
    separable, 'reduction' pads/crops with the pool-pad trick, 'stem'
    lets the first separable change channels."""
    features: int
    kernel: int
    stride: int = 1
    mode: str = ""            # "", "specific", "reduction", "stem"
    in_features: int = 0      # stem: first sep outputs `features`
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        p = self.kernel // 2
        x = nn.relu(x)
        crop = self.mode in ("specific", "reduction")
        if crop:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        mid = self.features if self.mode == "stem" else x.shape[-1]
        x = _SepConv(mid, self.kernel, self.stride, p,
                     dtype=self.dtype, name="separableq1")(x)
        if crop:
            x = x[:, 1:, 1:, :]
        x = _bn(x, "bn_sepq1", train)
        x = nn.relu(x)
        x = _SepConv(self.features, self.kernel, 1, p,
                     dtype=self.dtype, name="separableq2")(x)
        return _bn(x, "bn_sepq2", train)


class _ReluConvBn(nn.Module):
    """the conv_1x1 Sequential: relu -> 1x1 conv -> bn."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        return _bn(x, "bn", train)


class _ShiftedPaths(nn.Module):
    """path_1 / path_2 + final_path_bn (the stride-2 1x1 shortcut pair
    used by CellStem1/FirstCell)."""
    half: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_relu, train=False):
        p1 = nn.avg_pool(x_relu, (1, 1), strides=(2, 2))
        p1 = nn.Conv(self.half, (1, 1), use_bias=False,
                     dtype=self.dtype, name="pathq1__conv")(p1)
        # path_2: ZeroPad2d((0,1,0,1)) then [:, :, 1:, 1:] = drop first
        # row/col, pad bottom-right
        p2 = jnp.pad(x_relu, ((0, 0), (0, 1), (0, 1), (0, 0)))
        p2 = p2[:, 1:, 1:, :]
        p2 = nn.avg_pool(p2, (1, 1), strides=(2, 2))
        p2 = nn.Conv(self.half, (1, 1), use_bias=False,
                     dtype=self.dtype, name="pathq2__conv")(p2)
        return _bn(jnp.concatenate([p1, p2], -1), "final_path_bn",
                   train)


class ReidNASNetAMobile(nn.Module):
    """nasnetamobile; eval-mode forward returns the pooled feature
    (24 * penultimate_filters/24 dims = 1056 at defaults)."""
    stem_filters: int = 32
    penultimate_filters: int = 1056
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        f = self.penultimate_filters // 24

        def B(feats, k, s=1, mode="", name=""):
            return _BranchSep(feats, k, s, mode, dtype=dt, name=name)

        x = nn.Conv(self.stem_filters, (3, 3), strides=2,
                    padding="VALID", use_bias=False, dtype=dt,
                    name="conv0__conv")(x)
        x_conv0 = _bn(x, "conv0__bn", train)

        # ---- CellStem0 ----
        nf0 = f // 4
        n = "cell_stemq0"
        x1 = _ReluConvBn(nf0, dtype=dt, name=f"{n}__convq1x1")(
            x_conv0, train)
        c0 = B(nf0, 5, 2, name=f"{n}__comb_iter_0_left")(x1, train) \
            + B(nf0, 7, 2, mode="stem",
                name=f"{n}__comb_iter_0_right")(x_conv0, train)
        c1 = _maxp321(x1) + B(nf0, 7, 2, mode="stem",
                              name=f"{n}__comb_iter_1_right")(
            x_conv0, train)
        c2 = _avgp321(x1) + B(nf0, 5, 2, mode="stem",
                              name=f"{n}__comb_iter_2_right")(
            x_conv0, train)
        c3 = _avgp31(c0) + c1
        c4 = B(nf0, 3, 1, name=f"{n}__comb_iter_4_left")(c0, train) \
            + _maxp321(x1)
        x_stem_0 = jnp.concatenate([c1, c2, c3, c4], -1)

        # ---- CellStem1 ----
        nf1 = f // 2
        n = "cell_stemq1"
        x_left = _ReluConvBn(nf1, dtype=dt, name=f"{n}__convq1x1")(
            x_stem_0, train)
        x_right = _ShiftedPaths(nf1 // 2, dtype=dt, name=n)(
            nn.relu(x_conv0), train)
        c0 = B(nf1, 5, 2, "specific",
               name=f"{n}__comb_iter_0_left")(x_left, train) \
            + B(nf1, 7, 2, "specific",
                name=f"{n}__comb_iter_0_right")(x_right, train)
        c1 = _maxpool_pad(x_left) \
            + B(nf1, 7, 2, "specific",
                name=f"{n}__comb_iter_1_right")(x_right, train)
        c2 = _avgpool_pad(x_left) \
            + B(nf1, 5, 2, "specific",
                name=f"{n}__comb_iter_2_right")(x_right, train)
        c3 = _avgp31(c0) + c1
        c4 = B(nf1, 3, 1, "specific",
               name=f"{n}__comb_iter_4_left")(c0, train) \
            + _maxpool_pad(x_left)
        x_stem_1 = jnp.concatenate([c1, c2, c3, c4], -1)

        def first_cell(x, x_prev, out_l, out_r, name):
            x_right = _ReluConvBn(out_r, dtype=dt,
                                  name=f"{name}__convq1x1")(x, train)
            x_left = _ShiftedPaths(out_l, dtype=dt, name=name)(
                nn.relu(x_prev), train)
            c0 = B(out_r, 5, name=f"{name}__comb_iter_0_left")(
                x_right, train) \
                + B(out_r, 3, name=f"{name}__comb_iter_0_right")(
                    x_left, train)
            c1 = B(out_r, 5, name=f"{name}__comb_iter_1_left")(
                x_left, train) \
                + B(out_r, 3, name=f"{name}__comb_iter_1_right")(
                    x_left, train)
            c2 = _avgp31(x_right) + x_left
            c3 = _avgp31(x_left) + _avgp31(x_left)
            c4 = B(out_r, 3, name=f"{name}__comb_iter_4_left")(
                x_right, train) + x_right
            return jnp.concatenate([x_left, c0, c1, c2, c3, c4], -1)

        def normal_cell(x, x_prev, out_l, out_r, name):
            x_left = _ReluConvBn(out_l, dtype=dt,
                                 name=f"{name}__conv_prevq1x1")(
                x_prev, train)
            x_right = _ReluConvBn(out_r, dtype=dt,
                                  name=f"{name}__convq1x1")(x, train)
            c0 = B(out_r, 5, name=f"{name}__comb_iter_0_left")(
                x_right, train) \
                + B(out_l, 3, name=f"{name}__comb_iter_0_right")(
                    x_left, train)
            c1 = B(out_l, 5, name=f"{name}__comb_iter_1_left")(
                x_left, train) \
                + B(out_l, 3, name=f"{name}__comb_iter_1_right")(
                    x_left, train)
            c2 = _avgp31(x_right) + x_left
            c3 = _avgp31(x_left) + _avgp31(x_left)
            c4 = B(out_r, 3, name=f"{name}__comb_iter_4_left")(
                x_right, train) + x_right
            return jnp.concatenate([x_left, c0, c1, c2, c3, c4], -1)

        def reduction_cell(x, x_prev, out, name, specific):
            mode = "specific" if specific else "reduction"
            x_left = _ReluConvBn(out, dtype=dt,
                                 name=f"{name}__conv_prevq1x1")(
                x_prev, train)
            x_right = _ReluConvBn(out, dtype=dt,
                                  name=f"{name}__convq1x1")(x, train)
            # ReductionCell0 applies the branches to (right, left) in
            # the SAME pattern as CellStem1 applies to (left, right)
            a, b = x_right, x_left
            c0 = B(out, 5, 2, mode,
                   name=f"{name}__comb_iter_0_left")(a, train) \
                + B(out, 7, 2, mode,
                    name=f"{name}__comb_iter_0_right")(b, train)
            c1 = _maxpool_pad(a) \
                + B(out, 7, 2, mode,
                    name=f"{name}__comb_iter_1_right")(b, train)
            c2 = _avgpool_pad(a) \
                + B(out, 5, 2, mode,
                    name=f"{name}__comb_iter_2_right")(b, train)
            c3 = _avgp31(c0) + c1
            c4 = B(out, 3, 1, mode,
                   name=f"{name}__comb_iter_4_left")(c0, train) \
                + _maxpool_pad(a)
            return jnp.concatenate([c1, c2, c3, c4], -1)

        x_cell_0 = first_cell(x_stem_1, x_stem_0, f // 2, f, "cellq0")
        x_cell_1 = normal_cell(x_cell_0, x_stem_1, f, f, "cellq1")
        x_cell_2 = normal_cell(x_cell_1, x_cell_0, f, f, "cellq2")
        x_cell_3 = normal_cell(x_cell_2, x_cell_1, f, f, "cellq3")
        x_red_0 = reduction_cell(x_cell_3, x_cell_2, 2 * f,
                                 "reduction_cellq0", specific=False)
        x_cell_6 = first_cell(x_red_0, x_cell_3, f, 2 * f, "cellq6")
        x_cell_7 = normal_cell(x_cell_6, x_red_0, 2 * f, 2 * f,
                               "cellq7")
        x_cell_8 = normal_cell(x_cell_7, x_cell_6, 2 * f, 2 * f,
                               "cellq8")
        x_cell_9 = normal_cell(x_cell_8, x_cell_7, 2 * f, 2 * f,
                               "cellq9")
        x_red_1 = reduction_cell(x_cell_9, x_cell_8, 4 * f,
                                 "reduction_cellq1", specific=True)
        x_cell_12 = first_cell(x_red_1, x_cell_9, 2 * f, 4 * f,
                               "cellq12")
        x_cell_13 = normal_cell(x_cell_12, x_red_1, 4 * f, 4 * f,
                                "cellq13")
        x_cell_14 = normal_cell(x_cell_13, x_cell_12, 4 * f, 4 * f,
                                "cellq14")
        x_cell_15 = normal_cell(x_cell_14, x_cell_13, 4 * f, 4 * f,
                                "cellq15")
        return jnp.mean(nn.relu(x_cell_15), axis=(1, 2))
