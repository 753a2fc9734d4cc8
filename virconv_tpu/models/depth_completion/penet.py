"""PENet depth completion (ENet backbone + two-scale DA-CSPN++) in flax.

Parity target ``/root/reference/tools/PENet/model.py`` (ENet ``:3-233``,
PENet_C2 ``:382-524``) and ``basic.py`` (BasicBlockGeo, SparseDownSampleClose,
CSPN ops ``:155-310``). Layout is NHWC. Differences by design:

  * The "CSPNAccelerate" im2col + kernel_trans machinery (a GPU trick to
    express the propagation as unfold/einsum) is replaced by a direct
    shifted-sum: one weighted sum over the K^2 static spatial shifts — XLA
    fuses this into a handful of elementwise ops, no im2col buffers.
  * Guide normalization matches the reference: non-center weights are
    divided by the abs-sum, the center weight is 1 - sum(weights).

Input conventions (reference ``dataloaders/kitti_loader.py``): crop 352x1216,
``rgb`` in [0, 1]x255 scale, sparse depth ``d`` in meters, ``position`` =
normalized (u, v) in [-1, 1], intrinsics K.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvBnRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        # explicit torch-style symmetric padding: for stride 2, flax 'SAME'
        # pads (0, 1) while torch Conv2d(padding=(k-1)//2) pads (p, p) —
        # one-pixel misalignment that breaks weight parity
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    use_bias=not self.use_bn)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x) if self.use_relu else x


class DeconvBnRelu(nn.Module):
    """ConvTranspose + BN + ReLU matching torch ``deconvbnrelu``
    (``tools/PENet/basic.py:65-70``, k=5 s=2 p=2 op=1 by default). flax
    ConvTranspose with a flipped kernel equals torch ConvTranspose2d when
    padded (k-1-p, k-1-p+op) — verified exact; 'SAME' is one pixel off for
    the overlapping k=5 s=2 case."""

    features: int
    kernel: int = 5
    stride: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        p = (self.kernel - 1) // 2           # torch padding
        op = self.stride - 1                 # torch output_padding
        pad = (self.kernel - 1 - p, self.kernel - 1 - p + op)
        x = nn.ConvTranspose(self.features, (self.kernel, self.kernel),
                             strides=(self.stride, self.stride),
                             padding=(pad, pad), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x)


class BasicBlockGeo(nn.Module):
    """ResNet basic block with geometry features concatenated before each
    conv (basic.py BasicBlockGeo)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, g1, g2, train: bool):
        inp = x if g1 is None else jnp.concatenate([x, g1], -1)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False,
                      name='conv1')(inp)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name='bn1')(out)
        out = nn.relu(out)
        # asymmetric concat orders are the reference's: conv1 input is
        # cat(x, g1) but conv2 input is cat(g2, out) (basic.py:311,316)
        out2_in = out if g2 is None else jnp.concatenate([g2, out], -1)
        out = nn.Conv(self.planes, (3, 3), padding='SAME', use_bias=False,
                      name='conv2')(out2_in)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name='bn2')(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name='down_conv')(inp)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    name='down_bn')(identity)
        else:
            identity = x
        return nn.relu(out + identity)


def sparse_downsample_close(d, mask, stride=2):
    """Min-pool of valid depths (keep-nearest downsample)."""
    large = 600.0
    enc = -(1 - mask) * large - d
    enc = -nn.max_pool(enc, (stride, stride), strides=(stride, stride))
    new_mask = nn.max_pool(mask, (stride, stride), strides=(stride, stride))
    return enc - (1 - new_mask) * large, new_mask


def geometry_feature(z, vnorm, unorm, h, w, ch, cw, fh, fw):
    x = z * (0.5 * h * (vnorm + 1) - ch) / fh
    y = z * (0.5 * w * (unorm + 1) - cw) / fw
    return jnp.concatenate([x, y, z], -1)


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ENet(nn.Module):
    """Dual-branch (RGB + depth) encoder-decoder with geometry encoding.

    ``crop_h/crop_w`` are the KITTI train-crop constants the reference
    hardcodes into the geometry features regardless of actual input size
    (``model.py:122-128``) — kept for weight parity."""

    crop_h: int = 352
    crop_w: int = 1216

    @nn.compact
    def __call__(self, rgb, d, position, k_mat, train: bool):
        h, w = self.crop_h, self.crop_w
        unorm = position[..., 0:1]
        vnorm = position[..., 1:2]
        fh = k_mat[:, None, None, 1:2, 1]
        ch = k_mat[:, None, None, 1:2, 2]
        fw = k_mat[:, None, None, 0:1, 0]
        cw = k_mat[:, None, None, 0:1, 2]

        vs = [vnorm]
        us = [unorm]
        for _ in range(5):
            vs.append(avg_pool2(vs[-1]))
            us.append(avg_pool2(us[-1]))
        valid = (d > 0).astype(d.dtype)
        ds = [d]
        ms = [valid]
        for _ in range(5):
            nd, nm = sparse_downsample_close(ds[-1], ms[-1])
            ds.append(nd)
            ms.append(nm)
        geos = [geometry_feature(ds[i], vs[i], us[i], h / 2 ** i, w / 2 ** i,
                                 ch, cw, fh, fw) for i in range(6)]

        # ---- rgb branch (encoder layers i: odd = stride-2 down) ----
        rf = ConvBnRelu(32, 5, name='rgb_init')(
            jnp.concatenate([rgb, d], -1), train)
        r1 = BasicBlockGeo(64, 2, name='rgb_enc1')(rf, geos[0], geos[1],
                                                   train)
        r2 = BasicBlockGeo(64, 1, name='rgb_enc2')(r1, geos[1], geos[1],
                                                   train)
        r3 = BasicBlockGeo(128, 2, name='rgb_enc3')(r2, geos[1], geos[2],
                                                    train)
        r4 = BasicBlockGeo(128, 1, name='rgb_enc4')(r3, geos[2], geos[2],
                                                    train)
        r5 = BasicBlockGeo(256, 2, name='rgb_enc5')(r4, geos[2], geos[3],
                                                    train)
        r6 = BasicBlockGeo(256, 1, name='rgb_enc6')(r5, geos[3], geos[3],
                                                    train)
        r7 = BasicBlockGeo(512, 2, name='rgb_enc7')(r6, geos[3], geos[4],
                                                    train)
        r8 = BasicBlockGeo(512, 1, name='rgb_enc8')(r7, geos[4], geos[4],
                                                    train)
        r9 = BasicBlockGeo(1024, 2, name='rgb_enc9')(r8, geos[4], geos[5],
                                                     train)
        r10 = BasicBlockGeo(1024, 1, name='rgb_enc10')(r9, geos[5], geos[5],
                                                       train)

        r8_plus = DeconvBnRelu(512, name='rgb_dec8')(r10, train) + r8
        r6_plus = DeconvBnRelu(256, name='rgb_dec6')(r8_plus, train) + r6
        r4_plus = DeconvBnRelu(128, name='rgb_dec4')(r6_plus, train) + r4
        r2_plus = DeconvBnRelu(64, name='rgb_dec2')(r4_plus, train) + r2
        r0_plus = DeconvBnRelu(32, name='rgb_dec0')(r2_plus, train) + rf
        rgb_out = DeconvBnRelu(2, 3, 1, name='rgb_out')(r0_plus, train)
        rgb_depth = rgb_out[..., 0:1]
        rgb_conf = rgb_out[..., 1:2]

        # ---- depth branch (fused with rgb decoder skip features) ----
        sf = ConvBnRelu(32, 5, name='d_init')(
            jnp.concatenate([d, rgb_depth], -1), train)
        d1 = BasicBlockGeo(64, 2, name='d_enc1')(sf, geos[0], geos[1], train)
        d2 = BasicBlockGeo(64, 1, name='d_enc2')(d1, geos[1], geos[1], train)
        d3 = BasicBlockGeo(128, 2, name='d_enc3')(
            jnp.concatenate([r2_plus, d2], -1), geos[1], geos[2], train)
        d4 = BasicBlockGeo(128, 1, name='d_enc4')(d3, geos[2], geos[2], train)
        d5 = BasicBlockGeo(256, 2, name='d_enc5')(
            jnp.concatenate([r4_plus, d4], -1), geos[2], geos[3], train)
        d6 = BasicBlockGeo(256, 1, name='d_enc6')(d5, geos[3], geos[3], train)
        d7 = BasicBlockGeo(512, 2, name='d_enc7')(
            jnp.concatenate([r6_plus, d6], -1), geos[3], geos[4], train)
        d8 = BasicBlockGeo(512, 1, name='d_enc8')(d7, geos[4], geos[4], train)
        d9 = BasicBlockGeo(1024, 2, name='d_enc9')(
            jnp.concatenate([r8_plus, d8], -1), geos[4], geos[5], train)
        d10 = BasicBlockGeo(1024, 1, name='d_enc10')(d9, geos[5], geos[5],
                                                     train)

        dd1 = DeconvBnRelu(512, name='dec1')(r10 + d10, train)
        dd2 = DeconvBnRelu(256, name='dec2')(d8 + dd1, train)
        dd3 = DeconvBnRelu(128, name='dec3')(d6 + dd2, train)
        dd4 = DeconvBnRelu(64, name='dec4')(d4 + dd3, train)
        dd5 = DeconvBnRelu(32, name='dec5')(d2 + dd4, train)
        d_out = ConvBnRelu(2, 3, name='dec6')(dd5, train)
        d_depth = d_out[..., 0:1]
        d_conf = d_out[..., 1:2]

        conf = jax.nn.softmax(jnp.concatenate([rgb_conf, d_conf], -1), -1)
        output = conf[..., 0:1] * rgb_depth + conf[..., 1:2] * d_depth

        feature_s1 = jnp.concatenate([r0_plus, dd5], -1)   # 64ch, full res
        feature_s2 = jnp.concatenate([r2_plus, dd4], -1)   # 128ch, 1/2 res
        return feature_s1, feature_s2, output


def _shift2d(x, dy, dx):
    """Shift (B, H, W, C) by (dy, dx), zero-filling borders."""
    return jnp.roll(x, (dy, dx), axis=(1, 2)) * _border_mask(x, dy, dx)


def _border_mask(x, dy, dx):
    h, w = x.shape[1], x.shape[2]
    row = jnp.arange(h)[None, :, None, None]
    col = jnp.arange(w)[None, None, :, None]
    ok = jnp.ones((1, h, w, 1), x.dtype)
    if dy > 0:
        ok = ok * (row >= dy)
    elif dy < 0:
        ok = ok * (row < h + dy)
    if dx > 0:
        ok = ok * (col >= dx)
    elif dx < 0:
        ok = ok * (col < w + dx)
    return ok


class CSPNGuide(nn.Module):
    """Generate normalized K^2 propagation weights (CSPNGenerateAccelerate)."""

    kernel_size: int

    @nn.compact
    def __call__(self, feature, train: bool):
        k2 = self.kernel_size ** 2
        guide = ConvBnRelu(k2 - 1, 3, use_relu=False,
                           name='generate')(feature, train)
        gsum = jnp.sum(jnp.abs(guide), -1, keepdims=True)
        guide = guide / jnp.where(gsum == 0, 1.0, gsum)
        mid = 1.0 - jnp.sum(guide, -1, keepdims=True)
        half = (k2 - 1) // 2
        return jnp.concatenate([guide[..., :half], mid, guide[..., half:]],
                               -1)


def cspn_step(guide, hn, h0, kernel_size, dilation=1):
    """One propagation step with guides evaluated AT the source neighbor:

        h'(p) = sum_t g_t(p + o_t) * h(p + o_t)     (center tap: h0(p))

    matching the reference ``kernel_trans`` + ``CSPNAccelerate`` pipeline
    (``tools/PENet/model.py:242-245,489-495`` + ``basic.py:247-268``): the
    one-hot encoderK conv shifts guide channel t by -o_t and reverses the
    channel order, so the im2col einsum pairs g_t(p+o_t) with the tap at
    p+o_t. Here each term is the (guide ⊙ src) product shifted by +o_t as
    one unit (zero-filled borders == the reference's zero padding).
    """
    k = kernel_size
    half = k // 2
    out = 0.0
    t = 0
    for dy in range(-half, half + 1):
        for dx in range(-half, half + 1):
            src = h0 if (dy == 0 and dx == 0) else hn
            out = out + _shift2d(guide[..., t:t + 1] * src,
                                 dy * dilation, dx * dilation)
            t += 1
    return out


class PENetC2(nn.Module):
    """Full PENet: ENet backbone + two-scale DA-CSPN++ refinement."""

    iters: int = 6

    @nn.compact
    def __call__(self, rgb, d, position, k_mat, train: bool = False):
        valid = (d > 0).astype(d.dtype)
        f_s1, f_s2, coarse = ENet(name='backbone')(rgb, d, position, k_mat,
                                                   train)
        depth = coarse

        d_s2, vm_s2 = sparse_downsample_close(d, valid)
        mask_s2 = jax.nn.sigmoid(ConvBnRelu(1, 3, use_relu=False,
                                            name='mask_s2')(f_s2, train))
        mask_s2 = mask_s2 * vm_s2
        kconf_s2 = jax.nn.softmax(ConvBnRelu(3, 3, use_relu=False,
                                             name='kconf_s2')(f_s2, train))

        def nn_up(x):
            return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

        guide3_s2 = CSPNGuide(3, name='guide3_s2')(f_s2, train)
        guide5_s2 = CSPNGuide(5, name='guide5_s2')(f_s2, train)
        guide7_s2 = CSPNGuide(7, name='guide7_s2')(f_s2, train)
        guide3_s2, guide5_s2, guide7_s2 = map(nn_up, (guide3_s2, guide5_s2,
                                                      guide7_s2))
        depth_s2_up = nn_up(d_s2)
        mask_s2_up = nn_up(mask_s2)
        kc3_s2, kc5_s2, kc7_s2 = (nn_up(kconf_s2[..., i:i + 1])
                                  for i in range(3))

        mask = jax.nn.sigmoid(ConvBnRelu(1, 3, use_relu=False,
                                         name='mask')(f_s1, train)) * valid
        kconf = jax.nn.softmax(ConvBnRelu(3, 3, use_relu=False,
                                          name='kconf')(f_s1, train))
        guide3 = CSPNGuide(3, name='guide3')(f_s1, train)
        guide5 = CSPNGuide(5, name='guide5')(f_s1, train)
        guide7 = CSPNGuide(7, name='guide7')(f_s1, train)

        d3 = d5 = d7 = depth
        for _ in range(self.iters):
            d3 = cspn_step(guide3_s2, d3, coarse, 3, dilation=2)
            d3 = mask_s2_up * depth_s2_up + (1 - mask_s2_up) * d3
            d5 = cspn_step(guide5_s2, d5, coarse, 5, dilation=2)
            d5 = mask_s2_up * depth_s2_up + (1 - mask_s2_up) * d5
            d7 = cspn_step(guide7_s2, d7, coarse, 7, dilation=2)
            d7 = mask_s2_up * depth_s2_up + (1 - mask_s2_up) * d7
        depth_s2 = kc3_s2 * d3 + kc5_s2 * d5 + kc7_s2 * d7

        d3 = d5 = d7 = depth_s2
        for _ in range(self.iters):
            d3 = cspn_step(guide3, d3, depth_s2, 3)
            d3 = mask * d + (1 - mask) * d3
            d5 = cspn_step(guide5, d5, depth_s2, 5)
            d5 = mask * d + (1 - mask) * d5
            d7 = cspn_step(guide7, d7, depth_s2, 7)
            d7 = mask * d + (1 - mask) * d7
        refined = (kconf[..., 0:1] * d3 + kconf[..., 1:2] * d5
                   + kconf[..., 2:3] * d7)
        return refined
