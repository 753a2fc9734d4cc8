"""BEV modules: height compression and the 2D conv pyramid.

Parity targets: ``/root/reference/pcdet/models/backbones_2d/map_to_bev/
height_compression.py`` (sparse->dense, fold depth into channels) and
``base_bev_backbone.py`` (two conv stages stride 1/2 with deconv upsample and
concat). Layout is NHWC throughout (TPU-preferred); the reference's NCHW
(B, C*D, H, W) view becomes (B, H, W, D*C).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ...ops import sparse as sp
from ..layers import DenseConvBlock


def height_compression(st: sp.SparseTensor) -> jnp.ndarray:
    """Sparse (B, D, H, W, C) -> dense BEV (B, H, W, D*C)."""
    dense = sp.to_dense(st)                       # (B, D, H, W, C)
    b, d, h, w, c = dense.shape
    return dense.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)


class BaseBEVBackbone(nn.Module):
    """Two-level conv pyramid with upsample-concat -> ``st_features_2d``."""

    layer_nums: Tuple[int, ...] = (4, 4)
    layer_strides: Tuple[int, ...] = (1, 2)
    num_filters: Tuple[int, ...] = (64, 128)
    upsample_strides: Tuple[int, ...] = (1, 2)
    num_upsample_filters: Tuple[int, ...] = (128, 128)

    @nn.compact
    def __call__(self, x, train: bool):
        # remat each conv block: the BEV pyramid's saved activations
        # ((B, 200, 176, 64-256) per layer x 10 layers) were ~1.5 GB of the
        # train step's HBM; recomputing dense 3x3 convs in the backward is
        # cheap next to that (static_argnums: 0=self, 2=train)
        Block = nn.remat(DenseConvBlock, static_argnums=(2,))
        ups = []
        for i, n_layers in enumerate(self.layer_nums):
            x = Block(self.num_filters[i],
                      stride=(self.layer_strides[i],) * 2,
                      name=f'block{i}_down')(x, train)
            for k in range(n_layers):
                x = Block(self.num_filters[i],
                          name=f'block{i}_conv{k}')(x, train)
            s = self.upsample_strides[i]
            if s > 1:
                u = nn.ConvTranspose(self.num_upsample_filters[i], (s, s),
                                     strides=(s, s), use_bias=False,
                                     name=f'deblock{i}')(x)
            else:
                u = nn.Conv(self.num_upsample_filters[i], (s, s),
                            strides=(s, s), use_bias=False,
                            name=f'deblock{i}')(x)
            u = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, name=f'deblock{i}_bn')(u)
            ups.append(nn.relu(u))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
