"""ConvNeXt backbone (tiny), NHWC flax.

Match for reference networks/backbones/convnext.py: 4x4/s4 stem + LN,
LN+2x2/s2 downsample layers, blocks = 7x7 depthwise conv -> LN -> 4x MLP ->
layer scale (gamma, init 1e-6), 4-level pyramid output FINE->COARSE.
DropPath is identity at eval and train drop_path_rate defaults to 0 in the
reference factory, so it is omitted.
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    fused_mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3)] * 2, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        if self.fused_mlp:
            from ...ops.pallas_mlp import fused_ln_mlp
            from .fused import DenseParams, LNParams

            g, b = LNParams(self.dim, name="norm")()
            w1, b1 = DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
            w2, b2 = DenseParams(4 * self.dim, self.dim, name="pwconv2")()
            return fused_ln_mlp(x, g, b, w1, b1, w2, b2, res=inp, ls=gamma, eps=1e-6)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        # cast the fp32 layer-scale param: a bare `gamma * x` promotes every
        # block output to fp32 in bf16 mode (2x HBM traffic network-wide)
        return inp + gamma.astype(x.dtype) * x


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    fused_mlp: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="downsample_0_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="downsample_0_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"downsample_{i}_norm")(x)
                x = nn.Conv(self.dims[i], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"downsample_{i}_conv")(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(self.dims[i], fused_mlp=self.fused_mlp,
                                  dtype=self.dtype, name=f"stages_{i}_{j}")(x)
            outs.append(x)
        return outs  # fine->coarse


def convnext_tiny(dtype=jnp.float32, fused_mlp: bool = False):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                    fused_mlp=fused_mlp, dtype=dtype)
