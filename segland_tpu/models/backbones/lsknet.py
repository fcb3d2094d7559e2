"""LSKNet backbone (tiny), NHWC flax.

Match for reference networks/backbones/lsknet.py: overlapping patch embeds
(7x7/s4 then 3x3/s2) with BN, blocks of BN -> LSK attention -> layer-scale
residual and BN -> conv-MLP (with 3x3 depthwise) -> layer-scale residual,
per-stage output LayerNorm.  LSK block: dual large-kernel depthwise (5x5 and
7x7 dilation 3), channel-halving 1x1s, avg/max-pool spatial gating through a
7x7 conv sigmoid, re-projection, multiplicative gate.
Dropout/DropPath are identity at eval; at train=True the reference tiny
config applies dropout 0.1 in the conv-MLP and stochastic depth 0.1 with the
linspace decay rule (reference lsknet.py:134,193-203).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .droppath import DropPath, drop_path_rates


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


class LSKBlockCore(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        conv = lambda feats, k, dil, groups, name: nn.Conv(
            feats, (k, k), padding=[(dil * (k // 2),) * 2] * 2, kernel_dilation=(dil, dil),
            feature_group_count=groups, dtype=self.dtype, name=name)
        attn1 = conv(d, 5, 1, d, "conv0")(x)
        attn2 = conv(d, 7, 3, d, "conv_spatial")(attn1)
        attn1 = nn.Conv(d // 2, (1, 1), dtype=self.dtype, name="conv1")(attn1)
        attn2 = nn.Conv(d // 2, (1, 1), dtype=self.dtype, name="conv2")(attn2)
        attn = jnp.concatenate([attn1, attn2], axis=-1)
        avg_attn = jnp.mean(attn, axis=-1, keepdims=True)
        max_attn = jnp.max(attn, axis=-1, keepdims=True)
        agg = jnp.concatenate([avg_attn, max_attn], axis=-1)
        sig = nn.sigmoid(nn.Conv(2, (7, 7), padding=[(3, 3)] * 2, dtype=self.dtype, name="conv_squeeze")(agg))
        attn = attn1 * sig[..., 0:1] + attn2 * sig[..., 1:2]
        attn = nn.Conv(d, (1, 1), dtype=self.dtype, name="conv")(attn)
        return x * attn


class LSKAttention(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_1")(x)
        x = nn.gelu(x, approximate=False)
        x = LSKBlockCore(self.dim, dtype=self.dtype, name="spatial_gating_unit")(x)
        x = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="proj_2")(x)
        return x + shortcut


class LSKStageBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.1
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (self.dim,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (self.dim,))
        dp = self.drop_path > 0.0 and train
        dp1 = DropPath(self.drop_path, name="drop_path1")
        dp2 = DropPath(self.drop_path, name="drop_path2")
        h = _bn(train, self.dtype, "norm1")(x)
        h = LSKAttention(self.dim, dtype=self.dtype, name="attn")(h)
        # cast the fp32 layer-scale params: a bare `ls * h` promotes every
        # block output to fp32 in bf16 mode (2x HBM traffic network-wide)
        h = ls1.astype(h.dtype) * h
        x = x + (dp1(h, train) if dp else h)
        h = _bn(train, self.dtype, "norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.Conv(hidden, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden,
                    dtype=self.dtype, name="mlp_dwconv")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop1")(h)
        h = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="mlp_fc2")(h)
        h = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop2")(h)
        h = ls2.astype(h.dtype) * h
        return x + (dp2(h, train) if dp else h)


class LSKNet(nn.Module):
    embed_dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (3, 3, 5, 2)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    drop_rate: float = 0.1
    drop_path_rate: float = 0.1  # reference lsknet.py:201 (lsknet_tiny)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        dpr = drop_path_rates(self.drop_path_rate, self.depths)
        cur = 0
        for i in range(len(self.depths)):
            k, s = (7, 4) if i == 0 else (3, 2)
            x = nn.Conv(self.embed_dims[i], (k, k), strides=(s, s), padding=[(k // 2,) * 2] * 2,
                        dtype=self.dtype, name=f"patch_embed{i+1}_proj")(x)
            x = _bn(train, self.dtype, f"patch_embed{i+1}_norm")(x)
            for j in range(self.depths[i]):
                x = LSKStageBlock(self.embed_dims[i], self.mlp_ratios[i], self.drop_rate,
                                  drop_path=dpr[cur + j],
                                  dtype=self.dtype, name=f"block{i+1}_{j}")(x, train)
            cur += self.depths[i]
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{i+1}")(x)
            outs.append(x)
        return outs  # fine->coarse


def lsknet_tiny(dtype=jnp.float32):
    return LSKNet(dtype=dtype)
