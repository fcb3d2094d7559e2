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

TPU lane packing (ops/packed.py): the C=32/64 stages run every vector lane
at 25/50% occupancy, and measurement shows the cost is dominated by the
ELEMENTWISE glue (BN/residual/layer-scale/gating), not the convs — see
benchmarks/hrnet_branch_probe.py (conv+affine+relu is 6x the bare conv at
C=32).  With ``packed=True`` (default) whole blocks run in a k=128//C
pixel-packed layout at eval: 1x1s as block-diagonal matmuls, depthwise
convs as block-banded MXU convs where the band stays narrow (band_kw <= kh,
else a free repack around the reference op), the gate's per-pixel avg/max
and sigmoid modulation per packed slot, BatchNorms folded to per-channel
affines on tiled params (running stats, eval only), and residuals/
layer-scales on full 128-lane tensors.  Train mode keeps the reference
formulation (live BN batch stats); the 1x1/depthwise packed ops are also
used there (pure functions of the same params, gradient-tested).  fp32
results are exact modulo reassociation (injected off-block weights are hard
zeros); bf16 agrees at argmax level.  Parameter trees are identical in both
modes (ConvParams/BNParams mirror nn.Conv/nn.BatchNorm).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from .droppath import DropPath, drop_path_rates
from .fused import BNParams, ConvParams
from ...ops import packed as pk


def _bn(train, dtype, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype, name=name)


def _bn_fold_packed(parent, xp, c, k, name, dtype):
    """Eval-only BatchNorm as a per-channel affine on packed activations
    (BNParams mirrors nn.BatchNorm's variable tree)."""
    scale, bias, mean, var = BNParams(c, name=name, parent=parent)()
    s = scale / jnp.sqrt(var + 1e-5)
    return xp * jnp.tile(s, k).astype(xp.dtype) \
        + jnp.tile(bias - mean * s, k).astype(xp.dtype)


def _bn_batch_packed(parent, xp, c, k, name):
    """Train-mode BatchNorm on packed activations: per-channel batch stats
    reduce identically over the packed layout (the k slots are disjoint
    W-pixel subsets of the same channels), normalization + momentum
    running-stat update follow flax nn.BatchNorm exactly (BNParams
    batch_update — same machinery as hrnet.py _packed_cb)."""
    yf = xp.astype(jnp.promote_types(xp.dtype, jnp.float32)).reshape(-1, k, c)
    bm = jnp.mean(yf, axis=(0, 1))
    bv = jnp.maximum(jnp.mean(yf * yf, axis=(0, 1)) - bm * bm, 0.0)
    scale, bias, _, _ = BNParams(c, name=name, parent=parent)((bm, bv))
    s = scale / jnp.sqrt(bv + 1e-5)
    return xp * jnp.tile(s, k).astype(xp.dtype) \
        + jnp.tile(bias - bm * s, k).astype(xp.dtype)


def _conv_apply(x, w, b, *, dil=1, groups=1, dtype=jnp.float32):
    """nn.Conv-equivalent SAME-padded stride-1 conv from raw params."""
    kh = w.shape[0]
    pad = dil * (kh // 2)
    y = lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), [(pad, pad)] * 2,
        rhs_dilation=(dil, dil), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return y + b.astype(dtype)


def _dw_packed(xp, w, b, dil, k, dt, groups):
    """Depthwise conv on packed activations: band formulation while the band
    stays narrow (band_kw <= kh), else a free repack around the reference
    depthwise op (e.g. 7x7-dil-3 at k=2 would span 11 columns = 3.1x FLOPs)."""
    kh = w.shape[0]
    if pk.band_kw(kh, dil, k) <= kh:
        return pk.dw_conv_packed(xp, w.astype(dt), b.astype(dt), dil, k)
    y = _conv_apply(pk.unpack(xp, k), w, b, dil=dil, groups=groups, dtype=dt)
    return pk.pack(y, k)


class LSKBlockCore(nn.Module):
    dim: int
    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        dt = self.dtype
        w0, b0 = ConvParams((5, 5), 1, d, name="conv0")()
        wsp, bsp = ConvParams((7, 7), 1, d, name="conv_spatial")()
        w1, b1 = ConvParams((1, 1), d, d // 2, name="conv1")()
        w2, b2 = ConvParams((1, 1), d, d // 2, name="conv2")()
        wsq, bsq = ConvParams((7, 7), 2, 2, name="conv_squeeze")()
        wc, bc = ConvParams((1, 1), d // 2, d, name="conv")()

        k = pk.pack_k(d, min_k=2) if self.packed else 1
        if k > 1 and x.shape[2] % k == 0:
            h2 = d // 2
            xp = pk.pack(x, k)
            a1p = _dw_packed(xp, w0, b0, 1, k, dt, d)
            a2p = _dw_packed(a1p, wsp, bsp, 3, k, dt, d)
            a1cp = pk.conv1x1_packed(a1p, w1[0, 0].astype(dt), b1.astype(dt), k)
            a2cp = pk.conv1x1_packed(a2p, w2[0, 0].astype(dt), b2.astype(dt), k)
            # spatial gating entirely in the packed layout: per-pixel slot
            # stats over the [attn1 ++ attn2] channels, 7x7 2-ch squeeze as
            # a band conv, per-slot sigmoid modulation
            lead = a1cp.shape[:-1]
            a1r = a1cp.reshape(*lead, k, h2)
            a2r = a2cp.reshape(*lead, k, h2)
            cat = jnp.concatenate([a1r, a2r], axis=-1)
            agg = jnp.stack([jnp.mean(cat, -1), jnp.max(cat, -1)], -1)
            sig = nn.sigmoid(pk.conv_packed(
                agg.reshape(*lead, k * 2), wsq.astype(dt), bsq.astype(dt), 1, k))
            sigr = sig.reshape(*lead, k, 2)
            attn = a1r * sigr[..., 0:1] + a2r * sigr[..., 1:2]
            attnp = pk.conv1x1_packed(attn.reshape(*lead, k * h2),
                                      wc[0, 0].astype(dt), bc.astype(dt), k)
            return pk.unpack(xp * attnp, k)
        a1 = _conv_apply(x, w0, b0, groups=d, dtype=dt)
        a2 = _conv_apply(a1, wsp, bsp, dil=3, groups=d, dtype=dt)
        attn1 = _conv_apply(a1, w1, b1, dtype=dt)
        attn2 = _conv_apply(a2, w2, b2, dtype=dt)
        attn = jnp.concatenate([attn1, attn2], axis=-1)
        avg_attn = jnp.mean(attn, axis=-1, keepdims=True)
        max_attn = jnp.max(attn, axis=-1, keepdims=True)
        agg = jnp.concatenate([avg_attn, max_attn], axis=-1)
        sig = nn.sigmoid(_conv_apply(agg, wsq, bsq, dtype=dt))
        attn = attn1 * sig[..., 0:1] + attn2 * sig[..., 1:2]
        attn = _conv_apply(attn, wc, bc, dtype=dt)
        return x * attn


class LSKAttention(nn.Module):
    dim: int
    packed: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        dt = self.dtype
        wq, bq = ConvParams((1, 1), d, d, name="proj_1")()
        wp, bp = ConvParams((1, 1), d, d, name="proj_2")()
        k = pk.pack_k(d, min_k=2) if self.packed else 1
        if k > 1 and x.shape[2] % k == 0:
            xp = pk.pack(x.astype(dt), k)
            hp = pk.conv1x1_packed(xp, wq[0, 0].astype(dt), bq.astype(dt), k)
            h = pk.unpack(nn.gelu(hp, approximate=False), k)
            h = LSKBlockCore(d, packed=self.packed, dtype=dt,
                             name="spatial_gating_unit")(h)
            hp = pk.conv1x1_packed(pk.pack(h, k), wp[0, 0].astype(dt),
                                   bp.astype(dt), k)
            return pk.unpack(hp + xp, k)
        h = nn.gelu(_conv_apply(x, wq, bq, dtype=dt), approximate=False)
        h = LSKBlockCore(d, packed=self.packed, dtype=dt, name="spatial_gating_unit")(h)
        h = _conv_apply(h, wp, bp, dtype=dt)
        return h + x


class LSKStageBlock(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.1
    drop_path: float = 0.0
    packed: bool = True
    # Train-mode packing of the block glue (BN/residual/layer-scale) on the
    # C<128 stages; default False by measurement: the round-4 A/B is a null
    # result (129.1 -> 129.1 ms/step b8 768^2; BASELINE.md round-4 table).
    packed_train: bool = False
    dtype: Any = jnp.float32

    def _mlp_hidden(self, h, wf1, bf1, wdw, bdw, hidden, dt):
        """fc1 (1x1) -> depthwise 3x3, with the two adjacent LINEAR ops
        folded into ONE dense 3x3 d->hidden conv on the lane-starved d<128
        stages: w[dy,dx,ci,co] = wf1[ci,co]*wdw[dy,dx,co].  fc1's bias rides
        an appended ones-channel so the depthwise zero-padding semantics are
        preserved exactly at borders.  7x the MACs but one hidden-tensor
        write instead of three passes of the ratio-8 537MB hidden: measured
        9.12 -> 2.61 ms at stage 0, 4.55 -> 1.14 at stage 1
        (benchmarks/lsk_mlp_merge_probe.py; packed 1x1s LOSE here and were
        removed — fc1's output is already >=128 channels)."""
        d = self.dim
        if d < 128:
            wm = (wf1[0, 0][None, None].astype(jnp.float32)
                  * wdw[:, :, 0, :][:, :, None, :].astype(jnp.float32))
            wb = (bf1.astype(jnp.float32)[None, None, None, :]
                  * wdw[:, :, 0, :].astype(jnp.float32)[:, :, None, :])
            wcat = jnp.concatenate([wm, wb], axis=2).astype(dt)
            ones = jnp.ones(h.shape[:-1] + (1,), h.dtype)
            haug = jnp.concatenate([h, ones], axis=-1)
            return lax.conv_general_dilated(
                haug.astype(dt), wcat, (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bdw.astype(dt)
        h = _conv_apply(h, wf1, bf1, dtype=dt)
        return _conv_apply(h, wdw, bdw, groups=hidden, dtype=dt)

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        dt = self.dtype
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (d,))
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (d,))
        hidden = int(d * self.mlp_ratio)
        wf1, bf1 = ConvParams((1, 1), d, hidden, name="mlp_fc1")()
        wdw, bdw = ConvParams((3, 3), 1, hidden, name="mlp_dwconv")()
        wf2, bf2 = ConvParams((1, 1), hidden, d, name="mlp_fc2")()
        attn = LSKAttention(d, packed=self.packed, dtype=dt, name="attn")
        # bf16 uses tanh-GELU (5e-4 max err, 30x below bf16 noise — the same
        # policy as the fused Pallas kernels); exact-erf measured 3.3 ms of
        # the stage-0 MLP.  fp32 keeps exact erf (CPU parity bit-identical).
        approx_gelu = dt == jnp.bfloat16

        k = pk.pack_k(d, min_k=2) if self.packed else 1
        if k > 1 and not train and x.shape[2] % k == 0:
            # packed eval block: BNs folded to affines, residuals and
            # layer-scales on 128-lane tensors; MLP runs unpacked via the
            # merged conv (its tensors are >=128-channel already)
            xp = pk.pack(x.astype(dt), k)
            hn = _bn_fold_packed(self, xp, d, k, "norm1", dt)
            ha = attn(pk.unpack(hn, k))
            xp = xp + pk.pack(ha, k) * jnp.tile(ls1.astype(dt), k)
            hn = _bn_fold_packed(self, xp, d, k, "norm2", dt)
            hu = self._mlp_hidden(pk.unpack(hn, k), wf1, bf1, wdw, bdw, hidden, dt)
            hu = nn.gelu(hu, approximate=approx_gelu)
            h2 = pk.pack(_conv_apply(hu, wf2, bf2, dtype=dt), k)
            xp = xp + h2 * jnp.tile(ls2.astype(dt), k)
            return pk.unpack(xp, k)

        dp = self.drop_path > 0.0 and train
        dp1 = DropPath(self.drop_path, name="drop_path1")
        dp2 = DropPath(self.drop_path, name="drop_path2")
        if k > 1 and train and self.packed_train and x.shape[2] % k == 0:
            # packed TRAIN block: batch-stat BNs, residuals and layer-scales
            # at full lane density (BNParams batch_update keeps flax
            # running-stat semantics); dropout/droppath draw on the packed
            # layout (a bijective reshape — per-element iid / per-sample
            # masks are distribution-identical).  MLP + attention interiors
            # unchanged (attention packs internally; MLP is >=128-channel).
            xp = pk.pack(x.astype(dt), k)
            hn = _bn_batch_packed(self, xp, d, k, "norm1")
            ha = attn(pk.unpack(hn, k))
            h = pk.pack(ha, k) * jnp.tile(ls1.astype(dt), k)
            xp = xp + (dp1(h, train) if dp else h)
            hn = _bn_batch_packed(self, xp, d, k, "norm2")
            hu = self._mlp_hidden(pk.unpack(hn, k), wf1, bf1, wdw, bdw, hidden, dt)
            hu = nn.gelu(hu, approximate=approx_gelu)
            hu = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop1")(hu)
            h2 = pk.pack(_conv_apply(hu, wf2, bf2, dtype=dt), k)
            h2 = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop2")(h2)
            h2 = h2 * jnp.tile(ls2.astype(dt), k)
            xp = xp + (dp2(h2, train) if dp else h2)
            return pk.unpack(xp, k)
        h = _bn(train, dt, "norm1")(x)
        h = attn(h)
        # cast the fp32 layer-scale params: a bare `ls * h` promotes every
        # block output to fp32 in bf16 mode (2x HBM traffic network-wide)
        h = ls1.astype(h.dtype) * h
        x = x + (dp1(h, train) if dp else h)
        h = _bn(train, dt, "norm2")(x)
        h = self._mlp_hidden(h, wf1, bf1, wdw, bdw, hidden, dt)
        h = nn.gelu(h, approximate=approx_gelu)
        h = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop1")(h)
        h = _conv_apply(h, wf2, bf2, dtype=dt)
        h = nn.Dropout(self.drop, deterministic=not train, name="mlp_drop2")(h)
        h = ls2.astype(h.dtype) * h
        return x + (dp2(h, train) if dp else h)


class LSKNet(nn.Module):
    embed_dims: Sequence[int] = (32, 64, 160, 256)
    depths: Sequence[int] = (3, 3, 5, 2)
    mlp_ratios: Sequence[float] = (8, 8, 4, 4)
    drop_rate: float = 0.1
    drop_path_rate: float = 0.1  # reference lsknet.py:201 (lsknet_tiny)
    packed: bool = True
    packed_train: bool = False
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
                                  drop_path=dpr[cur + j], packed=self.packed,
                                  packed_train=self.packed_train,
                                  dtype=self.dtype, name=f"block{i+1}_{j}")(x, train)
            cur += self.depths[i]
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=f"norm{i+1}")(x)
            outs.append(x)
        return outs  # fine->coarse


def lsknet_tiny(dtype=jnp.float32, packed: bool = True,
                packed_train: bool = False):
    return LSKNet(dtype=dtype, packed=packed, packed_train=packed_train)
