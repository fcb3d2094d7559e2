"""Fused int8 bottleneck block (resnet eval) as one Pallas kernel.

Why: at 1024^2 eval the int8 resnet50-OS8 backbone measures 68 ms/b16 vs a
~23 ms flop bound (benchmarks/resnet_stage_probe.py).  The compiled HLO
shows why: XLA output-fuses conv1/conv2 epilogues to int8, but conv3's
s32 output (2048 ch) materializes because its epilogue carries the residual
operand — 4.2 GB/block of HBM traffic — and the block-input quantize is
another 1.6 GB pass.  This kernel runs the whole block
(quantize -> 1x1 -> BN+relu+requant -> 3x3(dilated) -> BN+relu+requant ->
1x1 -> BN -> +residual -> relu) over row-slabs held in VMEM: HBM traffic
drops to one bf16 read (+halo) and one bf16 write of the block stream.

STATUS — measured SLOWER than the XLA per-conv path on v5e via the axon
tunnel and therefore OPT-IN OFF by default (QuantConfig.fused_blocks):
layer3-like stage 15.6 -> 31.2 ms, full deeplab 104 -> 148 ms at b16.
Strip-kernels show the cost is NOT compute or the in-kernel quantize
(+0.5 ms) but the manual halo DMA machinery: a DMA-only variant of this
kernel already costs 4.4 ms per stage (~17 us/grid-step vs ~1.3 ms of
pure bandwidth), and neither start-all/wait-all nor double-buffered
prefetch recovered it.  The kernel itself is EXACT vs its reference
(tests/test_quant.py) — revisit on hardware without the tunnel, with
larger row-tiles (VMEM-capped here) or a rolling-slab scheme.

Semantics: eval-only (BN folded into per-channel affines from running
stats), stride 1, no downsample — the 12 of 16 resnet50 blocks where the
traffic is.  Stride/downsample blocks and training keep the XLA path.
Per-tensor activation scales (s_x for the block input, s_h1, s_h2 for the
internal activations) come from calibration, exactly like the interceptor
path (quant/ptq.py); weights are per-channel symmetric int8.

Matches reference semantics of networks/backbones/resnet.py:40-78
(Bottleneck: 1x1 -> 3x3(dilated, SAME) -> 1x1 + residual, BN+ReLU between,
optional final relu).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_clip(x):
    return jnp.clip(jnp.round(x), -127.0, 127.0)


def _kernel(x_hbm, w1_ref, w2_ref, w3_ref, a1_ref, b1_ref, a2_ref, b2_ref,
            a3_ref, b3_ref, s_ref, out_ref, slab, sem, *, th: int, d: int,
            last_relu: bool, n_rows: int):
    """Grid (B, H/th). slab: VMEM (th+2d, W, C) bf16 scratch."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    row0 = i * th
    rows = th + 2 * d
    _, w, c = slab.shape
    p = w1_ref.shape[1]

    # halo DMA: main rows always valid; top/bottom halos predicated, with
    # zero-fill at the image edges (SAME zero padding)
    @pl.when(i == 0)
    def _():
        slab[0:d] = jnp.zeros((d, w, c), slab.dtype)

    @pl.when(i == n_i - 1)
    def _():
        slab[th + d:] = jnp.zeros((d, w, c), slab.dtype)

    cp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0, th)], slab.at[pl.ds(d, th)], sem)
    cp.start()

    @pl.when(i > 0)
    def _():
        t = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0 - d, d)], slab.at[pl.ds(0, d)], sem)
        t.start()
        t.wait()

    @pl.when(i < n_i - 1)
    def _():
        bcp = pltpu.make_async_copy(x_hbm.at[b, pl.ds(row0 + th, d)],
                                    slab.at[pl.ds(th + d, d)], sem)
        bcp.start()
        bcp.wait()

    cp.wait()

    inv1 = s_ref[0, 0]
    inv2 = s_ref[0, 1]
    inv3 = s_ref[0, 2]

    xs = slab[:]  # (rows, W, C) bf16
    xq = _round_clip(xs.astype(jnp.float32) * inv1).astype(jnp.int8)
    acc1 = lax.dot_general(
        xq.reshape(rows * w, c), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (rows*W, P)
    h1 = jnp.maximum(acc1.astype(jnp.float32) * a1_ref[0] + b1_ref[0], 0.0)
    h1q = _round_clip(h1 * inv2).astype(jnp.int8).reshape(rows, w, p)
    # zero h1 on halo rows OUTSIDE the image: the reference 3x3 conv
    # zero-pads the activation, but our zero-x halo rows yield relu(bn bias)
    gid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + (row0 - d)
    valid = jnp.logical_and(gid >= 0, gid < n_rows)
    h1q = jnp.where(valid[:, :, None], h1q, jnp.int8(0))
    h1p = jnp.pad(h1q, ((0, 0), (d, d), (0, 0)))

    acc2 = jnp.zeros((th * w, p), jnp.int32)
    for ti in range(3):
        for tj in range(3):
            sl = h1p[ti * d: ti * d + th, tj * d: tj * d + w, :]
            acc2 = acc2 + lax.dot_general(
                sl.reshape(th * w, p), w2_ref[ti * 3 + tj],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    h2 = jnp.maximum(acc2.astype(jnp.float32) * a2_ref[0] + b2_ref[0], 0.0)
    h2q = _round_clip(h2 * inv3).astype(jnp.int8)

    acc3 = lax.dot_general(
        h2q, w3_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (th*W, C)
    res = xs[d: d + th].astype(jnp.float32).reshape(th * w, c)
    o = acc3.astype(jnp.float32) * a3_ref[0] + b3_ref[0] + res
    if last_relu:
        o = jnp.maximum(o, 0.0)
    out_ref[0] = o.reshape(th, w, c).astype(out_ref.dtype)


def _pick_th(h: int, w: int, c: int, p: int, d: int) -> int:
    """Largest row-tile whose working set fits ~12 MB of VMEM."""
    for th in (32, 16, 8, 4):
        if h % th:
            continue
        rows = th + 2 * d
        need = (
            rows * w * c * 2            # bf16 slab
            + rows * w * c              # int8 xq
            + rows * w * p * 4          # acc1 s32
            + rows * (w + 2 * d) * p    # h1 padded int8
            + th * w * p * 4            # acc2
            + th * w * c * 4            # acc3 s32
            + th * w * c * 4            # f32 out stage
            + 2 * th * w * c * 2        # out double-buffered
            + (c * p + 9 * p * p + p * c)  # int8 weights
        )
        if need <= 12 * 1024 * 1024:
            return th
    return 0


def fused_bottleneck_int8(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                          s_x, s_h1, s_h2, *, dilation: int = 1,
                          last_relu: bool = True, interpret: bool = False):
    """x [B,H,W,C] bf16 -> [B,H,W,C].

    w1 [C,P], w2 [3,3,P,P], w3 [P,C]: pre-quantized int8 weights;
    a*/b* [P or C] f32: folded dequant*BN affines
    (a1 = s_x*s_w1*bn1_scale etc.); s_x/s_h1/s_h2: activation scales.
    Returns None if the shape doesn't fit (caller falls back to XLA).
    """
    bsz, h, w, c = x.shape
    p = w1.shape[1]
    d = dilation
    th = _pick_th(h, w, c, p, d)
    if th == 0 or w % 8:
        return None

    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    s = jnp.array([[1.0 / s_x, 1.0 / s_h1, 1.0 / s_h2]], jnp.float32)
    w2r = w2.reshape(9, p, p)

    kernel = functools.partial(_kernel, th=th, d=d, last_relu=last_relu,
                               n_rows=h)
    flops = 2 * bsz * h * w * (c * p * 2 + 9 * p * p)
    return pl.pallas_call(
        kernel,
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; DMA'd
            pl.BlockSpec((c, p), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, p, p), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda b, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * d, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * bsz * h * w * c,
            transcendentals=0),
        interpret=interpret,
    )(x, w1, w2r, w3, vec(a1), vec(b1), vec(a2), vec(b2), vec(a3), vec(b3),
      jnp.pad(s, ((0, 0), (0, 1))))


def bottleneck_int8_reference(x, w1, w2, w3, a1, b1, a2, b2, a3, b3,
                              s_x, s_h1, s_h2, *, dilation: int = 1,
                              last_relu: bool = True):
    """XLA reference with identical math (tests + fallback)."""
    f32 = jnp.float32
    xq = _round_clip(x.astype(f32) / s_x).astype(jnp.int8)
    acc1 = lax.conv_general_dilated(
        xq, w1[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    h1 = jnp.maximum(acc1.astype(f32) * a1 + b1, 0.0)
    h1q = _round_clip(h1 / s_h1).astype(jnp.int8)
    acc2 = lax.conv_general_dilated(
        h1q, w2, (1, 1), [(dilation, dilation)] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    h2 = jnp.maximum(acc2.astype(f32) * a2 + b2, 0.0)
    h2q = _round_clip(h2 / s_h2).astype(jnp.int8)
    acc3 = lax.conv_general_dilated(
        h2q, w3[None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    o = acc3.astype(f32) * a3 + b3 + x.astype(f32)
    if last_relu:
        o = jnp.maximum(o, 0.0)
    return o.astype(x.dtype)


# ---------------------------------------------------------------------------
# Round-4 partial fusion: conv3 + residual epilogue only.
#
# STATUS: measured SLOWER than the XLA equivalent and NOT USED in the
# serving path (kept for the record + its exactness test).
# benchmarks/conv3_probe.py, b16 layer4/layer3 eval shapes:
#   XLA  [M,P]@[P,C] int8 dot + dequant + residual + relu:  1.69 / 0.55 ms
#   this kernel (mblk None/128/512):                        8.2  / 3.9  ms
# Two lessons: (1) XLA fuses the residual-carrying epilogue FINE when the
# whole chain is one expression — the s32 materialization seen in the
# model came from the per-conv interceptor's call-boundary split, not an
# XLA limitation (fix: quant/ptq.py:_fused_conv3_block writes the block as
# one chain); (2) the Mosaic int8 dot does not reach the int8 MXU rate at
# these shapes (~8 ms for a 550-GFLOP dot = fp32-class throughput).


def _conv3_kernel(h2q_ref, res_ref, w3_ref, a3_ref, b3_ref, out_ref, *,
                  last_relu: bool):
    acc = lax.dot_general(
        h2q_ref[:], w3_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [mblk, C] s32
    o = acc.astype(jnp.float32) * a3_ref[0] + b3_ref[0]
    o = o + res_ref[:].astype(jnp.float32)
    if last_relu:
        o = jnp.maximum(o, 0.0)
    out_ref[:] = o.astype(out_ref.dtype)


def conv3_residual_int8(h2q, res, w3, a3, b3, *, last_relu: bool = True,
                        interpret: bool = False, mblk: int | None = None):
    """h2q int8 [M, P] (conv3 input, already quantized), res [M, C] bf16
    (block input), w3 int8 [P, C], a3/b3 [C] f32 (dequant*BN affine) ->
    [M, C] bf16: conv3 + BN3 + residual (+relu) in one pass."""
    m, p = h2q.shape
    c = res.shape[1]
    if mblk is None:
        # per-row VMEM: io (h2q + res + out, double-buffered) + s32 acc +
        # f32 epilogue stage; ~11 MB budget
        per_row = 2 * (p + 2 * c + 2 * c) + 4 * c + 4 * c
        mblk = max(8, min(1024, (11 * 1024 * 1024 - p * c) // per_row))
        mblk = 1 << (mblk.bit_length() - 1)   # power of two for clean grids
    mp = -(-m // mblk) * mblk
    if mp != m:
        h2q = jnp.pad(h2q, ((0, mp - m), (0, 0)))
        res = jnp.pad(res, ((0, mp - m), (0, 0)))
    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_conv3_kernel, last_relu=last_relu),
        grid=(mp // mblk,),
        in_specs=[
            pl.BlockSpec((mblk, p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mblk, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mblk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), res.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * p * c,
            bytes_accessed=mp * (p + 4 * c),
            transcendentals=0),
        interpret=interpret,
    )(h2q, res, w3, vec(a3), vec(b3))
    return out[:m] if mp != m else out
