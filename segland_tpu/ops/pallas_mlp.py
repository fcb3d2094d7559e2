"""Fused LayerNorm+MLP+residual Pallas kernel (the transformer-family hot op).

Why: the LN -> fc1 -> gelu -> fc2 -> (+residual) section of every Swin /
ConvNeXt / LSKNet block is HBM-bound on TPU — as separate XLA ops it makes
~15 full-tensor round trips (the 4C hidden tensor alone is read+written
once each), and the odd channel counts (96/192/384) tile at partial lane
occupancy, so measured stage cost is ~10-20x the flop bound (see
BASELINE.md swin profile: 7 ms per stage-0 MLP vs 0.4 ms of flops).

This kernel reads the input tile once, keeps the hidden activations in
VMEM, and writes the residual-added output once: traffic drops from ~15x
the tensor size to 2x (+weights, resident across grid steps).

Semantics (matching the flax module chain exactly, modulo bf16 rounding):

    y   = LayerNorm(x) * gamma + beta        (stats in fp32, fast-variance)
    h   = gelu(y @ w1 + b1, approximate=False)
    o   = h @ w2 + b2
    o   = o * ls                              (optional layer-scale, ConvNeXt)
    out = res + o                             (res defaults to x)

Differentiable: forward runs the Pallas kernel; backward re-computes via the
XLA reference implementation (`ln_mlp_reference`) under `jax.vjp`, so
training paths (train_base with a transformer backbone) stay correct while
eval gets the fused speed.

Used by models/backbones/{swin,convnext,lsknet}.py under their
``fused_mlp`` flag; reference behaviors mirrored: swin block MLP
(reference networks/backbones/swintransformer.py:171-190), ConvNeXt block
MLP + layer-scale (networks/backbones/convnext.py:15-50).
"""

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def force_interpret() -> bool:
    """SEGLAND_PALLAS_INTERPRET=1 routes the fused kernels through the Pallas
    interpreter on any backend (instead of the XLA fallback used off-TPU), so
    CPU-mesh dryruns/tests exercise the actual kernel code paths the TPU
    serving config runs (read at trace time — set it before jit)."""
    return os.environ.get("SEGLAND_PALLAS_INTERPRET", "") not in ("", "0")


def ln_mlp_reference(x, gamma, beta, w1, b1, w2, b2, res=None, ls=None,
                     eps=1e-5):
    """Pure-XLA reference, numerically mirroring the flax module chain
    (LayerNorm stats fp32, dense ops in x.dtype with fp32 MXU accumulate)."""
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    y = y.astype(cdt)
    h = jnp.dot(y, w1.astype(cdt), preferred_element_type=jnp.float32)
    h = h.astype(cdt) + b1.astype(cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(cdt)
    o = jnp.dot(h, w2.astype(cdt), preferred_element_type=jnp.float32)
    o = o.astype(cdt) + b2.astype(cdt)
    if ls is not None:
        o = o * ls.astype(cdt)
    r = x if res is None else res
    return r + o


def _gelu_tanh(x):
    """tanh-form GELU, used when the compute dtype is bfloat16: its max abs
    error vs exact GELU is 5.0e-4 (at x~2.63) — 30x BELOW the 1.6e-2 error
    already introduced by bf16-quantizing the hidden activations — while the
    erf polynomial (exp + divide on the VPU in fp32) measured as 52% of the
    whole stage-0 kernel time (5.25 -> 2.72 ms/block, benchmarks/
    convnext_flagship.py).  fp32 inputs keep the exact polynomial."""
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _gelu_exact_poly(x):
    """Exact (erf-based) GELU with erf from Abramowitz-Stegun 7.1.26
    (max abs error 1.5e-7 — far below bf16 resolution).  Needed because
    Mosaic TPU has no erf/erfc lowering; the tanh-approximate GELU would
    NOT match the reference (torch nn.GELU default is exact,
    reference networks/backbones/swintransformer.py:28)."""
    z = x * 0.7071067811865476
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    erf = s * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


def _kernel(eps, has_res, has_ls, refs):
    i = 0
    x_ref = refs[i]; i += 1
    res_ref = None
    if has_res:
        res_ref = refs[i]; i += 1
    gamma_ref = refs[i]; beta_ref = refs[i + 1]
    w1_ref = refs[i + 2]; b1_ref = refs[i + 3]
    w2_ref = refs[i + 4]; b2_ref = refs[i + 5]
    i += 6
    ls_ref = None
    if has_ls:
        ls_ref = refs[i]; i += 1
    out_ref = refs[i]

    cdt = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    y = y.astype(cdt)
    h = jnp.dot(y, w1_ref[:], preferred_element_type=jnp.float32)
    h = h.astype(cdt) + b1_ref[:].astype(cdt)
    gelu = _gelu_tanh if cdt == jnp.bfloat16 else _gelu_exact_poly
    h = gelu(h.astype(jnp.float32)).astype(cdt)
    o = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    o = o.astype(cdt) + b2_ref[:].astype(cdt)
    if has_ls:
        o = o * ls_ref[:].astype(cdt)
    r = x_ref[:] if res_ref is None else res_ref[:]
    out_ref[:] = r + o


def _tile_m(c: int, hidden: int, itemsize: int) -> int:
    """Pick a row-tile that keeps (weights + double-buffered tiles + the fp32
    hidden intermediate) inside ~12 MB of VMEM."""
    budget = 12 * 1024 * 1024 - 2 * c * hidden * itemsize
    if budget <= 0:
        return 0
    for tile in (4096, 2048, 1024, 512, 256, 128):
        # x/res/out tiles double-buffered (io) + y/h/o fp32 intermediates
        need = tile * (3 * c * itemsize * 2 + (2 * c + 2 * hidden) * 4)
        if need <= budget:
            return tile
    return 0


def _pallas_ln_mlp(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps, interpret):
    m, c = x2.shape
    hidden = w1.shape[1]
    tile = _tile_m(c, hidden, x2.dtype.itemsize)
    if tile == 0 or m % tile:
        # fall back for shapes that don't tile (kept rare by callers)
        return ln_mlp_reference(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps)

    cdt = x2.dtype
    row = lambda i: (i, 0)
    const = lambda i: (0, 0)
    vec = lambda a: a.reshape(1, -1).astype(jnp.float32)

    in_specs = [pl.BlockSpec((tile, c), row, memory_space=pltpu.VMEM)]
    args = [x2]
    if res2 is not None:
        in_specs.append(pl.BlockSpec((tile, c), row, memory_space=pltpu.VMEM))
        args.append(res2)
    in_specs += [
        pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hidden), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM),
    ]
    args += [vec(gamma), vec(beta), w1.astype(cdt), vec(b1), w2.astype(cdt), vec(b2)]
    if ls is not None:
        in_specs.append(pl.BlockSpec((1, c), const, memory_space=pltpu.VMEM))
        args.append(vec(ls))

    kernel = functools.partial(
        _kernel, eps, res2 is not None, ls is not None)
    flops = 2 * m * c * hidden * 2
    bytes_accessed = (2 + (1 if res2 is not None else 0)) * m * c * x2.dtype.itemsize
    return pl.pallas_call(
        lambda *refs: kernel(refs),
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, c), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, c), cdt),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=m * hidden),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _fused(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps, interpret):
    return _pallas_ln_mlp(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps, interpret)


def _fused_fwd(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps, interpret):
    out = _pallas_ln_mlp(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps, interpret)
    return out, (x2, gamma, beta, w1, b1, w2, b2, res2, ls)


def _fused_bwd(eps, interpret, saved, g):
    x2, gamma, beta, w1, b1, w2, b2, res2, ls = saved
    diff = (x2, gamma, beta, w1, b1, w2, b2, res2, ls)

    def f(*d):
        x2_, gamma_, beta_, w1_, b1_, w2_, b2_, res2_, ls_ = d
        return ln_mlp_reference(x2_, gamma_, beta_, w1_, b1_, w2_, b2_,
                                res2_, ls_, eps)

    _, vjp = jax.vjp(f, *diff)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_ln_mlp(x, gamma, beta, w1, b1, w2, b2, *, res=None, ls=None,
                 eps=1e-5, interpret=False):
    """Fused LN+MLP(+layer-scale)+residual. x: [..., C]; returns same shape.

    gamma/beta/b1/b2/ls: [C]-like vectors (fp32 params); w1: [C, H]; w2:
    [H, C].  On non-TPU backends (and shapes that don't tile) this lowers to
    the XLA reference path, so the flag is safe to leave on anywhere.
    """
    c = x.shape[-1]
    m = math.prod(x.shape[:-1])
    if not interpret and force_interpret():
        interpret = True
    use_pallas = interpret or jax.default_backend() == "tpu"
    x2 = x.reshape(m, c)
    res2 = None if res is None else res.reshape(m, c)
    if not use_pallas:
        out = ln_mlp_reference(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps)
    else:
        out = _fused(x2, gamma, beta, w1, b1, w2, b2, res2, ls, eps, interpret)
    return out.reshape(x.shape)
