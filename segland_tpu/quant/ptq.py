"""Flax-interceptor-based int8 PTQ: no model changes, no param-tree changes.

How it works: `flax.linen.intercept_methods` swaps the ``__call__`` of every
*large* ``nn.Conv`` / ``nn.Dense`` for a quantized path —

  * weights: per-output-channel symmetric int8, quantized at trace time from
    the existing fp32/bf16 params (the param tree is untouched, so converted
    reference ``.pth`` checkpoints keep working);
  * activations: per-tensor symmetric int8 with a static scale from a
    calibration pass (running abs-max over calibration batches), stored in a
    separate ``"quant"`` variable collection;
  * accumulation in int32 on the MXU (``preferred_element_type``), dequant +
    bias + BN/ReLU all fuse into the conv epilogue under XLA.

Skipped (stay bf16/fp32): depthwise/grouped convs (no MXU win), convs with
<32 in or out channels (stems, classifier heads), anything matching
``QuantConfig.skip_paths``, and the fp32 POP head (custom params — the
interceptor never sees an ``nn.Conv`` there; see models/pop.py).

The reference's accuracy-critical fp32 island (networks/pspnet_pop.py:95)
is therefore preserved exactly; quantization only touches backbone/decoder
feature extraction.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    min_in: int = 32       # skip convs/denses with fewer input channels (stem)
    min_out: int = 32      # skip tiny heads (classifiers)
    skip_paths: Tuple[str, ...] = ()   # substring match on "/".join(module.path)
    quantize_dense: bool = True        # swin/convnext MLPs + qkv/proj
    # activation-scale estimator: "absmax" (exact running max) or
    # "percentile" (robust to rare outliers — clips the top tail, which
    # usually costs far less accuracy than the resolution lost to an
    # outlier-stretched scale).  Percentile is approximated per batch as the
    # p-quantile of per-row abs-maxima and runs under a running max across
    # calibration batches.
    act_estimator: str = "absmax"
    percentile: float = 99.9
    # run eligible resnet Bottleneck blocks (stride 1, no downsample)
    # through the fused Pallas block kernel (ops/pallas_bottleneck.py):
    # one VMEM pass per block instead of ~9 GB/block of HBM traffic from
    # the conv3 s32 materialization + standalone quantize passes
    fused_blocks: bool = False
    # Round-4 partial fusion: run each eligible Bottleneck as ONE XLA
    # expression chain (conv3 as a flat dot_general with dequant*BN +
    # residual + relu in its epilogue) instead of per-conv interception —
    # removing the conv3 s32 materialization + re-read (~4.2 GB per
    # 2048-ch block at b16 128^2) that the interceptor's call-boundary
    # split forces.  See _fused_conv3_block for the measurements (incl.
    # the Pallas variant that measured 5x slower and was dropped).
    # Mutually exclusive with fused_blocks (fused_blocks wins if both set).
    fused_conv3: bool = False
    fused_interpret: bool = False  # interpret-mode kernel (CPU tests)


DEFAULT_CONFIG = QuantConfig()


def _fold_bn(p, st, eps=1e-5):
    bs = p["scale"].astype(jnp.float32) / jnp.sqrt(st["var"].astype(jnp.float32) + eps)
    return bs, p["bias"].astype(jnp.float32) - st["mean"].astype(jnp.float32) * bs


def _wq(kernel, axes):
    k = kernel.astype(jnp.float32)
    s = jnp.maximum(jnp.abs(k).max(axis=axes), 1e-8) / 127.0
    return jnp.clip(jnp.round(k / s), -127, 127).astype(jnp.int8), s


def build_fused_block_inputs(variables, cfg: QuantConfig):
    """Walk the variable tree for Bottleneck subtrees with calibrated child
    scales and precompute fused-kernel inputs, keyed by module path."""
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    quant = variables.get("quant", {})
    out = {}

    def walk(p, st, q, path):
        if not isinstance(p, dict):
            return
        if ("conv1" in p and "conv2" in p and "conv3" in p and "bn1" in p
                and isinstance(q, dict) and "conv1" in q and "conv2" in q
                and "conv3" in q and "downsample_conv" not in p):
            try:
                w1q, sw1 = _wq(p["conv1"]["kernel"][0, 0], (0,))
                w2q, sw2 = _wq(p["conv2"]["kernel"], (0, 1, 2))
                w3q, sw3 = _wq(p["conv3"]["kernel"][0, 0], (0,))
                bs1, bt1 = _fold_bn(p["bn1"], st["bn1"])
                bs2, bt2 = _fold_bn(p["bn2"], st["bn2"])
                bs3, bt3 = _fold_bn(p["bn3"], st["bn3"])
                s_x = jnp.maximum(q["conv1"]["act_amax"], 1e-6) / 127.0
                s_h1 = jnp.maximum(q["conv2"]["act_amax"], 1e-6) / 127.0
                s_h2 = jnp.maximum(q["conv3"]["act_amax"], 1e-6) / 127.0
                out["/".join(path)] = dict(
                    w1=w1q, w2=w2q, w3=w3q,
                    a1=s_x * sw1 * bs1, b1=bt1,
                    a2=s_h1 * sw2 * bs2, b2=bt2,
                    a3=s_h2 * sw3 * bs3, b3=bt3,
                    s_x=s_x, s_h1=s_h1, s_h2=s_h2,
                )
            except KeyError:
                pass
            return
        for k, v in p.items():
            walk(v, st.get(k, {}) if isinstance(st, dict) else {},
                 q.get(k, {}) if isinstance(q, dict) else {}, path + (k,))

    walk(params, stats, quant, ())
    return out


def _tup(v, n=2):
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _canon_padding(p):
    """nn.Conv padding forms we support -> lax.conv padding (else None)."""
    if isinstance(p, str):
        return p if p in ("SAME", "VALID") else None
    if isinstance(p, int):
        return ((p, p), (p, p))
    try:
        out = []
        for e in p:
            if isinstance(e, int):
                out.append((e, e))
            else:
                t = tuple(e)
                if len(t) != 2:
                    return None
                out.append(t)
        return tuple(out) if len(out) == 2 else None
    except TypeError:
        return None


def _quantize_sym(x, scale):
    """Symmetric int8 quantization; `scale` broadcasts on the last axis."""
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def _module_path(m) -> str:
    try:
        return "/".join(str(p) for p in m.path)
    except Exception:
        return ""


def _skip_by_path(m, cfg) -> bool:
    if not cfg.skip_paths:
        return False
    path = _module_path(m)
    return any(s in path for s in cfg.skip_paths)


def _conv_quantizable(m, x, cfg) -> bool:
    if type(m) is not nn.Conv:
        return False
    if not hasattr(x, "ndim") or x.ndim != 4:
        return False
    if m.feature_group_count != 1 or getattr(m, "mask", None) is not None:
        return False
    if _tup(getattr(m, "input_dilation", None)) != (1, 1):
        return False  # transposed-style convs: quantized path has no lhs_dilation
    if x.shape[-1] < cfg.min_in or m.features < cfg.min_out:
        return False
    if _canon_padding(m.padding) is None:
        return False
    return not _skip_by_path(m, cfg)


def _dense_quantizable(m, x, cfg) -> bool:
    if type(m) is not nn.Dense or not cfg.quantize_dense:
        return False
    if not hasattr(x, "ndim") or x.ndim < 2:
        return False
    if x.shape[-1] < cfg.min_in or m.features < cfg.min_out:
        return False
    return not _skip_by_path(m, cfg)


def _fused_conv3_block(x, pre, dilation, last_relu, interpret):
    """Bottleneck forward written as ONE XLA expression chain so the conv3
    epilogue (dequant*BN + residual + relu) output-fuses: the per-conv
    interceptor splits dequant (interceptor) from BN/residual (module code)
    across call boundaries and XLA materializes conv3's s32 output + a
    re-read (~4.2 GB per 2048-ch block at b16 128^2).  conv3 runs as a flat
    [M,P]@[P,C] dot_general over the (free) pixel-collapsed view.

    Measured (benchmarks/conv3_probe.py, b16 layer4/layer3 shapes): the
    whole dot + dequant + residual + relu chain is 1.69 / 0.55 ms — i.e.
    XLA fuses it fully when given the chance; a hand-written Pallas kernel
    of the same op measured 8.2 / 3.9 ms (the Mosaic int8 dot does not hit
    the int8 MXU rate), so this path is pure XLA.  `interpret` is unused
    (kept for signature parity with the fused_blocks branch)."""
    del interpret
    from ..ops.pallas_bottleneck import _round_clip

    f32 = jnp.float32
    b, h, w, c = x.shape
    d = (dilation, dilation)
    xq = _round_clip(x.astype(f32) / pre["s_x"]).astype(jnp.int8)
    acc1 = jax.lax.conv_general_dilated(
        xq, pre["w1"][None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    h1 = jnp.maximum(acc1.astype(f32) * pre["a1"] + pre["b1"], 0.0).astype(x.dtype)
    h1q = _round_clip(h1.astype(f32) / pre["s_h1"]).astype(jnp.int8)
    acc2 = jax.lax.conv_general_dilated(
        h1q, pre["w2"], (1, 1), [d] * 2, rhs_dilation=d,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    h2 = jnp.maximum(acc2.astype(f32) * pre["a2"] + pre["b2"], 0.0).astype(x.dtype)
    h2q = _round_clip(h2.astype(f32) / pre["s_h2"]).astype(jnp.int8)
    acc3 = jax.lax.conv_general_dilated(
        h2q, pre["w3"][None, None], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    # Split the epilogue at the residual: dequant*BN fuses INTO the conv
    # (bf16 out, the s32 never hits HBM); the residual add + relu runs as
    # a separate clean elementwise pass.  Without the barrier XLA pulls
    # the residual into the conv epilogue, fails to fuse it, and
    # materializes the s32 accumulator instead (~2.1 GB per 2048-ch block;
    # the dot_general form measured worse still — canonicalized back to a
    # conv plus an f32 convert, stage probe 41.4 vs 29.7 ms per-conv).
    y0 = (acc3.astype(f32) * pre["a3"] + pre["b3"]).astype(x.dtype)
    y0 = jax.lax.optimization_barrier(y0)
    y = y0.astype(f32) + x.astype(f32)
    if last_relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def quant_interceptor(mode: str, cfg: QuantConfig = DEFAULT_CONFIG,
                      fused_map=None):
    """Interceptor for ``nn.intercept_methods``.

    mode="calibrate": forward is numerically unchanged; records the running
    abs-max of every quantizable layer's input into the mutable ``"quant"``
    collection (apply with ``mutable=["quant"]``).
    mode="int8": runs the quantized path; requires a calibrated ``"quant"``
    collection in the variables.
    """
    if mode not in ("calibrate", "int8"):
        raise ValueError(f"unknown quant mode: {mode}")

    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if context.method_name != "__call__" or not args:
            return next_fun(*args, **kwargs)
        x = args[0]
        if (fused_map is not None and mode == "int8"
                and type(m).__name__ == "Bottleneck"
                and not m.is_initializing()
                and getattr(m, "stride", None) == 1
                and not getattr(m, "has_downsample", True)
                and hasattr(x, "ndim") and x.ndim == 4
                and x.dtype == jnp.bfloat16):
            pre = fused_map.get(_module_path(m))
            if pre is not None and (cfg.fused_interpret
                                    or jax.default_backend() == "tpu"):
                if cfg.fused_blocks:
                    from ..ops.pallas_bottleneck import fused_bottleneck_int8

                    out = fused_bottleneck_int8(
                        x, dilation=m.dilation * m.multi_grid,
                        last_relu=m.last_relu, interpret=cfg.fused_interpret,
                        **pre)
                    if out is not None:
                        return out
                elif cfg.fused_conv3:
                    return _fused_conv3_block(
                        x, pre, dilation=m.dilation * m.multi_grid,
                        last_relu=m.last_relu, interpret=cfg.fused_interpret)
        is_conv = _conv_quantizable(m, x, cfg)
        if not is_conv and not _dense_quantizable(m, x, cfg):
            return next_fun(*args, **kwargs)
        if m.is_initializing():
            return next_fun(*args, **kwargs)

        amax = m.variable("quant", "act_amax", lambda: jnp.zeros((), jnp.float32))
        if mode == "calibrate":
            mag = jnp.abs(x.astype(jnp.float32))
            if cfg.act_estimator == "percentile":
                # outlier-robust: p-quantile of a deterministic subsample
                # (full-tensor sort would be 10^8 elements at 1024^2)
                flat = mag.reshape(-1)
                stride = max(1, flat.size // 65536)
                est = jnp.quantile(flat[::stride], cfg.percentile / 100.0)
            else:
                est = mag.max()
            amax.value = jnp.maximum(amax.value, est)
            return next_fun(*args, **kwargs)

        s_x = jnp.maximum(amax.value, 1e-6) / 127.0
        xq = _quantize_sym(x.astype(jnp.float32), s_x)
        if is_conv:
            kshape = _tup(m.kernel_size) + (x.shape[-1], m.features)
            kernel = m.param("kernel", m.kernel_init, kshape, m.param_dtype)
            kernel = kernel.astype(jnp.float32)
            s_w = jnp.maximum(jnp.abs(kernel).max(axis=(0, 1, 2)), 1e-8) / 127.0
            # NOTE: lowering 1x1 convs to dot_general was measured SLOWER
            # (XLA:TPU canonicalizes the dot back to a convolution and adds
            # an f32 convert materialization; layer4 29.8 -> 32.8 ms/b16)
            acc = jax.lax.conv_general_dilated(
                xq, _quantize_sym(kernel, s_w),
                _tup(m.strides), _canon_padding(m.padding),
                rhs_dilation=_tup(m.kernel_dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        else:
            kernel = m.param(
                "kernel", m.kernel_init, (x.shape[-1], m.features), m.param_dtype
            ).astype(jnp.float32)
            s_w = jnp.maximum(jnp.abs(kernel).max(axis=0), 1e-8) / 127.0
            acc = jax.lax.dot_general(
                xq, _quantize_sym(kernel, s_w),
                (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        y = acc.astype(jnp.float32) * (s_x * s_w)
        if m.use_bias:
            bias = m.param("bias", m.bias_init, (m.features,), m.param_dtype)
            y = y + bias.astype(jnp.float32)
        out_dtype = m.dtype or jnp.promote_types(x.dtype, m.param_dtype)
        return y.astype(out_dtype)

    return interceptor


def calibrate(model, variables, batches, cfg: QuantConfig = DEFAULT_CONFIG,
              **apply_kwargs) -> dict:
    """Run calibration forwards over ``batches`` (an iterable of model-input
    arrays); returns ``variables`` with the ``"quant"`` scale collection
    merged in (running abs-max across all batches)."""
    apply_kwargs.setdefault("train", False)

    @jax.jit
    def _calib(variables, img):
        with nn.intercept_methods(quant_interceptor("calibrate", cfg)):
            _, muts = model.apply(variables, img, mutable=["quant"], **apply_kwargs)
        return muts["quant"]

    variables = dict(variables)
    for img in batches:
        quant = _calib(variables, img)
        variables["quant"] = quant
    if "quant" not in variables:
        raise ValueError("calibrate: no batches provided")
    return variables


def quantized_apply(model, cfg: QuantConfig = DEFAULT_CONFIG):
    """Returns an ``apply(variables, *args, **kwargs)`` that runs the model
    with int8 conv/dense layers.  ``variables`` must contain the ``"quant"``
    collection from :func:`calibrate`."""

    def apply_fn(variables, *args, **kwargs):
        if "quant" not in variables:
            raise ValueError(
                "int8 inference requires activation scales - run quant.calibrate first")
        fused_map = (build_fused_block_inputs(variables, cfg)
                     if (cfg.fused_blocks or cfg.fused_conv3) else None)
        if cfg.fused_blocks or cfg.fused_conv3:
            # the fused kernel additionally gates per-call on bfloat16
            # activations + (TPU backend or fused_interpret) + stride-1
            # no-downsample Bottlenecks — warn instead of silently doing
            # nothing when the request cannot take effect (advisor finding)
            import logging

            log = logging.getLogger(__name__)
            which = "fused_blocks" if cfg.fused_blocks else "fused_conv3"
            if not fused_map:
                log.warning("%s requested but no Bottleneck has a "
                            "fused-eligible weight set; per-conv int8 only",
                            which)
            elif not (cfg.fused_interpret or jax.default_backend() == "tpu"):
                log.warning("%s requested but backend is %s (needs "
                            "TPU, or QuantConfig(fused_interpret=True)); "
                            "per-conv int8 only", which, jax.default_backend())
        with nn.intercept_methods(quant_interceptor("int8", cfg, fused_map)):
            return model.apply(variables, *args, **kwargs)

    return apply_fn
