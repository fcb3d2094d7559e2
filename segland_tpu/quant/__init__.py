"""Post-training int8 quantization (PTQ) for TPU inference.

The v5e MXU executes int8 matmuls at ~2x bf16 throughput; measured on the
resnet50-OS8 bottleneck stack this gives a 1.57x end-to-end step speedup
including dequant/requant epilogues (BASELINE.md).  The reference has no
counterpart (pure fp16-autocast CUDA, train_base.py:219) — this is a
TPU-native serving feature; the bf16 path remains the parity baseline.
"""

from .ptq import (  # noqa: F401
    QuantConfig,
    DEFAULT_CONFIG,
    quant_interceptor,
    calibrate,
    quantized_apply,
)
