"""segland_tpu — TPU-native generalized few-shot semantic segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the SegLand
reference (LiZhuoHong/SegLand): POP (Projection onto Orthogonal Prototypes)
generalized few-shot segmentation for OpenEarthMap land-cover mapping.

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere; bf16 compute / fp32 params; fp32 islands for the
    prototype decomposition and losses (mirrors the reference's fp32 autocast
    islands, networks/pspnet_pop.py:95).
  * The POP head's per-class rank-1 classifier passes are collapsed
    algebraically (see ops/pop.py) so the [B,K,C,N] component tensor of the
    reference never materializes.
  * Data parallelism is plain GSPMD: jit over a jax.sharding.Mesh with the
    batch dim sharded; gradient all-reduce and cross-replica BatchNorm
    statistics fall out of XLA collectives, replacing DDP/SyncBatchNorm
    (reference engine.py:69-74, train_base.py:175-178).
"""

__version__ = "0.1.0"
