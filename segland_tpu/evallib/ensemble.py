"""Device-side ensemble serving — the contest config without the .mat hop.

The reference's winning pipeline evaluates each model separately, exports
per-tile probability `.mat` maps, and averages them on the host
(eval_base.py:190-191 + fusemat.py:26-53).  That protocol exists because the
models ran on different machines/runs; when the members fit one process, the
TPU-native form runs ONE batch through all members inside a single jit,
averages the upsampled logits on device, and writes only the uint8 argmax —
no per-model fp32 logit fetch (the dominant serving cost of the classic
pipeline: K x H x W x 4 bytes/tile/model over PCIe) and no host averaging.

Numerics match fusemat exactly: mean of per-model maps then argmax (the
mean's 1/N scale cannot change the argmax, and summation order is fixed).
"""

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics import confusion_matrix, miou_from_cmatrix
from ..ops.resize import resize_bilinear


class EnsembleEvaluator:
    """Members: sequence of (model, variables) evaluated in eval mode on the
    same normalized batch; logits are bilinear-upsampled (align_corners=True,
    the eval protocol) to out_hw, averaged, argmaxed.

    mesh: optional 1-D data mesh — the batch dim shards exactly as in
    Evaluator (shard_map so Pallas members stay per-shard)."""

    def __init__(self, members: Sequence, num_classes: int = 12,
                 n_base: int = 7, ignore_label: int = 255, mesh=None,
                 normalize_on_device: bool = False,
                 mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 fused_epilogue: bool = None):
        self.members = list(members)
        self.num_classes = num_classes
        self.n_base = n_base
        self.ignore_label = ignore_label
        self.mesh = mesh
        self.normalize_on_device = normalize_on_device
        if fused_epilogue is None:
            fused_epilogue = jax.default_backend() == "tpu"
        self._fused_epilogue = fused_epilogue
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        self._apply_fns = [m.apply for m, _ in self.members]
        self._predict = jax.jit(self._predict_fn,
                                static_argnames=("out_h", "out_w"))

    def _pre(self, img):
        if self.normalize_on_device:
            img = img[..., ::-1].astype(jnp.float32) / 255.0
            img = (img - self._mean) / self._std
        return img

    def _fwd(self, member_vars, img, out_h, out_w):
        # bilinear upsampling is linear, so summation commutes with it:
        # group members by their native logit resolution and upsample each
        # group's SUM once (3 same-res members -> one [B,out,out,K] resize
        # instead of three; exactness preserved)
        by_res = {}
        for apply_fn, variables in zip(self._apply_fns, member_vars):
            logits = apply_fn(variables, self._pre(img), train=False)
            res = logits.shape[1:3]
            prev = by_res.get(res)
            lf = logits.astype(jnp.float32)
            by_res[res] = lf if prev is None else prev + lf
        if self._fused_epilogue and len(by_res) == 1:
            # single-resolution ensemble (the common case: same-stride
            # members): the summed map takes the fused upsample+argmax
            # Pallas pass — the [B,out,out,K] fp32 tensor never exists
            from ..ops.fused_epilogue import (upsample_argmax,
                                              upsample_argmax_supported)

            (res, summed), = by_res.items()
            if (res != (out_h, out_w)
                    and upsample_argmax_supported(summed.shape, (out_h, out_w))):
                return upsample_argmax(summed, (out_h, out_w))
        acc = None
        for res, summed in by_res.items():
            up = (summed if res == (out_h, out_w) else
                  resize_bilinear(summed, (out_h, out_w), align_corners=True))
            acc = up if acc is None else acc + up
        return jnp.argmax(acc, axis=-1).astype(jnp.uint8)

    def _predict_fn(self, member_vars, img, out_h, out_w):
        fwd = lambda mv, im: self._fwd(mv, im, out_h, out_w)
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            fwd = shard_map(fwd, mesh=self.mesh, in_specs=(P(), P("data")),
                            out_specs=P("data"), check_rep=False)
        return fwd(member_vars, img)

    def predict_batch(self, images, out_hw):
        """images: host [B,H,W,3] array, or a pre-staged (device_images, b)
        tuple (same contract as Evaluator.predict_batch)."""
        if isinstance(images, tuple):
            img, b = images
            pad = img.shape[0] - b
        else:
            b = images.shape[0]
            target = self.mesh.devices.size if self.mesh is not None else b
            pad = (-b) % target
            if pad:
                images = np.concatenate(
                    [images, np.zeros((pad,) + images.shape[1:], images.dtype)], 0)
            img = jnp.asarray(images)
            if self.mesh is not None:
                from ..dist import shard_batch

                img = shard_batch(self.mesh, img)
        member_vars = tuple(v for _, v in self.members)
        pred = self._predict(member_vars, img, int(out_hw[0]), int(out_hw[1]))
        return pred[:b] if pad else pred

    def run(self, loader, logger=None):
        """mIoU eval epoch over labeled tiles (fused predictions)."""
        import time

        cm_dev = None
        n_tiles = 0
        t0 = time.time()
        for images, labels, ids in loader:
            images = images if isinstance(images, np.ndarray) else np.stack(images, 0)
            labels = np.stack(labels, 0) if isinstance(labels, list) else np.asarray(labels)
            pred = self.predict_batch(images, labels.shape[-2:])
            if self.num_classes <= 255 and self.ignore_label == 255:
                labels = labels.astype(np.uint8)
            inc = confusion_matrix(jnp.asarray(labels), pred,
                                   self.num_classes, self.ignore_label)
            cm_dev = inc if cm_dev is None else cm_dev + inc
            n_tiles += len(ids)
        cm = np.asarray(cm_dev, np.float64)
        dt = time.time() - t0
        base, novel, total, iou = miou_from_cmatrix(cm, self.n_base)
        if logger:
            logger.info(f"ensemble eval: {n_tiles} tiles in {dt:.1f}s")
        return cm, (base, novel, total, iou), n_tiles / max(dt, 1e-9)
