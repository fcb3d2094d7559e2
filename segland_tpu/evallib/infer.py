"""Whole-tile batched inference + confusion-matrix accumulation + export.

Replaces eval_base.py/eval_ft.py inner loops.  TPU-first deltas vs the
reference: batched tiles instead of bs=1 (reference eval is single-tile,
eval_base.py:162), logits upsampled on device (align_corners=True,
eval_base.py:168), argmax on device, and the batch dim shards over the mesh
so the same code scales to a v5e-8.
"""

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..metrics import confusion_matrix, miou_from_cmatrix
from ..ops.resize import resize_bilinear
from ..data.tileio import write_pred_tiff, write_prob_mat, OEM_COLORMAP


class Evaluator:
    def __init__(self, model, variables, num_classes: int = 12, n_base: int = 7,
                 ignore_label: int = 255, mesh=None,
                 normalize_on_device: bool = False,
                 mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 int8: bool = False, calib_batches: int = 4, quant_cfg=None,
                 fused_epilogue: Optional[bool] = None):
        self.model = model
        self.variables = variables
        self.num_classes = num_classes
        self.n_base = n_base
        self.ignore_label = ignore_label
        self.mesh = mesh
        # fused on-device preprocessing: accept raw uint8 tiles and do the
        # BGR-flip + /255 + mean/std inside the jitted forward (the host
        # normalize in dataset/base_dataset.py:29-34 moved on-device)
        self.normalize_on_device = normalize_on_device
        self._mean = jnp.asarray(mean, jnp.float32)
        self._std = jnp.asarray(std, jnp.float32)
        # int8 PTQ serving mode (segland_tpu/quant): the first `calib_batches`
        # predict calls additionally run an activation-calibration forward
        # (running abs-max, so the scales always cover the current batch);
        # every prediction uses the int8 conv/dense path (~1.5x on v5e MXU).
        # A "quant" collection already present in `variables` (pre-calibrated
        # via segland_tpu.quant.calibrate) skips the warm-up entirely.
        # fused upsample+argmax epilogue (ops/fused_epilogue.py): Mosaic-only,
        # so default to the TPU backend; pass True to force (tests use the
        # interpret path separately) or False to disable
        if fused_epilogue is None:
            fused_epilogue = jax.default_backend() == "tpu"
        self._fused_epilogue = fused_epilogue
        self.int8 = int8
        if "quant" in variables:
            self.variables = {k: v for k, v in variables.items() if k != "quant"}
            self._quant = variables["quant"]
            calib_batches = 0
        else:
            self._quant = None
        if int8 and self._quant is None and calib_batches < 1:
            raise ValueError("int8=True needs calib_batches >= 1 or pre-calibrated "
                             "'quant' scales in variables")
        self.calib_batches = calib_batches
        self._calib_seen = 0
        # built eagerly: mesh is known here, and baking it in at first-trace
        # time via instance-state mutation inside jit was fragile (a later
        # mesh change would silently reuse the stale closure)
        self._fwd = self._make_fwd(self.model.apply)
        self._predict = jax.jit(
            self._predict_fn, static_argnames=("out_h", "out_w", "want_logits"))
        if int8:
            from ..quant import quantized_apply, quant_interceptor, DEFAULT_CONFIG
            import flax.linen as nn

            cfg = quant_cfg or DEFAULT_CONFIG
            q_apply = quantized_apply(self.model, cfg)

            q_fwd = self._make_fwd(q_apply)

            def predict_q(variables, img, out_h, out_w, want_logits=True):
                return self._postprocess(
                    q_fwd(variables, img), out_h, out_w, want_logits)

            def calib(variables, img):
                with nn.intercept_methods(quant_interceptor("calibrate", cfg)):
                    _, muts = self.model.apply(
                        variables, self._pre(img), train=False, mutable=["quant"])
                return muts["quant"]

            self._predict_q = jax.jit(
                predict_q, static_argnames=("out_h", "out_w", "want_logits"))
            self._calib = jax.jit(calib)

    def _pre(self, img):
        if self.normalize_on_device:
            img = img[..., ::-1].astype(jnp.float32) / 255.0
            img = (img - self._mean) / self._std
        return img

    def _postprocess(self, logits, out_h, out_w, want_logits=True):
        if not want_logits and self._fused_epilogue:
            from ..ops.fused_epilogue import upsample_argmax, upsample_argmax_supported

            shard_shape = list(logits.shape)
            if self.mesh is not None:
                shard_shape[0] //= self.mesh.devices.size
            if upsample_argmax_supported(shard_shape, (out_h, out_w)):
                # one fused Pallas pass: the upsampled fp32 logits never
                # exist, and the resize matmuls run 4 split-bf16 passes
                # instead of HIGHEST's 6 (see ops/fused_epilogue.py; measured
                # 6.76 -> ~2.5 ms/batch at flagship shapes)
                post = lambda l: upsample_argmax(l, (out_h, out_w))
                if self.mesh is not None:
                    from jax.sharding import PartitionSpec as P
                    from jax.experimental.shard_map import shard_map

                    post = shard_map(post, mesh=self.mesh, in_specs=P("data"),
                                     out_specs=P("data"), check_rep=False)
                return None, post(logits)
        logits = resize_bilinear(logits.astype(jnp.float32), (out_h, out_w), align_corners=True)
        pred = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        # the upsampled fp32 logits are huge (batch 16 @ 1024^2 x 8 classes =
        # 512 MB); when the caller only needs predictions (mIoU path) they
        # must not become a jit output — XLA then fuses the argmax and the
        # big tensor never hits HBM
        return (logits if want_logits else None), pred

    def _make_fwd(self, apply_fn):
        """Forward producing model-resolution logits.  Over a mesh, wrap in
        shard_map on the batch axis: GSPMD treats Pallas kernels (--fused,
        fused_blocks) as opaque custom calls and would replicate their
        operands; shard_map runs them per-shard on local data instead."""
        def fwd(variables, img):
            return apply_fn(variables, self._pre(img), train=False)
        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax.experimental.shard_map import shard_map

            fwd = shard_map(fwd, mesh=self.mesh, in_specs=(P(), P("data")),
                            out_specs=P("data"), check_rep=False)
        return fwd

    def _predict_fn(self, variables, img, out_h, out_w, want_logits=True):
        logits = self._fwd(variables, img)
        return self._postprocess(logits, out_h, out_w, want_logits)

    def _stage(self, images: np.ndarray, batch_pad: Optional[int] = None):
        """Pad a host batch to a static size and start its async h2d
        transfer (+ mesh sharding).  Returns (device_images, true_batch)."""
        b = images.shape[0]
        target = batch_pad or (self.mesh.devices.size if self.mesh is not None else b)
        pad = (-b) % target
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)], 0)
        img = jnp.asarray(images)
        if self.mesh is not None:
            from ..dist import shard_batch

            img = shard_batch(self.mesh, img)
        return img, b

    def predict_batch(self, images: np.ndarray, out_hw, batch_pad: Optional[int] = None,
                      want_logits: bool = True):
        """images [B,H,W,3] float32 -> (logits [B,oh,ow,K] fp32, pred uint8).

        Ragged final batches are zero-padded to ``batch_pad`` (defaults to the
        mesh size) so shapes stay static (one compile) and shard evenly; the
        padded rows are sliced off the outputs.

        want_logits=False returns (None, pred) and keeps the upsampled fp32
        logits out of the jit outputs entirely (mIoU path: nothing but the
        uint8 argmax ever materializes).
        """
        if isinstance(images, tuple):  # pre-staged by _stage (device prefetch)
            img, b = images
        else:
            img, b = self._stage(images, batch_pad)
        if self.int8:
            if self._quant is None:
                # zero-init the scale collection from shapes only, so _calib
                # compiles exactly once (input pytree structure never changes)
                shapes = jax.eval_shape(self._calib, self.variables, img)
                self._quant = jax.tree_util.tree_map(
                    lambda s: np.zeros(s.shape, s.dtype), shapes)
            if self._calib_seen < self.calib_batches:
                self._quant = self._calib(
                    {**self.variables, "quant": self._quant}, img)
                self._calib_seen += 1
            logits, pred = self._predict_q(
                {**self.variables, "quant": self._quant}, img,
                int(out_hw[0]), int(out_hw[1]), want_logits=want_logits)
        else:
            logits, pred = self._predict(self.variables, img, int(out_hw[0]),
                                         int(out_hw[1]), want_logits=want_logits)
        if img.shape[0] != b:  # slice off zero-padded rows
            logits = logits[:b] if logits is not None else None
            pred = pred[:b]
        return logits, pred

    def _device_prefetch(self, loader, depth: int = 2):
        """Stage batches to the device from a background thread so the h2d
        transfer of batch N+1 overlaps the compute of batch N (the
        prefetch_to_device idiom; transfers are the serving wall on hosts
        with slow PCIe and on the axon tunnel)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = object()

        def worker():
            try:
                for images, labels, ids in loader:
                    images = images if isinstance(images, np.ndarray) else np.stack(images, 0)
                    q.put((self._stage(images), labels, ids))
            finally:
                q.put(stop)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is stop:
                return
            yield item

    def run(self, loader, save_path: Optional[str] = None,
            prob_path: Optional[str] = None, data_root: Optional[str] = None,
            colormap=None, square_pad_eval: bool = False, logger=None,
            export_workers: int = 4, device_prefetch: int = 2):
        """Full eval epoch. Returns (cmatrix, base/novel/total mIoU, tiles/sec).

        With GT: accumulate the 12-class confusion matrix (device-side; no
        logits leave the chip).  Without GT: write colormapped GTiff
        predictions and (if prob_path) per-tile .mat probability maps
        (reference eval_base.py:160-191).  Exports run on a thread pool so
        disk/transfer overlap the next batch's device compute.

        square_pad_eval: eval_ft protocol — upsample logits to
        (longside, longside) and ignore-pad the GT (eval_ft.py:168-178).
        """
        from concurrent.futures import ThreadPoolExecutor

        colormap = colormap or OEM_COLORMAP
        cm = np.zeros((self.num_classes, self.num_classes), np.float64)
        n_tiles = 0
        t0 = time.time()
        cm_dev = None
        pool = ThreadPoolExecutor(export_workers)
        pending = []
        batches = (self._device_prefetch(loader, device_prefetch)
                   if device_prefetch > 0 else loader)
        for batch in batches:
            images, labels, ids = batch
            has_gt = labels[0] is not None if isinstance(labels, list) else labels is not None
            if has_gt:
                labels = np.stack(labels, 0) if isinstance(labels, list) else np.asarray(labels)
                lh, lw = labels.shape[-2:]
                if square_pad_eval:
                    side = max(lh, lw)
                    pad = ((0, 0), (0, side - lh), (0, side - lw))
                    labels = np.pad(labels, pad, constant_values=self.ignore_label)
                    lh = lw = side
                _, pred = self.predict_batch(images, (lh, lw), want_logits=False)
                if self.num_classes <= 255 and self.ignore_label == 255:
                    labels = labels.astype(np.uint8)  # 4x less h2d than int32
                inc = confusion_matrix(
                    jnp.asarray(labels), pred, self.num_classes, self.ignore_label
                )
                cm_dev = inc if cm_dev is None else cm_dev + inc
            else:
                lh, lw = (images[0] if isinstance(images, tuple) else images).shape[1:3]
                logits, pred = self.predict_batch(images, (lh, lw),
                                                  want_logits=prob_path is not None)
                pred_np = np.asarray(pred) if save_path else None
                logits_np = np.asarray(logits) if prob_path else None

                def export(ids=ids, pred_np=pred_np, logits_np=logits_np):
                    for i, tid in enumerate(ids):
                        if save_path:
                            profile_from = (
                                os.path.join(data_root, "images", f"{tid}.tif") if data_root else None
                            )
                            write_pred_tiff(
                                os.path.join(save_path, f"{tid}.tif"), pred_np[i],
                                colormap, profile_from,
                            )
                        if prob_path:
                            # NCHW layout for fusemat byte-compat (eval_base.py:190)
                            write_prob_mat(
                                os.path.join(prob_path, f"{tid}.mat"),
                                np.transpose(logits_np[i], (2, 0, 1))[None],
                            )

                pending.append(pool.submit(export))
            n_tiles += len(ids)
        for fut in pending:
            fut.result()
        pool.shutdown()
        if cm_dev is not None:
            cm = np.asarray(cm_dev, np.float64)
        dt = time.time() - t0
        base, novel, total, iou = miou_from_cmatrix(cm, self.n_base)
        if logger:
            logger.info(f"eval: {n_tiles} tiles in {dt:.1f}s ({n_tiles/max(dt,1e-9):.1f} tiles/s)")
        return cm, (base, novel, total, iou), n_tiles / max(dt, 1e-9)
