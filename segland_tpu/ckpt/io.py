"""Checkpoint save/restore (replaces torch.save/load_model,
reference train_base.py:286-311 + utils/pyt_utils.py:86-135).

Two formats:
  * msgpack via flax.serialization (default) — single file per checkpoint,
    host-portable, no directory protocol.  Resume-by-epoch mirrors the
    reference's ``epoch_<n>.pth`` / ``best.pth`` naming with ``.ckpt``.
  * orbax (``format="orbax"`` / ``--ckpt-format orbax``) — directory-based,
    async-capable.  ``load_checkpoint`` auto-detects by path type
    (directory -> orbax).

Multi-host: both formats gather to host and save from process 0 only
(cli/train_base.py), which is correct whenever the train state is fully
replicated across processes (plain DP — the only parallelism the reference
supports).  ``_to_host`` REFUSES arrays this process cannot fully address
(cross-process-sharded params), so a partial checkpoint can never be written
silently; an all-process collective orbax save is the upgrade path if
cross-host model sharding is ever added.
"""

import os
from typing import Optional

import jax
import numpy as np
import flax
from flax import serialization


def _to_host(tree):
    """Gather a pytree to host numpy, refusing to write a WRONG checkpoint:
    a multi-host array this process cannot fully address (params sharded over
    processes) would silently serialize as a partial copy.  Fully-replicated
    states (plain DP) remain saveable from any process.  (The reference's
    rank-0 torch.save works multi-node only because DDP replicates,
    train_base.py:286-292; the GSPMD analog must check addressability.)"""

    def conv(x):
        if getattr(x, "is_fully_addressable", True) is False:
            sharding = getattr(x, "sharding", None)
            if getattr(sharding, "is_fully_replicated", False):
                # Multi-process DP: is_fully_addressable is False for ANY
                # multi-process sharding, but a fully-replicated array has the
                # complete value in every shard — materialize from one this
                # process owns (the rank-0 torch.save analog).
                return np.asarray(x.addressable_shards[0].data)
            raise NotImplementedError(
                "checkpoint save: array is not fully addressable from this "
                f"process (sharding {sharding}); a "
                "host-gathered save would be partial. All-process collective "
                "saves are not wired — keep train state replicated across "
                "hosts (DP) or save per-shard externally.")
        return np.asarray(x)

    return jax.tree_util.tree_map(conv, tree)


def save_params(path: str, variables: dict):
    """Save {'params': ..., 'batch_stats': ...} variables."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_host(variables)))


def load_params(path: str, template: dict) -> dict:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _state_dict(state):
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": state.epoch,
    }


def save_checkpoint(path: str, state, extra: Optional[dict] = None,
                    format: str = "msgpack"):
    """Full train-state checkpoint (params + opt state + batch stats + step)."""
    if format == "orbax":
        return _save_orbax(path, state, extra)
    payload = {
        "state": serialization.to_state_dict(_to_host(_state_dict(state))),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str, state):
    """Restore a train state saved by save_checkpoint; returns (state, extra).
    Auto-detects the format: a directory is an orbax checkpoint."""
    if os.path.isdir(path):
        return _load_orbax(path, state)
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    restored = serialization.from_state_dict(_state_dict(state), payload["state"])
    state = state.replace(**restored)
    return state, payload["extra"]


def _save_orbax(path: str, state, extra: Optional[dict] = None):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, serialization.to_state_dict(_to_host(_state_dict(state))),
               force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "segland_extra.json"), "w") as f:
        json.dump(extra or {}, f)


def _load_orbax(path: str, state):
    import json

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = serialization.to_state_dict(_to_host(_state_dict(state)))
    restored_sd = ckptr.restore(path, template)
    restored = serialization.from_state_dict(_state_dict(state), restored_sd)
    extra_path = os.path.join(path, "segland_extra.json")
    extra = {}
    if os.path.exists(extra_path):
        with open(extra_path) as f:
            extra = json.load(f)
    return state.replace(**restored), extra


def graft_base_into_ft(ft_variables: dict, base_variables: dict) -> dict:
    """Load a base checkpoint into a fine-tune model: every base leaf that
    exists in the ft tree is copied (backbone, decoder, classifier, base_emb,
    BN stats); novel_emb/classifier_n keep their fresh init.  Mirrors
    load_model(strict=False) + frozen base_emb semantics (ft_pop.py:196-204).
    """
    out = flax.traverse_util.flatten_dict(ft_variables)
    base = flax.traverse_util.flatten_dict(base_variables)
    for path, leaf in base.items():
        if path in out:
            if out[path].shape != leaf.shape:
                raise ValueError(f"shape mismatch at {path}: {out[path].shape} vs {leaf.shape}")
            out[path] = leaf
    return flax.traverse_util.unflatten_dict(out)
