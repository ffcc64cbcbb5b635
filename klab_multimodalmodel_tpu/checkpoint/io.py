"""Checkpoint save/restore (orbax).

Parity with the reference's artifacts (``/root/reference/models/model.py:
30-42``, ``train.py:84-104``): checkpoints named ``best`` / ``epoch_N`` /
``step_N`` under the result dir. Beyond the reference (which saves model
subtrees only and supports no training resume — SURVEY.md §5), each
checkpoint here is the **full train state** (params, optimizer moments, step)
plus a metadata JSON (epoch, min_val_loss, loss history), enabling true
deterministic resume. Sharded arrays are saved per-shard by orbax — no host
gather of the full model.

Pretrained checkpoints (``tools/convert_hf_checkpoint.py``) are always in
the dense scanned-layer layout; :func:`load_pretrained_params` re-layouts
the transformer on the fly when the target model is pipelined
(``--pipeline_stages``) — a pure reshape, bit-identical weights.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def load_pretrained_params(path: str, params: Any) -> Any:
    """Initialize a fresh param tree from a converted pretrained checkpoint.

    TPU-native equivalent of the reference's startup ``from_pretrained``
    pulls (``/root/reference/models/model.py:14-17``): ``path`` is the
    ``--output`` dir of ``tools/convert_hf_checkpoint.py`` (or its inner
    ``checkpoints/pretrained`` dir). Top-level subtrees present in the
    checkpoint (towers, projections) replace the fresh-init ones — restored
    directly into ``params``' shardings and dtypes; subtrees the converter
    did not emit keep their fresh initialization.
    """
    p = os.path.abspath(path)
    cand = os.path.join(p, "checkpoints", "pretrained")
    if os.path.isdir(cand):
        p = cand
    ckptr = ocp.StandardCheckpointer()
    saved = ckptr.metadata(p).item_metadata.tree
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, params)
    target = {k: v for k, v in abstract.items() if k in saved}
    missing = [k for k in saved if k not in abstract]
    if missing:
        raise ValueError(
            f"pretrained checkpoint {p} contains subtrees {missing} the "
            "model does not have — geometry/config mismatch")
    # Pipelined target + dense checkpoint: restore the transformer in the
    # checkpoint's own (dense) layout, then reshape into the stage layout.
    pipelined_tr = ("transformer" in target
                    and "pipeline" in target["transformer"].get(
                        "encoder", {}))
    if pipelined_tr and "layers" in saved["transformer"].get("encoder", {}):
        from ..parallel.partitioning import (make_param_specs,
                                             make_shardings)

        mesh = jax.tree.leaves(params)[0].sharding.mesh
        dense_abs = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
            saved["transformer"])
        dense_sh = make_shardings(make_param_specs(dense_abs), mesh)
        target["transformer"] = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                               sharding=sh),
            dense_abs, dense_sh)
    restored = ckptr.restore(p, target)
    if pipelined_tr and "pipeline" not in restored["transformer"].get(
            "encoder", {}):
        from ..models.t5 import pipeline_t5_params

        stages = jax.tree.leaves(
            params["transformer"]["encoder"]["pipeline"])[0].shape[0]
        conv = pipeline_t5_params(restored["transformer"], stages)
        ref_shardings = jax.tree.map(lambda x: x.sharding,
                                     params["transformer"])
        restored["transformer"] = jax.device_put(conv, ref_shardings)
    return {**params, **restored}


class CheckpointManager:
    def __init__(self, result_dir: str):
        self.base = os.path.abspath(os.path.join(result_dir, "checkpoints"))
        os.makedirs(self.base, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, name: str) -> str:
        return os.path.join(self.base, name)

    # -- save --------------------------------------------------------------
    def save(self, name: str, state: Any,
             metadata: Optional[dict] = None) -> str:
        """ASYNC save (SURVEY.md §5 failure-recovery row): device arrays are
        snapshotted to host, then serialization proceeds in background
        threads while training continues — the train loop only pays the
        device->host copy, not the disk write (measured stall removal in
        BASELINE.md). At most one save is in flight: a new save (or
        restore/exit) first drains the previous one. Orbax commits via
        atomic rename, so ``latest()`` never sees a partial checkpoint.
        """
        self.wait()  # serialize saves; orbax allows one in flight
        path = self.path(name)
        self._ckptr.save(path, state, force=True)
        if metadata is not None and jax.process_index() == 0:
            with open(os.path.join(self.base, f"{name}.meta.json"),
                      "w") as f:
                json.dump(metadata, f)
        return path

    def wait(self) -> None:
        """Block until any in-flight async save is durable on disk."""
        self._ckptr.wait_until_finished()

    # -- restore -----------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def restore(self, name: str, target: Any) -> Any:
        """Restore into the structure/shardings of ``target`` (a concrete
        state from ``Trainer.init_state`` or an abstract ShapeDtypeStruct
        tree with shardings)."""
        self.wait()  # the named checkpoint may still be in flight
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckptr.restore(self.path(name), abstract)

    def load_metadata(self, name: str) -> Optional[dict]:
        p = os.path.join(self.base, f"{name}.meta.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # -- resume discovery --------------------------------------------------
    def latest(self) -> Optional[str]:
        """Most advanced interval checkpoint name (epoch_N/step_N), if any.

        Ordered by the optimizer-step count recorded in each checkpoint's
        metadata (epoch_N and step_N numbers are not comparable to each
        other — a preemption ``step_40`` is later than ``epoch_3``); falls
        back to the name's N for checkpoints without metadata.
        """
        best_key, best_name = (-1, -1), None
        for entry in os.listdir(self.base):
            m = re.fullmatch(r"(epoch|step)_(\d+)", entry)
            if m and os.path.isdir(os.path.join(self.base, entry)):
                meta = self.load_metadata(entry) or {}
                key = (int(meta.get("steps", -1)), int(m.group(2)))
                if key > best_key:
                    best_key, best_name = key, entry
        return best_name
