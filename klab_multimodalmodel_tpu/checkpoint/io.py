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
the dense scanned-layer layout; :func:`load_pretrained_params` converts
the transformer on the fly when the target model differs: pipelined
targets (``--pipeline_stages``) get a pure reshape (bit-identical
weights), MoE targets (``--moe_experts``) get sparse upcycling — every
expert initialized as a copy of the dense MLP, router fresh
(``models/t5.py:upcycle_t5_params``).
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
    # Layout-mismatched transformer (pipelined target + dense checkpoint,
    # or MoE target + dense checkpoint — sparse upcycling): restore the
    # transformer in the checkpoint's own (dense) layout, then convert.
    pipelined_tr = ("transformer" in target
                    and "pipeline" in target["transformer"].get(
                        "encoder", {}))
    moe_tr = (_transformer_moe(target.get("transformer"))
              and not _transformer_moe(saved.get("transformer")))
    saved_dense = "layers" in saved.get("transformer", {}).get("encoder", {})
    if (pipelined_tr or moe_tr) and saved_dense:
        dense_abs = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype),
            saved["transformer"])
        sh0 = jax.tree.leaves(params)[0].sharding
        if hasattr(sh0, "mesh"):  # attach mesh shardings when SPMD-placed
            from ..parallel.partitioning import (make_param_specs,
                                                 make_shardings)

            dense_sh = make_shardings(make_param_specs(dense_abs), sh0.mesh)
            dense_abs = jax.tree.map(
                lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                                   sharding=sh),
                dense_abs, dense_sh)
        target["transformer"] = dense_abs
    restored = ckptr.restore(p, target)
    restored_tr = restored.get("transformer", {})
    if moe_tr and not _transformer_moe(restored_tr):
        from ..models.t5 import upcycle_t5_params

        conv = upcycle_t5_params(restored_tr, params["transformer"])
        ref_shardings = jax.tree.map(lambda x: x.sharding,
                                     params["transformer"])
        restored["transformer"] = jax.device_put(conv, ref_shardings)
    elif pipelined_tr and "pipeline" not in restored_tr.get("encoder", {}):
        from ..models.t5 import pipeline_t5_params

        stages = jax.tree.leaves(
            params["transformer"]["encoder"]["pipeline"])[0].shape[0]
        conv = pipeline_t5_params(restored_tr, stages)
        ref_shardings = jax.tree.map(lambda x: x.sharding,
                                     params["transformer"])
        restored["transformer"] = jax.device_put(conv, ref_shardings)
    return {**params, **restored}


def _transformer_moe(tr) -> bool:
    """True if a transformer param(-like) tree is in the MoE layout
    (expert-axis MLPs, ``models/t5.py:T5MoeMlp``)."""
    if not isinstance(tr, dict):
        return False
    enc = tr.get("encoder")
    if not isinstance(enc, dict):
        return False
    block = enc.get("layers", {}).get("block")
    return isinstance(block, dict) and "experts_wi" in block.get("mlp", {})


def _transformer_layout_stages(params) -> Optional[int]:
    """Pipeline layout of a param(-like) tree's transformer: 1 = dense
    scanned layers, S = pipelined with S stages, None = no transformer
    stack found. Works on arrays, ShapeDtypeStructs, and orbax metadata
    leaves (anything with ``.shape``)."""
    if not isinstance(params, dict):
        return None
    tr = params.get("transformer")
    if not isinstance(tr, dict):
        return None
    enc = tr.get("encoder")
    if not isinstance(enc, dict):
        return None
    if "pipeline" in enc:
        leaves = jax.tree.leaves(
            enc["pipeline"], is_leaf=lambda x: hasattr(x, "shape"))
        return int(leaves[0].shape[0])
    return 1 if "layers" in enc else None


def _convert_transformer_layout(node: Any, to_stages: int) -> Any:
    """Walk any state pytree (params dicts, optax namedtuple chains, Adam
    mu/nu trees — everything whose structure mirrors params) and re-layout
    each embedded transformer tree to ``to_stages``. Pure reshapes;
    layout-matching subtrees pass through untouched."""
    from ..models.t5 import pipeline_t5_params, unpipeline_t5_params

    def conv(tr):
        cur = _transformer_layout_stages({"transformer": tr}) or 1
        if cur == to_stages:
            return tr
        if cur > 1:  # any pipelined layout -> dense first (pure reshape)
            tr = unpipeline_t5_params(tr)
        if to_stages > 1:
            tr = pipeline_t5_params(tr, to_stages)
        return tr

    def walk(n):
        if isinstance(n, dict):
            return {k: (conv(v) if k == "transformer"
                        and isinstance(v, dict) and "encoder" in v
                        else walk(v))
                    for k, v in n.items()}
        if isinstance(n, tuple) and hasattr(n, "_fields"):
            return type(n)(*(walk(v) for v in n))
        if isinstance(n, (tuple, list)):
            return type(n)(walk(v) for v in n)
        return n

    if hasattr(node, "params") and hasattr(node, "replace"):  # TrainState
        return node.replace(params=walk(node.params),
                            opt_state=walk(node.opt_state))
    return walk(node)


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
        tree with shardings).

        Elastic restart across PIPELINE topologies (the pipeline analogue
        of the cross-process-count resume): when the checkpoint's
        transformer layout (dense scanned layers, or S pipeline stages for
        any S — including S -> S' restages) differs from the target's, the
        full state — params AND optimizer moments — is restored in the
        checkpoint's own layout and reshaped into the target's (a
        bit-exact relayout via the dense intermediate). With dropout off the
        resumed run's losses continue exactly; with dropout on, the
        per-layer RNG folding differs between layouts, like any attention
        -backend swap (tests/test_pipeline_parallel.py pins the dropout
        -free equivalence in both directions).
        """
        self.wait()  # the named checkpoint may still be in flight
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        saved_stages = self._saved_layout_stages(name)
        tgt_params = getattr(target, "params",
                             target.get("params")
                             if isinstance(target, dict) else None)
        tgt_stages = _transformer_layout_stages(tgt_params)
        saved_moe = self._saved_moe(name)
        tgt_moe = (tgt_params is not None
                   and _transformer_moe(tgt_params.get("transformer")))
        if saved_moe is not None and saved_moe != tgt_moe:
            raise ValueError(
                f"checkpoint {name} is {'MoE' if saved_moe else 'dense'} "
                f"but the target model is {'MoE' if tgt_moe else 'dense'}: "
                "full-state resume cannot cross the dense/MoE boundary "
                "(expert optimizer moments have no dense counterpart). For "
                "dense -> MoE, sparse-upcycle the params with "
                "--init_checkpoint (fresh optimizer), per Komatsuzaki et "
                "al. 2023.")
        if (saved_stages is None or tgt_stages is None
                or saved_stages == tgt_stages):
            return self._ckptr.restore(self.path(name), abstract)

        from ..parallel.partitioning import (make_param_specs,
                                             make_shardings)

        mesh = jax.tree.leaves(abstract)[0].sharding.mesh
        inter = _convert_transformer_layout(abstract, saved_stages)
        shardings = make_shardings(make_param_specs(inter), mesh)
        inter = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                               sharding=sh),
            inter, shardings)
        restored = self._ckptr.restore(self.path(name), inter)
        conv = _convert_transformer_layout(restored, tgt_stages)
        return jax.tree.map(lambda v, t: jax.device_put(v, t.sharding),
                            conv, abstract)

    def _saved_layout_stages(self, name: str) -> Optional[int]:
        params = self._saved_params_meta(name)
        return _transformer_layout_stages(params)

    def _saved_moe(self, name: str) -> Optional[bool]:
        """Whether the saved transformer is MoE; None if undeterminable."""
        params = self._saved_params_meta(name)
        if not isinstance(params, dict) or "transformer" not in params:
            return None
        return _transformer_moe(params["transformer"])

    def _saved_params_meta(self, name: str):
        try:
            meta = self._ckptr.metadata(self.path(name)).item_metadata.tree
        except Exception:
            return None
        return meta.get("params") if isinstance(meta, dict) else None

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
                steps = meta.get("steps")
                # Missing metadata (failed sidecar write, partial rsync):
                # fall back to the name's N — exact for step_N, monotone
                # for epoch_N — NOT to -1, which would silently rank the
                # newest checkpoint below every older meta-bearing one.
                key = (int(steps) if steps is not None else int(m.group(2)),
                       int(m.group(2)))
                if key > best_key:
                    best_key, best_name = key, entry
        return best_name
