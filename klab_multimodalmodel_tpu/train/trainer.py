"""The jit-compiled training core: state, steps, sharding wiring.

TPU-native redesign of the reference's eager loop (``/root/reference/
train.py:50-82``): the whole step — device-side image normalization, three
towers forward, loss, backward, Adam update, gradient accumulation — is ONE
compiled XLA program per (train/eval). Gradient accumulation is a
``lax.scan`` over microbatches inside the step (the reference accumulates
across loader iterations and still all-reduces every microbatch,
``train.py:61-67``; here cross-device reduction happens once per update).

Sharding: params/opt-state follow ``parallel.partitioning`` rules; batches
are sharded over the data-like mesh axes; donated state keeps HBM flat.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..data.image_ops import normalize_images
from ..models.multimodal import MultiModalModel
from ..parallel.partitioning import make_param_specs, make_shardings
from ..utils.precision import get_policy
from .optim import make_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


@dataclasses.dataclass
class Trainer:
    """Owns the model, mesh, compiled steps, and sharded state."""

    config: Config
    mesh: Mesh
    num_epochs: int = 1

    def __post_init__(self):
        cfg = self.config
        policy = get_policy(cfg.compute_dtype, cfg.param_dtype)
        self.model = MultiModalModel(cfg, dtype=policy.compute_dtype)
        self.tx: Optional[optax.GradientTransformation] = None
        self._train_step = None
        self._eval_step = None

    # -- state creation ----------------------------------------------------
    def example_batch(self, local_batch: int) -> dict:
        cfg = self.config
        S = cfg.swin.image_size
        return {
            "images": np.zeros((local_batch, S, S, 3), np.uint8),
            "source_ids": np.zeros((local_batch, cfg.max_source_length),
                                   np.int32),
            "source_mask": np.ones((local_batch, cfg.max_source_length),
                                   np.int32),
            "target_ids": np.zeros((local_batch, cfg.max_target_length),
                                   np.int32),
            "target_mask": np.ones((local_batch, cfg.max_target_length),
                                   np.int32),
        }

    def init_state(self, rng: jax.Array, global_batch: int) -> TrainState:
        """Initialize params/opt-state directly into their shardings.

        ``global_batch`` is the per-update batch the caller will feed
        ``train_step``; it is validated against the mesh's batch axes here
        (fail-at-init instead of a shard_map/device_put error mid-run).
        State init itself traces a tiny shape-only example batch.
        """
        cfg = self.config
        dp = 1
        for axis in ("data", "fsdp"):
            dp *= self.mesh.shape.get(axis, 1)
        if global_batch % dp:
            raise ValueError(
                f"global batch {global_batch} not divisible by the mesh's "
                f"data x fsdp factor {dp} (mesh {dict(self.mesh.shape)})")
        # Tiny batch is enough for shapes — but the pipelined stack splits
        # the batch into M microbatches at trace time, so the example must
        # be divisible by M (2 alone broke every pipeline config with M > 2).
        micro = 1
        if cfg.pipeline_stages > 1:
            micro = cfg.pipeline_microbatches or cfg.pipeline_stages
        example = self.example_batch(max(2, micro))

        def init_fn(rng):
            variables = self.model.init(
                {"params": rng, "dropout": rng},
                jnp.asarray(normalize_images(example["images"])),
                jnp.asarray(example["source_ids"]),
                jnp.asarray(example["target_ids"]),
                source_mask=jnp.asarray(example["source_mask"]),
                target_mask=jnp.asarray(example["target_mask"]))
            params = variables["params"]
            tx = make_optimizer(cfg, params, self.num_epochs)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=tx.init(params))

        shapes = jax.eval_shape(init_fn, rng)
        # One rule set covers the whole state: Adam mu/nu paths end with the
        # same suffixes as their params, so suffix-regex specs shard the
        # moments identically; scalars/counters fall through to replicated.
        self.state_specs = make_param_specs(shapes)
        self.state_shardings = make_shardings(self.state_specs, self.mesh)
        with self.mesh:
            state = jax.jit(init_fn,
                            out_shardings=self.state_shardings)(rng)
        # The tx used inside steps must match the one init'd from shapes.
        self.tx = make_optimizer(cfg, shapes.params, self.num_epochs)
        state = self._maybe_cast_frozen(state)
        return state

    def _maybe_cast_frozen(self, state: TrainState) -> TrainState:
        """Store frozen towers in bf16 when configured (they feed bf16
        compute and take no updates, so this is numerically identical)."""
        cfg = self.config
        if cfg.frozen_param_dtype == "float32":
            return state
        from .optim import trainable_labels

        labels = trainable_labels(state.params, cfg)
        target = (jnp.bfloat16 if cfg.frozen_param_dtype == "bfloat16"
                  else jnp.float32)
        params = jax.tree.map(
            lambda p, lbl: p.astype(target) if lbl == "frozen" else p,
            state.params, labels)
        return TrainState(step=state.step, params=params,
                          opt_state=state.opt_state)

    # -- compiled steps ----------------------------------------------------
    def _loss_fn(self, params, batch, dropout_rng, deterministic: bool):
        cfg = self.config
        rngs = None if deterministic else {"dropout": dropout_rng}
        if "image_features" in batch:
            # Frozen-feature cache path: the tower forwards were precomputed
            # (cache_frozen_features); bit-identical loss. language_features
            # is present only for static-source datasets.
            out = self.model.apply(
                {"params": params}, batch["image_features"],
                batch["source_ids"], batch["target_ids"],
                source_mask=batch["source_mask"],
                target_mask=batch["target_mask"],
                language_features=batch.get("language_features"),
                deterministic=deterministic, rngs=rngs,
                method="loss_from_image_features")
            return out.loss
        images = normalize_images(
            batch["images"],
            dtype=get_policy(cfg.compute_dtype).compute_dtype)
        out = self.model.apply(
            {"params": params}, images, batch["source_ids"],
            batch["target_ids"], source_mask=batch["source_mask"],
            target_mask=batch["target_mask"], deterministic=deterministic,
            rngs=rngs)
        return out.loss

    def _features_then_loss(self, params, batch, dropout_rng,
                            deterministic: bool):
        """(loss, (img_feats, lang_feats)): frozen tower forwards surfaced
        as aux outputs so the train loop can fill the frozen-feature caches
        for free."""
        cfg = self.config
        images = normalize_images(
            batch["images"],
            dtype=get_policy(cfg.compute_dtype).compute_dtype)
        img_feats = self.model.apply({"params": params}, images,
                                     method="image_features")
        lang_feats = self.model.apply({"params": params},
                                      batch["source_ids"],
                                      batch["source_mask"],
                                      method="language_features")
        fbatch = {k: v for k, v in batch.items() if k != "images"}
        fbatch["image_features"] = img_feats
        fbatch["language_features"] = lang_feats
        loss = self._loss_fn(params, fbatch, dropout_rng, deterministic)
        return loss, (img_feats, lang_feats)

    def make_train_step(self, with_features: bool = False):
        cfg = self.config
        accum = max(cfg.accumulation_steps, 1)

        def train_step(state: TrainState, batch: dict, dropout_rng):
            def microbatch_grads(rng, mb):
                if with_features:
                    (loss, feats), grads = jax.value_and_grad(
                        self._features_then_loss, has_aux=True)(
                            state.params, mb, rng, False)
                else:
                    loss, grads = jax.value_and_grad(self._loss_fn)(
                        state.params, mb, rng, False)
                    feats = None
                return loss, grads, feats

            if accum == 1:
                loss, grads, feats = microbatch_grads(dropout_rng, batch)
            else:
                # (A*b, ...) -> (A, b, ...) and scan-accumulate.
                def split(x):
                    return x.reshape((accum, x.shape[0] // accum)
                                     + x.shape[1:])
                mbs = jax.tree.map(split, batch)
                rngs = jax.random.split(dropout_rng, accum)

                def body(carry, xs):
                    rng, mb = xs
                    loss, grads, feats = microbatch_grads(rng, mb)
                    acc_loss, acc_grads = carry
                    return (acc_loss + loss,
                            jax.tree.map(jnp.add, acc_grads, grads)), feats

                zero = (jnp.zeros(()),
                        jax.tree.map(jnp.zeros_like, state.params))
                (loss_sum, grad_sum), feats = jax.lax.scan(
                    body, zero, (rngs, mbs))
                loss = loss_sum / accum
                grads = jax.tree.map(lambda g: g / accum, grad_sum)
                if with_features:  # each: (A, b, T, D) -> (A*b, T, D)
                    feats = jax.tree.map(
                        lambda f: f.reshape((-1,) + f.shape[2:]), feats)

            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(step=state.step + 1, params=new_params,
                                   opt_state=new_opt)
            if with_features:
                return new_state, loss, feats
            return new_state, loss

        batch_sharding = NamedSharding(self.mesh, P(("data", "fsdp")))
        scalar = NamedSharding(self.mesh, P())
        out_shardings = ((self.state_shardings, scalar, batch_sharding)
                         if with_features
                         else (self.state_shardings, scalar))
        return self._with_mesh(jax.jit(
            train_step,
            in_shardings=(self.state_shardings, batch_sharding, scalar),
            out_shardings=out_shardings,
            donate_argnums=(0,)))

    def make_eval_step(self, with_features: bool = False):
        def eval_step(params, batch):
            if with_features:
                return self._features_then_loss(params, batch, None, True)
            return self._loss_fn(params, batch, None, True)

        batch_sharding = NamedSharding(self.mesh, P(("data", "fsdp")))
        scalar = NamedSharding(self.mesh, P())
        return self._with_mesh(jax.jit(
            eval_step,
            in_shardings=(self.state_shardings.params, batch_sharding),
            out_shardings=(scalar, batch_sharding) if with_features
            else scalar))

    def _with_mesh(self, fn):
        """Run a compiled step inside the mesh context manager.

        ``seq_constraint`` (sequence parallelism) resolves bare
        ``PartitionSpec``s against the AMBIENT mesh at trace time; entering
        the context on every call keeps the first (tracing) call correct no
        matter where the loop invokes the step from. Steady-state cost is a
        context-manager enter/exit per step — nanoseconds against a
        multi-ms step.
        """
        return _MeshStep(fn, self.mesh)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        return self._eval_step

    @property
    def train_step_with_features(self):
        if getattr(self, "_train_step_f", None) is None:
            self._train_step_f = self.make_train_step(with_features=True)
        return self._train_step_f

    @property
    def eval_step_with_features(self):
        if getattr(self, "_eval_step_f", None) is None:
            self._eval_step_f = self.make_eval_step(with_features=True)
        return self._eval_step_f

    # -- device->host batch readback ---------------------------------------
    @staticmethod
    def host_local_rows(arr) -> np.ndarray:
        """This host's rows of a batch-sharded global array, in row order.

        The multi-process complement of ``device_put_batch``: a global
        (global_batch, ...) array sharded over the data-like axes cannot be
        ``device_get`` across processes — each host reads back exactly the
        rows it contributed (feature-cache writeback). Tensor-axis replicas
        duplicate row ranges; deduped by start offset.
        """
        seen: dict[int, np.ndarray] = {}
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            if start not in seen:
                seen[start] = np.asarray(s.data)
        return np.concatenate([seen[k] for k in sorted(seen)])

    # -- host->device batch transfer --------------------------------------
    def device_put_batch(self, batch: dict) -> dict:
        sharding = NamedSharding(self.mesh, P(("data", "fsdp")))
        if jax.process_count() > 1:
            return {k: jax.make_array_from_process_local_data(
                sharding, np.asarray(v)) for k, v in batch.items()}
        return {k: jax.device_put(np.asarray(v), sharding)
                for k, v in batch.items()}


class _MeshStep:
    """Callable proxy over a jitted step that enters the mesh context.

    Every trace-inducing jit attribute (``lower``/``trace``/``eval_shape``)
    is wrapped to run INSIDE the mesh context: the step body's
    ``*_constraint`` helpers (seq/pipe/tick/expert) silently no-op without
    an ambient mesh, so a bare-forwarded trace would produce a program
    missing those shardings — not the one ``step(...)`` runs. Other
    attributes forward untouched.
    """

    _TRACING = ("lower", "trace", "eval_shape")

    def __init__(self, fn, mesh):
        self._fn = fn
        self._mesh = mesh

    def __call__(self, *args, **kwargs):
        with self._mesh:
            return self._fn(*args, **kwargs)

    def __getattr__(self, name):
        attr = getattr(self._fn, name)
        if name in self._TRACING and callable(attr):
            def inside_mesh(*args, **kwargs):
                with self._mesh:
                    return attr(*args, **kwargs)
            return inside_mesh
        return attr
