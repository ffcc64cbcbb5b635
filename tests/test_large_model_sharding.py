"""Large-model (t5-3b / t5-11b) tensor-parallel sharding evidence.

The reference exposes t5-3b and t5-11b in its flag choices
(``/root/reference/modules/config.py:8-9``) but could never actually run
them — replicate-everything DDP (``/root/reference/train.py:26``) needs the
full model + Adam moments per GPU (~11B params x 16 bytes ≈ 176 GB). The
TPU build's partitioning rules (parallel/partitioning.py) must therefore
prove two things at these geometries:

  1. every large tensor is actually sharded (a rule that silently misses a
     path replicates an 11B-scale weight per chip), and
  2. the per-device bytes of params + Adam moments fit real chip HBM for a
     concrete mesh (t5-3b on 8 chips, t5-11b on 32).

Everything runs abstractly (jax.eval_shape — no weights materialized), plus
one real lowering of the full sharded train step at t5-3b geometry on the
8-device virtual CPU mesh to show the SPMD partitioner accepts the specs.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from klab_multimodalmodel_tpu.config import Config
from klab_multimodalmodel_tpu.parallel.partitioning import (make_param_specs,
                                                            spec_for_path)
from klab_multimodalmodel_tpu.train import Trainer
from klab_multimodalmodel_tpu.train.optim import make_optimizer
from klab_multimodalmodel_tpu.utils import make_mesh


def _abstract_state(cfg: Config):
    """ShapeDtypeStruct pytree of (params, opt_state) — no allocation."""
    trainer = Trainer(cfg, mesh=None, num_epochs=1)

    def init_fn(rng):
        example = trainer.example_batch(2)
        from klab_multimodalmodel_tpu.data.image_ops import normalize_images
        variables = trainer.model.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(normalize_images(example["images"])),
            jnp.asarray(example["source_ids"]),
            jnp.asarray(example["target_ids"]),
            source_mask=jnp.asarray(example["source_mask"]),
            target_mask=jnp.asarray(example["target_mask"]))
        params = variables["params"]
        tx = make_optimizer(cfg, params, 1)
        return params, tx.init(params)

    return jax.eval_shape(init_fn, jax.random.PRNGKey(0))


def _sharded_bytes(shapes, specs, axis_sizes: dict) -> int:
    """Per-device bytes given PartitionSpecs and mesh axis sizes."""
    total = 0
    for leaf, spec in zip(jax.tree.leaves(shapes),
                          jax.tree.leaves(
                              specs, is_leaf=lambda x: isinstance(
                                  x, jax.sharding.PartitionSpec))):
        shape = list(leaf.shape)
        for dim, axes in enumerate(spec):
            if axes is None:
                continue
            for ax in ([axes] if isinstance(axes, str) else axes):
                shape[dim] = math.ceil(shape[dim] / axis_sizes.get(ax, 1))
        total += math.prod(shape) * leaf.dtype.itemsize if shape else (
            leaf.dtype.itemsize)
    return total


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [("/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path), leaf) for path, leaf in flat]


@pytest.mark.parametrize("model_name,mesh_axes,hbm_budget_gb,n_chips", [
    # t5-3b on a v5e-8: fsdp 2 x tensor 4.
    ("t5-3b", {"data": 1, "fsdp": 2, "tensor": 4}, 16.0, 8),
    # t5-11b on a v4-32 slice: fsdp 8 x tensor 4 (32 chips, 32 GB HBM each).
    ("t5-11b", {"data": 1, "fsdp": 8, "tensor": 4}, 32.0, 32),
    # flan-t5-xxl (11B, v1.1 recipe: gated wi_0/wi_1 MLPs + untied head)
    # on the same v4-32 layout — covers the gated-MLP partitioning rules
    # at scale.
    ("google/flan-t5-xxl", {"data": 1, "fsdp": 8, "tensor": 4}, 32.0, 32),
])
def test_large_geometry_fits_hbm(model_name, mesh_axes, hbm_budget_gb,
                                 n_chips):
    cfg = Config(language_model_name=model_name,
                 transformer_model_name=model_name,
                 max_source_length=64, max_target_length=32,
                 compute_dtype="bfloat16")
    params, opt_state = _abstract_state(cfg)

    # 1) Every big tensor must be sharded by at least one mesh axis.
    specs = make_param_specs(params)
    for path, leaf in _flatten_with_paths(params):
        spec = spec_for_path(path, leaf.ndim)
        n_elems = math.prod(leaf.shape) if leaf.shape else 1
        if n_elems >= 4 * 1024 * 1024:
            assert any(ax is not None for ax in spec), (
                f"{path} ({leaf.shape}) is replicated — a partitioning rule "
                "misses this path at large scale")

    # 2) Per-device params + Adam moments fit the chip HBM budget.
    tp, fs = mesh_axes["tensor"], mesh_axes["fsdp"]
    t5 = cfg.transformer_t5
    assert t5.num_heads % tp == 0 and t5.d_ff % tp == 0
    param_bytes = _sharded_bytes(params, specs, mesh_axes)
    opt_specs = make_param_specs(opt_state)
    opt_bytes = _sharded_bytes(opt_state, opt_specs, mesh_axes)
    per_device_gb = (param_bytes + opt_bytes) / 2**30
    # Leave >= 40% of HBM for activations/workspace.
    assert per_device_gb < 0.6 * hbm_budget_gb, (
        f"{model_name}: {per_device_gb:.1f} GB state/device exceeds 60% of "
        f"{hbm_budget_gb} GB over {n_chips} chips")


def test_t5_3b_train_step_lowers_sharded():
    """The full t5-3b multimodal train step must lower through the SPMD
    partitioner on an (1,2,4) mesh — proves the specs are consistent (no
    shape-indivisible or conflicting-sharding errors), without compiling."""
    cfg = Config(language_model_name="t5-3b",
                 transformer_model_name="t5-3b",
                 max_source_length=64, max_target_length=32,
                 batch_size=1, compute_dtype="bfloat16",
                 mesh_shape=(1, 2, 4), scan_unroll=1, data_dir="synthetic")
    mesh = make_mesh((1, 2, 4))
    trainer = Trainer(cfg, mesh, num_epochs=1)

    def init_fn(rng):
        example = trainer.example_batch(2)
        from klab_multimodalmodel_tpu.data.image_ops import normalize_images
        from klab_multimodalmodel_tpu.train.trainer import TrainState
        variables = trainer.model.init(
            {"params": rng, "dropout": rng},
            jnp.asarray(normalize_images(example["images"])),
            jnp.asarray(example["source_ids"]),
            jnp.asarray(example["target_ids"]),
            source_mask=jnp.asarray(example["source_mask"]),
            target_mask=jnp.asarray(example["target_mask"]))
        params = variables["params"]
        tx = make_optimizer(cfg, params, 1)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=tx.init(params))

    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    from klab_multimodalmodel_tpu.parallel.partitioning import make_shardings
    trainer.state_specs = make_param_specs(shapes)
    trainer.state_shardings = make_shardings(trainer.state_specs, mesh)
    trainer.tx = make_optimizer(cfg, shapes.params, 1)

    step = trainer.make_train_step()
    B = 8
    S = cfg.swin.image_size
    batch_shapes = {
        "images": jax.ShapeDtypeStruct((B, S, S, 3), np.uint8),
        "source_ids": jax.ShapeDtypeStruct((B, cfg.max_source_length),
                                           np.int32),
        "source_mask": jax.ShapeDtypeStruct((B, cfg.max_source_length),
                                            np.int32),
        "target_ids": jax.ShapeDtypeStruct((B, cfg.max_target_length),
                                           np.int32),
        "target_mask": jax.ShapeDtypeStruct((B, cfg.max_target_length),
                                            np.int32),
    }
    rng_shape = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    lowered = step.lower(shapes, batch_shapes, rng_shape)
    hlo = lowered.as_text()
    assert "sharding" in hlo  # SPMD annotations made it into the module


def test_moe_8expert_fits_hbm_on_expert_mesh():
    """BASELINE.md's 8-expert row ends at "OOM on one chip — the case the
    ``expert`` axis exists for". Prove the claim the way the t5-3b/11b
    cases do: t5-large + 8-expert Switch MoE (~4.0B params) on an 8-chip
    v5e (fsdp 2 x expert 4), every expert tensor sharded over ``expert``,
    per-chip params + Adam moments inside the HBM budget."""
    cfg = Config(language_model_name="t5-large",
                 transformer_model_name="t5-large",
                 max_source_length=64, max_target_length=32,
                 compute_dtype="bfloat16", moe_experts=8)
    params, opt_state = _abstract_state(cfg)
    total = sum(math.prod(l.shape) for l in jax.tree.leaves(params))
    assert total > 3e9, f"MoE geometry shrank ({total/1e9:.1f}B params)"

    # 1) Every expert weight is sharded on the expert axis (and its Adam
    #    moments inherit the same suffix-matched spec).
    expert_leaves = [(p, l) for p, l in _flatten_with_paths(params)
                     if "experts_w" in p]
    assert len(expert_leaves) == 4  # {enc,dec} x {wi,wo}, scanned stacks
    for path, leaf in expert_leaves:
        spec = spec_for_path(path, leaf.ndim)
        flat_axes = [ax for axes in spec if axes is not None
                     for ax in ([axes] if isinstance(axes, str) else axes)]
        assert "expert" in flat_axes, f"{path}: {spec}"

    # 2) Per-chip bytes fit a 16 GB chip with >= 40% left for activations.
    mesh_axes = {"data": 1, "fsdp": 2, "tensor": 1, "expert": 4}
    specs = make_param_specs(params)
    param_bytes = _sharded_bytes(params, specs, mesh_axes)
    opt_bytes = _sharded_bytes(opt_state, make_param_specs(opt_state),
                               mesh_axes)
    per_device_gb = (param_bytes + opt_bytes) / 2**30
    assert per_device_gb < 0.6 * 16.0, (
        f"8-expert t5-large: {per_device_gb:.1f} GB state/device on "
        f"8 chips exceeds 60% of 16 GB")
    # And the unsharded state genuinely does NOT fit one chip — the row's
    # premise.
    unsharded_gb = (_sharded_bytes(params, specs, {})
                    + _sharded_bytes(opt_state,
                                     make_param_specs(opt_state), {})) / 2**30
    assert unsharded_gb > 16.0
