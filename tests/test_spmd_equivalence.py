"""SPMD correctness: the compiled train step must produce identical results
regardless of mesh factorization — (8,1,1) DP, (2,2,2) DP+FSDP+TP, and
(1,4,2) FSDP+TP must all equal the single-device result on the same batch.
This is the numerical guarantee behind 'sharding annotations, not explicit
collectives' (SURVEY.md §2D / §5 distributed rows)."""

import numpy as np
import pytest

import jax

from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                             register_swin_size,
                                             register_t5_size)
from klab_multimodalmodel_tpu.data import DataLoader, SyntheticCaptionDataset
from klab_multimodalmodel_tpu.text import ByteTokenizer
from klab_multimodalmodel_tpu.train import Trainer
from klab_multimodalmodel_tpu.utils import make_mesh

register_t5_size("t5-spmd-micro", T5Size(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
    num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
    relative_attention_max_distance=16, dropout_rate=0.0))
register_swin_size("swin-spmd-micro", SwinV2Size(
    image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
    num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    pretrained_window_sizes=(0, 0)))


def _run(mesh_shape, devices=None, steps=2, seq_attention="allgather"):
    cfg = Config(language_model_name="t5-spmd-micro",
                 transformer_model_name="t5-spmd-micro",
                 image_model_name="swin-spmd-micro",
                 max_source_length=48, max_target_length=24, batch_size=1,
                 compute_dtype="float32", mesh_shape=mesh_shape,
                 seq_attention=seq_attention,
                 scan_unroll=1, data_dir="synthetic")
    mesh = make_mesh(mesh_shape, devices=devices)
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)
    ds = SyntheticCaptionDataset(n=16, image_size=32)
    loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                        max_source_length=48, max_target_length=24,
                        shuffle=False, seed=0)
    losses = []
    it = iter(loader)
    for _ in range(steps):
        batch = next(it)
        db = trainer.device_put_batch(batch)
        # dropout_rate is 0 in the micro sizes -> rng value is irrelevant
        state, loss = trainer.train_step(state, db, jax.random.PRNGKey(7))
        losses.append(float(loss))
    params = jax.device_get(state.params)
    return losses, params


@pytest.mark.slow
def test_sequence_parallel_mesh_agrees():
    """Sequence/context parallelism (SURVEY.md §2D SP/CP row): sharding the
    activation sequence dim over the ``seq`` mesh axis (models/t5.py
    ``seq_constraint``) must be numerically invisible. (2,1,1,4) = DP x SP;
    (1,1,1,8) = pure SP (batch replicated, every token row split 8 ways —
    the long-context layout). Collective binding is separately pinned by
    test_seq_axis_inserts_collectives."""
    base_losses, base_params = _run((1, 1, 1), devices=jax.devices()[:1])
    for mesh_shape in [(2, 1, 1, 4), (1, 1, 1, 8)]:
        losses, params = _run(mesh_shape)
        np.testing.assert_allclose(losses, base_losses, rtol=2e-5,
                                   err_msg=f"loss mismatch on {mesh_shape}")
        base_flat = {jax.tree_util.keystr(k): v for k, v in
                     jax.tree_util.tree_leaves_with_path(base_params)}
        flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(params)}
        for key in base_flat:
            np.testing.assert_allclose(
                base_flat[key], flat[key], rtol=5e-4, atol=1e-6,
                err_msg=f"param mismatch on {mesh_shape}: {key}")


@pytest.mark.slow
def test_ring_attention_train_equivalence():
    """--seq_attention ring on a DP x SP mesh: the full train step (three
    towers, cascade loss, Adam) with every T5 self-attention running the
    shard_map ring (ops/ring_attention.py) must match the single-device
    dense result."""
    base_losses, base_params = _run((1, 1, 1), devices=jax.devices()[:1])
    losses, params = _run((2, 1, 1, 4), seq_attention="ring")
    np.testing.assert_allclose(losses, base_losses, rtol=2e-5)
    base_flat = {jax.tree_util.keystr(k): v for k, v in
                 jax.tree_util.tree_leaves_with_path(base_params)}
    flat = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(params)}
    for key in base_flat:
        np.testing.assert_allclose(
            base_flat[key], flat[key], rtol=5e-4, atol=1e-6,
            err_msg=f"ring param mismatch: {key}")


def test_ring_attention_wide_data_axis():
    """Regression: data*fsdp > 2 with ring attention. init_state traces the
    model on a tiny 2-row example batch that does NOT divide the (data,
    fsdp) axes the ring shard_map splits over — ring_applicable must gate
    on batch divisibility and fall back to dense there (identical params),
    while real divisible train batches still take the ring path."""
    base_losses, _ = _run((1, 1, 1), devices=jax.devices()[:1])
    losses, _ = _run((4, 1, 1, 2), seq_attention="ring")
    np.testing.assert_allclose(losses, base_losses, rtol=2e-5)


def test_seq_axis_inserts_collectives():
    """A pure-SP mesh (1,1,1,8) must actually partition: with every other
    axis 1, a no-op seq constraint would compile to zero collectives (all
    arrays replicated), so collectives in the compiled step prove the
    activations are sequence-sharded."""
    from klab_multimodalmodel_tpu.config import Config
    from klab_multimodalmodel_tpu.train import Trainer

    cfg = Config(language_model_name="t5-spmd-micro",
                 transformer_model_name="t5-spmd-micro",
                 image_model_name="swin-spmd-micro",
                 max_source_length=48, max_target_length=24, batch_size=1,
                 compute_dtype="float32", mesh_shape=(1, 1, 1, 8),
                 scan_unroll=1, data_dir="synthetic")
    mesh = make_mesh((1, 1, 1, 8))
    trainer = Trainer(cfg, mesh, num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)
    step = trainer.make_train_step()
    db = trainer.device_put_batch(trainer.example_batch(8))
    compiled = step.lower(state, db, jax.random.PRNGKey(7)).compile()
    txt = compiled.as_text()
    n_collectives = (txt.count("all-gather") + txt.count("all-reduce")
                     + txt.count("collective-permute"))
    assert n_collectives > 0, "seq axis did not partition anything"


@pytest.mark.slow
def test_mesh_factorizations_agree():
    base_losses, base_params = _run((1, 1, 1), devices=jax.devices()[:1])
    for mesh_shape in [(8, 1, 1), (2, 2, 2), (1, 4, 2)]:
        losses, params = _run(mesh_shape)
        np.testing.assert_allclose(losses, base_losses, rtol=2e-5,
                                   err_msg=f"loss mismatch on {mesh_shape}")
        base_flat = {jax.tree_util.keystr(k): v for k, v in
                     jax.tree_util.tree_leaves_with_path(base_params)}
        flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(params)}
        assert base_flat.keys() == flat.keys()
        for key in base_flat:
            np.testing.assert_allclose(
                base_flat[key], flat[key], rtol=5e-4, atol=1e-6,
                err_msg=f"param mismatch on {mesh_shape}: {key}")
