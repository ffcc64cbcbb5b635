"""Pipeline parallelism (GPipe over the ``pipe`` mesh axis) correctness.

The pipelined stack (models/t5.py ``_PipelineTicks``) must compute exactly
what the plain scanned stack computes — same logits, same loss, same
parameter gradients — because the schedule only re-orders WHEN each
microbatch meets each layer, never WHAT is computed. Weights are carried
across via :func:`pipeline_t5_params` (a pure reshape), so every
comparison here is against bit-identical parameters.

Covers: the schedule semantics on one device (no mesh), the sharded
execution on a (data, fsdp, pipe) mesh including the collective-permute
lowering of the stage shift, and the full Trainer path (three towers,
cascade loss, Adam) with converted-in dense weights.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                             register_swin_size,
                                             register_t5_size)
from klab_multimodalmodel_tpu.data import DataLoader, SyntheticCaptionDataset
from klab_multimodalmodel_tpu.models.t5 import (T5ForConditionalGeneration,
                                                pipeline_t5_params,
                                                unpipeline_t5_params)
from klab_multimodalmodel_tpu.text import ByteTokenizer
from klab_multimodalmodel_tpu.train import Trainer
from klab_multimodalmodel_tpu.utils import make_mesh

SIZE = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=4,
              num_decoder_layers=4, num_heads=4, vocab_size=128,
              relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)

register_t5_size("t5-pipe-micro", T5Size(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
    num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
    relative_attention_max_distance=16, dropout_rate=0.0))
register_swin_size("swin-pipe-micro", SwinV2Size(
    image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
    num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    pretrained_window_sizes=(0, 0)))


def _t5_inputs(seed=0, B=8, Ls=16, Lt=12):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(3, SIZE.vocab_size, (B, Ls)))
    mask = jnp.asarray((rng.rand(B, Ls) > 0.2).astype(np.float32))
    labels = jnp.asarray(rng.randint(3, SIZE.vocab_size, (B, Lt)))
    return ids, mask, labels


def _flat(tree):
    return {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(tree)}


def test_pipeline_params_roundtrip():
    ids, mask, labels = _t5_inputs()
    dense = T5ForConditionalGeneration(SIZE)
    params = dense.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]
    back = unpipeline_t5_params(pipeline_t5_params(params, 2))
    fa, fb = _flat(params), _flat(back)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)


@pytest.mark.slow
def test_pipeline_schedule_matches_dense():
    """Schedule semantics on one device (no pipe mesh): logits and grads of
    the S=2/M=4 pipelined model equal the scanned stack's on the SAME
    (reshaped) weights. Also pins the param-tree layout: a fresh pipelined
    init must produce exactly the shapes pipeline_t5_params emits."""
    ids, mask, labels = _t5_inputs()
    dense = T5ForConditionalGeneration(SIZE)
    params = dense.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]
    piped = T5ForConditionalGeneration(SIZE, pipeline_stages=2,
                                       pipeline_microbatches=4)
    pparams = pipeline_t5_params(params, 2)
    init_p = piped.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]
    assert (jax.tree.map(jnp.shape, init_p)
            == jax.tree.map(jnp.shape, pparams))

    def loss_and_logits(model, p):
        out = model.apply({"params": p}, input_ids=ids, attention_mask=mask,
                          labels=labels)
        return out.loss, out.logits

    (loss_d, logits_d), grads_d = jax.value_and_grad(
        lambda p: loss_and_logits(dense, p), has_aux=True)(params)
    (loss_p, logits_p), grads_p = jax.value_and_grad(
        lambda p: loss_and_logits(piped, p), has_aux=True)(pparams)
    np.testing.assert_allclose(float(loss_p), float(loss_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_d),
                               rtol=2e-5, atol=2e-6)
    fd, fp = _flat(grads_d), _flat(unpipeline_t5_params(grads_p))
    assert set(fd) == set(fp)
    for k in fd:
        np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(fd[k]),
                                   rtol=5e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_pipeline_trainer_matches_dense():
    """Full train path on a (2,2,1,1,2) mesh (DP x FSDP x PP): two Adam
    steps of the pipelined three-tower model, started from the dense run's
    converted weights, must reproduce the dense (1,1,1) run's losses and
    final transformer params."""

    def build(mesh_shape, stages, devices=None):
        cfg = Config(language_model_name="t5-pipe-micro",
                     transformer_model_name="t5-pipe-micro",
                     image_model_name="swin-pipe-micro",
                     max_source_length=48, max_target_length=24,
                     batch_size=1, compute_dtype="float32",
                     mesh_shape=mesh_shape, pipeline_stages=stages,
                     pipeline_microbatches=2 if stages > 1 else 0,
                     scan_unroll=1, data_dir="synthetic")
        mesh = make_mesh(mesh_shape, devices=devices)
        trainer = Trainer(cfg, mesh, num_epochs=1)
        state = trainer.init_state(jax.random.PRNGKey(0), 8)
        return trainer, state

    def run(trainer, state, steps=2):
        ds = SyntheticCaptionDataset(n=16, image_size=32)
        loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                            max_source_length=48, max_target_length=24,
                            shuffle=False, seed=0)
        losses, it = [], iter(loader)
        for _ in range(steps):
            db = trainer.device_put_batch(next(it))
            state, loss = trainer.train_step(state, db,
                                             jax.random.PRNGKey(7))
            losses.append(float(loss))
        return losses, jax.device_get(state.params)

    dense_tr, dense_state = build((1, 1, 1), 1, devices=jax.devices()[:1])
    dense_params = jax.device_get(dense_state.params)
    dense_losses, dense_final = run(dense_tr, dense_state)

    pipe_tr, pipe_state = build((2, 2, 1, 1, 2), 2)
    conv = dict(dense_params)
    conv["transformer"] = pipeline_t5_params(dense_params["transformer"], 2)
    conv = jax.device_put(conv, pipe_tr.state_shardings.params)
    pipe_state = dataclasses.replace(
        pipe_state, params=conv, opt_state=pipe_tr.tx.init(conv))

    # The stage shift must lower to a collective-permute over the pipe axis.
    ds = SyntheticCaptionDataset(n=16, image_size=32)
    loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                        max_source_length=48, max_target_length=24,
                        shuffle=False, seed=0)
    db = pipe_tr.device_put_batch(next(iter(loader)))
    hlo = pipe_tr.train_step.lower(
        pipe_state, db, jax.random.PRNGKey(7)).compile().as_text()
    assert "collective-permute" in hlo, "stage shift did not lower to ICI"

    pipe_losses, pipe_final = run(pipe_tr, pipe_state)
    np.testing.assert_allclose(pipe_losses, dense_losses, rtol=2e-5)
    pipe_final = dict(pipe_final)
    pipe_final["transformer"] = unpipeline_t5_params(
        pipe_final["transformer"])
    fd, fp = _flat(dense_final), _flat(pipe_final)
    assert set(fd) == set(fp)
    for k in fd:
        np.testing.assert_allclose(np.asarray(fp[k]), np.asarray(fd[k]),
                                   rtol=5e-4, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_cross_pipeline_topology_resume(tmp_path):
    """Elastic restart across pipeline topologies: a checkpoint saved by a
    dense (stages=1) run restores into a pipelined (stages=2) trainer —
    params AND Adam moments relayouted bit-exactly — and vice versa; the
    continued losses match the uninterrupted dense run in both cases
    (micro sizes are dropout-free)."""
    from klab_multimodalmodel_tpu.checkpoint.io import CheckpointManager

    def build(stages, devices=None):
        cfg = Config(language_model_name="t5-pipe-micro",
                     transformer_model_name="t5-pipe-micro",
                     image_model_name="swin-pipe-micro",
                     max_source_length=48, max_target_length=24,
                     batch_size=1, compute_dtype="float32",
                     mesh_shape=(2, 2, 1, 1, 2) if stages > 1
                     else (-1, 1, 1),
                     pipeline_stages=stages,
                     pipeline_microbatches=2 if stages > 1 else 0,
                     scan_unroll=1, data_dir="synthetic")
        trainer = Trainer(cfg, make_mesh(cfg.mesh_shape, devices=devices),
                          num_epochs=1)
        return trainer, trainer.init_state(jax.random.PRNGKey(0), 8)

    def batches(n):
        ds = SyntheticCaptionDataset(n=32, image_size=32)
        loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                            max_source_length=48, max_target_length=24,
                            shuffle=False, seed=0)
        it = iter(loader)
        return [next(it) for _ in range(n)]

    bs = batches(3)
    dense_tr, dense_state = build(1)
    dense_state, _ = dense_tr.train_step(
        dense_state, dense_tr.device_put_batch(bs[0]), jax.random.PRNGKey(7))
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save("step_1", dense_state)
    ckpt.wait()
    # train_step donates its input state — snapshot the saved params to
    # host before the oracle continuation consumes the buffers.
    dense_params_host = jax.device_get(dense_state.params)

    # Uninterrupted dense continuation = the oracle.
    oracle_losses = []
    st = dense_state
    for b in bs[1:]:
        st, loss = dense_tr.train_step(st, dense_tr.device_put_batch(b),
                                       jax.random.PRNGKey(7))
        oracle_losses.append(float(loss))

    # dense checkpoint -> pipelined trainer.
    pipe_tr, pipe_state = build(2)
    restored = ckpt.restore("step_1", pipe_state)
    assert "pipeline" in jax.device_get(
        restored.params)["transformer"]["encoder"]
    want_params = pipeline_t5_params(dense_params_host["transformer"], 2)
    got_params = jax.device_get(restored.params)["transformer"]
    for k, v in _flat(want_params).items():
        np.testing.assert_array_equal(np.asarray(_flat(got_params)[k]),
                                      np.asarray(v), err_msg=k)
    st = restored
    pipe_losses = []
    for b in bs[1:]:
        st, loss = pipe_tr.train_step(st, pipe_tr.device_put_batch(b),
                                      jax.random.PRNGKey(7))
        pipe_losses.append(float(loss))
    np.testing.assert_allclose(pipe_losses, oracle_losses, rtol=2e-5)
    pipe_final = st

    # pipelined checkpoint -> dense trainer (reverse direction).
    ckpt.save("step_3", pipe_final)
    ckpt.wait()
    dense2_tr, dense2_state = build(1)
    back = ckpt.restore("step_3", dense2_state)
    assert "layers" in jax.device_get(
        back.params)["transformer"]["encoder"]
    st2, loss2 = dense2_tr.train_step(
        back, dense2_tr.device_put_batch(bs[0]), jax.random.PRNGKey(7))
    assert np.isfinite(float(loss2))


@pytest.mark.slow
def test_pretrained_dense_checkpoint_into_pipelined_model(tmp_path):
    """--init_checkpoint with --pipeline_stages: the converter's dense
    scanned-layer checkpoint is re-laid out into the stage layout on load
    (checkpoint/io.py), bit-identical to pipeline_t5_params of the same
    weights."""
    import orbax.checkpoint as ocp

    from klab_multimodalmodel_tpu.checkpoint.io import load_pretrained_params

    def cfg(stages):
        return Config(language_model_name="t5-pipe-micro",
                      transformer_model_name="t5-pipe-micro",
                      image_model_name="swin-pipe-micro",
                      max_source_length=48, max_target_length=24,
                      batch_size=1, compute_dtype="float32",
                      mesh_shape=(2, 2, 1, 1, 2) if stages > 1
                      else (-1, 1, 1),
                      pipeline_stages=stages,
                      pipeline_microbatches=2 if stages > 1 else 0,
                      scan_unroll=1, data_dir="synthetic")

    dense_cfg = cfg(1)
    dense_tr = Trainer(dense_cfg, make_mesh((1, 1, 1),
                                            devices=jax.devices()[:1]),
                       num_epochs=1)
    dense_params = jax.device_get(
        dense_tr.init_state(jax.random.PRNGKey(0), 8).params)
    pre = {"transformer": dense_params["transformer"]}
    out_dir = tmp_path / "converted"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(out_dir / "checkpoints" / "pretrained"), pre)
    ckptr.wait_until_finished()

    pipe_cfg = cfg(2)
    pipe_tr = Trainer(pipe_cfg, make_mesh(pipe_cfg.mesh_shape), num_epochs=1)
    state = pipe_tr.init_state(jax.random.PRNGKey(1), 8)
    merged = load_pretrained_params(str(out_dir), state.params)
    want = pipeline_t5_params(dense_params["transformer"], 2)
    fw, fm = _flat(want), _flat(jax.device_get(merged)["transformer"])
    assert set(fw) == set(fm)
    for k in fw:
        np.testing.assert_array_equal(np.asarray(fm[k]), np.asarray(fw[k]),
                                      err_msg=k)
    # Restored leaves landed in the pipelined state's shardings.
    got_sh = jax.tree.map(lambda x: x.sharding, merged["transformer"])
    ref_sh = jax.tree.map(lambda x: x.sharding, state.params["transformer"])
    assert got_sh == ref_sh


def test_captioner_unpipelines_params():
    """Training-time caption tracking under --pipeline_stages: the
    Captioner folds the stage axis back and runs the plain decode model."""
    from klab_multimodalmodel_tpu.infer.captioner import Captioner
    from klab_multimodalmodel_tpu.text import ByteTokenizer

    ids, mask, labels = _t5_inputs()
    piped_cfg = Config(language_model_name="t5-pipe-micro",
                       transformer_model_name="t5-pipe-micro",
                       image_model_name="swin-pipe-micro",
                       max_source_length=48, max_target_length=24,
                       batch_size=1, compute_dtype="float32",
                       mesh_shape=(2, 1, 1, 1, 2), pipeline_stages=2,
                       pipeline_microbatches=2, scan_unroll=1,
                       data_dir="synthetic")
    piped = T5ForConditionalGeneration(SIZE, pipeline_stages=2,
                                       pipeline_microbatches=4)
    pparams = piped.init(jax.random.PRNGKey(0), input_ids=ids,
                         attention_mask=mask, labels=labels)["params"]
    cap = Captioner(piped_cfg, {"transformer": pparams}, ByteTokenizer())
    assert cap.config.pipeline_stages == 1
    assert cap.config.mesh_shape[4] == 1
    assert "layers" in cap.params["transformer"]["encoder"]
    assert "pipeline" not in cap.params["transformer"]["encoder"]

    # Regression: the pipeline factor may live on the DCN axis instead
    # (config validates ici*dcn == stages) — the Captioner's fallback must
    # reset THAT factor too, or dataclasses.replace fails re-validation.
    dcn_cfg = Config(language_model_name="t5-pipe-micro",
                     transformer_model_name="t5-pipe-micro",
                     image_model_name="swin-pipe-micro",
                     max_source_length=48, max_target_length=24,
                     batch_size=1, compute_dtype="float32",
                     mesh_shape=(2, 1, 1, 1, 1),
                     dcn_mesh_shape=(1, 1, 1, 1, 2), pipeline_stages=2,
                     pipeline_microbatches=2, scan_unroll=1,
                     data_dir="synthetic")
    cap2 = Captioner(dcn_cfg, {"transformer": pparams}, ByteTokenizer())
    assert cap2.config.pipeline_stages == 1
    assert cap2.config.mesh_shape[4] == 1
    assert cap2.config.dcn_mesh_shape[4] == 1


def test_pipeline_config_validation():
    common = dict(data_dir="synthetic")
    with pytest.raises(ValueError, match="pipe axis"):
        Config(mesh_shape=(2, 1, 1, 1, 4), **common)
    with pytest.raises(ValueError, match="must equal"):
        Config(mesh_shape=(2, 1, 1, 1, 4), pipeline_stages=2, **common)
    with pytest.raises(ValueError, match="seq mesh axis"):
        Config(mesh_shape=(1, 1, 1, 2, 2), pipeline_stages=2, **common)
    with pytest.raises(ValueError, match="ring"):
        Config(pipeline_stages=2, seq_attention="ring", **common)
    cfg = Config(mesh_shape=(2, 1, 1, 1, 2), pipeline_stages=2, **common)
    assert cfg.mesh_shape == (2, 1, 1, 1, 2, 1)


def test_pipeline_init_with_default_microbatches():
    """pipeline_stages=4 with pipeline_microbatches left at 0 (-> M = 4):
    init_state's shape-only example batch must be divisible by M — the old
    hardcoded 2-row example made every pipeline config with M > 2 fail at
    init with 'batch=2 not divisible by pipeline_microbatches=4', despite a
    perfectly valid training batch."""
    register_t5_size("t5-pipe-micro4", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=4, num_decoder_layers=4,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    cfg = Config(language_model_name="t5-pipe-micro4",
                 transformer_model_name="t5-pipe-micro4",
                 image_model_name="swin-pipe-micro",
                 max_source_length=16, max_target_length=8,
                 batch_size=1, compute_dtype="float32",
                 mesh_shape=(2, 1, 1, 1, 4), pipeline_stages=4,
                 scan_unroll=1, data_dir="synthetic")
    trainer = Trainer(cfg, make_mesh(cfg.mesh_shape), num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)  # raised pre-fix

    ds = SyntheticCaptionDataset(n=8, image_size=32)
    loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                        max_source_length=16, max_target_length=8,
                        shuffle=False, seed=0)
    db = trainer.device_put_batch(next(iter(loader)))
    state, loss = trainer.train_step(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
