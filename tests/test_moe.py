"""Mixture-of-Experts (--moe_experts) + expert parallelism correctness.

The MoE layer (models/t5.py ``T5MoeMlp`` over ops/moe.py) must:
  * degenerate exactly to the dense ``T5Mlp`` with one expert and full
    capacity (the correctness anchor — routing with E=1 is the identity);
  * respect fixed capacity and produce the Switch balance loss (~1.0 at
    uniform routing);
  * compute the same loss/gradients whether expert weights live on one
    device or are sharded over the mesh's ``expert`` axis (the XLA
    all-to-all lowering changes WHERE, never WHAT);
  * train end-to-end through the three-tower Trainer and decode through
    the KV-cache path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                             register_swin_size,
                                             register_t5_size)
from klab_multimodalmodel_tpu.models.t5 import (T5ForConditionalGeneration,
                                                T5Mlp, T5MoeMlp)
from klab_multimodalmodel_tpu.ops.moe import (moe_capacity, moe_ffn,
                                              topk_routing)
from klab_multimodalmodel_tpu.parallel.partitioning import (
    make_param_shardings, make_param_specs)
from klab_multimodalmodel_tpu.utils import make_mesh

SIZE = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
              num_decoder_layers=2, num_heads=4, vocab_size=128,
              relative_attention_num_buckets=8,
              relative_attention_max_distance=16, dropout_rate=0.0)

register_t5_size("t5-moe-micro", T5Size(
    d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
    num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
    relative_attention_max_distance=16, dropout_rate=0.0))
register_swin_size("swin-moe-micro", SwinV2Size(
    image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
    num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
    pretrained_window_sizes=(0, 0)))


def _t5_inputs(seed=0, B=4, Ls=16, Lt=12):
    rng = np.random.RandomState(seed)
    ids = jnp.asarray(rng.randint(3, SIZE.vocab_size, (B, Ls)))
    mask = jnp.asarray((rng.rand(B, Ls) > 0.2).astype(np.float32))
    labels = jnp.asarray(rng.randint(3, SIZE.vocab_size, (B, Lt)))
    return ids, mask, labels


def _flat(tree):
    return {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_leaves_with_path(tree)}


def test_moe_single_expert_matches_dense():
    """E=1 with full capacity is the dense MLP: one expert, gate=1, every
    token fits — outputs must be exactly equal on shared weights."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 32), jnp.float32)
    moe = T5MoeMlp(SIZE, num_experts=1, top_k=1, capacity_factor=8.0)
    mvars = moe.init(jax.random.PRNGKey(0), x)
    dense = T5Mlp(SIZE)
    dvars = {"params": {
        "wi": {"kernel": mvars["params"]["experts_wi"][0]},
        "wo": {"kernel": mvars["params"]["experts_wo"][0]}}}
    y_moe, aux = moe.apply(mvars, x)
    y_dense = dense.apply(dvars, x)
    np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                               rtol=1e-6, atol=1e-7)
    # One expert: perfectly "balanced" by definition -> aux == 1.
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-6)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_routing_semantics(top_k):
    G, S, E = 2, 16, 4
    cap = moe_capacity(S, E, top_k, 1.25)
    assert cap == -(-top_k * S * 1.25 // E)
    logits = jnp.asarray(np.random.RandomState(1).randn(G, S, E),
                         jnp.float32)
    combine, aux = topk_routing(logits, top_k, cap)
    c = np.asarray(combine)
    assert c.shape == (G, S, E, cap)
    # Each expert slot holds at most one token; each expert at most cap.
    assert (c > 0).sum(axis=(1,)).max() <= 1 + 1e-6  # per (g, e, c) slot
    assert (c > 0).any(axis=3).sum(axis=1).max() <= cap
    # A routed token's gate equals its softmax prob for that expert.
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    gates = c.sum(axis=3)  # (G, S, E)
    routed = gates > 0
    np.testing.assert_allclose(gates[routed],
                               probs[routed], rtol=1e-6)
    assert np.isfinite(float(aux))


def test_moe_uniform_routing_aux_is_one():
    """Uniform router probs + perfectly balanced assignment => the Switch
    loss sits at its minimum E * E*(1/E * 1/E) = 1."""
    G, S, E = 1, 16, 4
    # Round-robin logits: token i strongly prefers expert i % E, but with
    # all experts equally loaded overall and near-uniform softmax mass.
    base = np.full((G, S, E), 0.0, np.float32)
    for i in range(S):
        base[0, i, i % E] = 60.0  # saturates softmax -> f_e = 1/E exactly
    combine, aux = topk_routing(jnp.asarray(base), 1, moe_capacity(S, E, 1, 1.0))
    np.testing.assert_allclose(float(aux), 1.0, rtol=1e-5)


def test_moe_capacity_drops_overflow():
    """All tokens prefer expert 0 with capacity 2: only 2 slots filled,
    the rest contribute zero (the residual path carries them)."""
    G, S, E, cap = 1, 8, 4, 2
    logits = np.zeros((G, S, E), np.float32)
    logits[..., 0] = 10.0
    combine, _ = topk_routing(jnp.asarray(logits), 1, cap)
    gates = np.asarray(combine).sum(axis=(2, 3))[0]  # per-token total gate
    assert (gates[:2] > 0).all() and (gates[2:] == 0).all()
    x = jnp.asarray(np.random.RandomState(0).randn(G, S, 16), jnp.float32)
    wi = jnp.asarray(np.random.RandomState(1).randn(E, 16, 32) * 0.1,
                     jnp.float32)
    wo = jnp.asarray(np.random.RandomState(2).randn(E, 32, 16) * 0.1,
                     jnp.float32)
    y = moe_ffn(x, combine, wi, wo)
    assert np.abs(np.asarray(y)[0, 2:]).max() == 0.0
    assert np.abs(np.asarray(y)[0, :2]).max() > 0.0


def test_moe_routing_mask_excludes_pads():
    """Masked (pad) tokens route nowhere, claim no capacity slots, and
    drop out of the balance statistics."""
    G, S, E, cap = 1, 8, 4, 2
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(G, S, E), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0]], jnp.float32)
    combine, aux = topk_routing(logits, 1, cap, mask=mask)
    c = np.asarray(combine)
    assert np.abs(c[0, 5:]).max() == 0.0  # pads get no expert output

    # Pads must not consume capacity: everyone prefers expert 0 with 2
    # slots; with token 0 masked out, the slots go to tokens 1 and 2.
    pref = np.zeros((G, S, E), np.float32)
    pref[..., 0] = 10.0
    m2 = np.ones((G, S), np.float32)
    m2[0, 0] = 0.0
    c2 = np.asarray(topk_routing(jnp.asarray(pref), 1, cap,
                                 mask=jnp.asarray(m2))[0])
    gates = c2.sum(axis=(2, 3))[0]
    assert gates[0] == 0 and (gates[1:3] > 0).all() and (gates[3:] == 0).all()

    # Aux statistics are computed over real tokens only: masked-full-width
    # equals the trimmed tensor.
    _, aux_trim = topk_routing(logits[:, :5], 1, cap)
    np.testing.assert_allclose(float(aux), float(aux_trim), rtol=1e-6)


def test_moe_loss_invariant_to_pad_content():
    """With masks everywhere (attention, routing, loss), the model loss
    must not change when pad-position token ids change — i.e. pad tokens
    no longer steal expert capacity from real tokens."""
    ids, mask, labels = _t5_inputs()
    imask = (np.asarray(mask) > 0)
    tmask = np.ones(labels.shape, np.float32)
    tmask[:, -4:] = 0.0
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_capacity_factor=0.5)  # binding
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]

    def loss(src):
        return float(model.apply(
            {"params": params}, input_ids=src, attention_mask=mask,
            labels=labels, label_weights=jnp.asarray(tmask),
            decoder_attention_mask=jnp.asarray(tmask)).loss)

    garbled = np.asarray(ids).copy()
    garbled[~imask] = 7  # rewrite every pad position
    np.testing.assert_allclose(loss(jnp.asarray(garbled)), loss(ids),
                               rtol=1e-6)


def test_moe_model_loss_includes_weighted_aux():
    ids, mask, labels = _t5_inputs()
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_aux_loss_weight=0.01)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]
    out = model.apply({"params": params}, input_ids=ids,
                      attention_mask=mask, labels=labels)
    assert out.aux_loss is not None and np.isfinite(float(out.aux_loss))
    zero_w = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                        moe_aux_loss_weight=0.0)
    out0 = zero_w.apply({"params": params}, input_ids=ids,
                        attention_mask=mask, labels=labels)
    np.testing.assert_allclose(
        float(out.loss), float(out0.loss) + 0.01 * float(out.aux_loss),
        rtol=1e-6)
    # Router and expert weights both receive gradient.
    g = jax.grad(lambda p: model.apply(
        {"params": p}, input_ids=ids, attention_mask=mask,
        labels=labels).loss)(params)
    mlp_g = g["encoder"]["layers"]["block"]["mlp"]
    assert float(jnp.linalg.norm(mlp_g["experts_wi"])) > 0
    assert float(jnp.linalg.norm(mlp_g["router"]["kernel"])) > 0


def test_moe_expert_parallel_equivalence():
    """Loss and gradients on a (2,1,1,1,1,4) data x expert mesh equal the
    single-device values — the expert all-to-all changes placement only."""
    ids, mask, labels = _t5_inputs(B=8)
    model = T5ForConditionalGeneration(SIZE, moe_experts=4)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]

    def loss_fn(p):
        return model.apply({"params": p}, input_ids=ids,
                           attention_mask=mask, labels=labels).loss

    base_loss, base_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh((2, 1, 1, 1, 1, 4))
    shardings = make_param_shardings(params, mesh)
    specs = _flat(make_param_specs(params))
    wi_spec = specs["['encoder']['layers']['block']['mlp']['experts_wi']"]
    assert "expert" in jax.tree_util.tree_leaves(tuple(wi_spec)), wi_spec
    p_sh = jax.device_put(params, shardings)
    with mesh:
        sh_loss, sh_grads = jax.jit(jax.value_and_grad(loss_fn))(p_sh)
    np.testing.assert_allclose(float(sh_loss), float(base_loss), rtol=1e-6)
    fb, fs = _flat(base_grads), _flat(jax.device_get(sh_grads))
    for k in fb:
        np.testing.assert_allclose(np.asarray(fs[k]), np.asarray(fb[k]),
                                   rtol=5e-5, atol=1e-7, err_msg=k)


def test_moe_expert_constraint_inserts_collectives(monkeypatch):
    """Differential HLO pin of the token exchange itself: with params AND
    inputs replicated on a pure-EP mesh, ``expert_constraint`` is the ONLY
    sharding source in the program — collectives present with it and
    absent with it patched to identity prove the dispatched-token exchange
    (not mere weight sharding) is what partitions the compute."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import klab_multimodalmodel_tpu.ops.moe as moe_mod

    ids, mask, labels = _t5_inputs(B=8)
    model = T5ForConditionalGeneration(SIZE, moe_experts=8)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]
    mesh = make_mesh((1, 1, 1, 1, 1, 8))
    repl = NamedSharding(mesh, P())
    p_repl = jax.device_put(params, jax.tree.map(lambda _: repl, params))

    def n_collectives():
        # Fresh closure per measurement: jit caches traces by function
        # identity, and a cached trace would never see the monkeypatch.
        def loss_fn(p):
            return model.apply({"params": p}, input_ids=ids,
                               attention_mask=mask, labels=labels).loss

        with mesh:
            txt = jax.jit(loss_fn).lower(p_repl).compile().as_text()
        return (txt.count("all-to-all") + txt.count("all-gather")
                + txt.count("all-reduce") + txt.count("collective-permute"))

    with_constraint = n_collectives()
    monkeypatch.setattr(moe_mod, "expert_constraint", lambda x: x)
    without_constraint = n_collectives()
    assert with_constraint > 0, "expert_constraint moved no tokens"
    assert without_constraint == 0, (
        "collectives without the constraint: the differential no longer "
        "isolates the token exchange")

    # And the standard layout (weights expert-sharded by the spec rules)
    # also partitions.
    specs = _flat(make_param_specs(params))
    wi_spec = specs["['encoder']['layers']['block']['mlp']['experts_wi']"]
    assert "expert" in jax.tree_util.tree_leaves(tuple(wi_spec)), wi_spec


def test_moe_decode_step_matches_decode_train():
    """KV-cache decode vs teacher forcing on the SAME token sequence, all
    positions. With ample capacity (factor 8 => nothing drops) routing is
    per-token deterministic, so the two paths must agree everywhere.

    (When capacity DOES bind, the paths legitimately diverge from the
    first overflow onward: training's capacity drop is computed over the
    whole teacher-forced sequence — a non-causal quantity no
    token-at-a-time decoder can reproduce — while incremental decode is
    drop-free, the standard MoE serving behavior.)"""
    ids, mask, _ = _t5_inputs()
    Lt = 8
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_capacity_factor=8.0)
    B = ids.shape[0]
    rng = np.random.RandomState(3)
    dec_ids = jnp.asarray(
        np.concatenate([np.zeros((B, 1), np.int64),
                        rng.randint(3, SIZE.vocab_size, (B, Lt - 1))],
                       axis=1).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask,
                        labels=jnp.zeros((B, Lt), jnp.int32))["params"]
    enc = model.apply({"params": params}, input_ids=ids,
                      attention_mask=mask, method=model.encode)
    train_logits = model.apply({"params": params}, dec_ids, enc,
                               mask, method=model.decode_train)

    cache = {}
    step_logits = []
    for t in range(Lt):
        out, mods = model.apply(
            {"params": params, **({"cache": cache} if cache else {})},
            dec_ids[:, t:t + 1], jnp.asarray(t, jnp.int32), enc, Lt, mask,
            method=model.decode_step, mutable=["cache"])
        cache = mods["cache"]
        step_logits.append(np.asarray(out[:, 0]))
    np.testing.assert_allclose(np.stack(step_logits, axis=1),
                               np.asarray(train_logits),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_moe_trainer_end_to_end():
    """Full three-tower Trainer with --moe_experts 4 on a data x expert
    mesh: two Adam steps run, losses are finite and the expert weights
    move; greedy decode works through the same params."""
    from klab_multimodalmodel_tpu.data import (DataLoader,
                                               SyntheticCaptionDataset)
    from klab_multimodalmodel_tpu.infer.generate import greedy_decode
    from klab_multimodalmodel_tpu.text import ByteTokenizer
    from klab_multimodalmodel_tpu.train import Trainer

    cfg = Config(language_model_name="t5-moe-micro",
                 transformer_model_name="t5-moe-micro",
                 image_model_name="swin-moe-micro",
                 max_source_length=48, max_target_length=24,
                 batch_size=1, compute_dtype="float32",
                 mesh_shape=(2, 1, 1, 1, 1, 4),
                 moe_experts=4, moe_top_k=2,
                 scan_unroll=1, data_dir="synthetic")
    trainer = Trainer(cfg, make_mesh(cfg.mesh_shape), num_epochs=1)
    state = trainer.init_state(jax.random.PRNGKey(0), 8)
    wi0 = np.asarray(jax.device_get(
        state.params["transformer"]["encoder"]["layers"]["block"]["mlp"]
        ["experts_wi"]))

    ds = SyntheticCaptionDataset(n=16, image_size=32)
    loader = DataLoader(ds, ByteTokenizer(), global_batch_size=8,
                        max_source_length=48, max_target_length=24,
                        shuffle=False, seed=0)
    it = iter(loader)
    losses = []
    for _ in range(2):
        state, loss = trainer.train_step(
            state, trainer.device_put_batch(next(it)), jax.random.PRNGKey(1))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    wi1 = np.asarray(jax.device_get(
        state.params["transformer"]["encoder"]["layers"]["block"]["mlp"]
        ["experts_wi"]))
    assert np.abs(wi1 - wi0).max() > 0

    tf = trainer.model.transformer_module()
    tparams = jax.device_get(state.params)["transformer"]
    enc = tf.apply({"params": tparams},
                   input_ids=jnp.zeros((2, 8), jnp.int32),
                   method=tf.encode)
    toks = greedy_decode(tf, tparams, enc, None, 6)
    assert toks.shape == (2, 6)


def test_upcycle_dense_to_moe_params():
    """Sparse upcycling (models/t5.py:upcycle_t5_params): every expert
    starts as an exact copy of the dense MLP, all non-MLP weights carry
    over bit-identically, the router keeps the fresh MoE init, and the
    upcycled tree is structurally a valid MoE param tree that runs."""
    from klab_multimodalmodel_tpu.models.t5 import upcycle_t5_params

    ids, mask, labels = _t5_inputs()
    E = 4
    dense_model = T5ForConditionalGeneration(SIZE)
    moe_model = T5ForConditionalGeneration(SIZE, moe_experts=E,
                                           moe_capacity_factor=2.0)
    dense = dense_model.init(jax.random.PRNGKey(0), input_ids=ids,
                             attention_mask=mask, labels=labels)["params"]
    fresh = moe_model.init(jax.random.PRNGKey(1), input_ids=ids,
                           attention_mask=mask, labels=labels)["params"]
    up = upcycle_t5_params(dense, fresh)
    assert (jax.tree_util.tree_structure(up)
            == jax.tree_util.tree_structure(fresh))
    for key in ("encoder", "decoder"):
        dmlp = dense[key]["layers"]["block"]["mlp"]
        umlp = up[key]["layers"]["block"]["mlp"]
        fmlp = fresh[key]["layers"]["block"]["mlp"]
        for e in range(E):
            np.testing.assert_array_equal(np.asarray(umlp["experts_wi"][:, e]),
                                          np.asarray(dmlp["wi"]["kernel"]))
            np.testing.assert_array_equal(np.asarray(umlp["experts_wo"][:, e]),
                                          np.asarray(dmlp["wo"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(umlp["router"]["kernel"]),
            np.asarray(fmlp["router"]["kernel"]))
        # Non-MLP weights are the dense checkpoint's, untouched.
        np.testing.assert_array_equal(
            np.asarray(up[key]["layers"]["block"]["SelfAttention"]["o"]
                       ["kernel"]),
            np.asarray(dense[key]["layers"]["block"]["SelfAttention"]["o"]
                       ["kernel"]))
    out = moe_model.apply({"params": up}, input_ids=ids, attention_mask=mask,
                          labels=labels)
    assert np.isfinite(float(out.loss))


def test_upcycle_via_init_checkpoint(tmp_path):
    """--init_checkpoint with a DENSE pretrained checkpoint and an MoE
    target model sparse-upcycles on the fly (checkpoint/io.py)."""
    import orbax.checkpoint as ocp

    from klab_multimodalmodel_tpu.checkpoint.io import load_pretrained_params

    ids, mask, labels = _t5_inputs()
    dense = T5ForConditionalGeneration(SIZE).init(
        jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask,
        labels=labels)["params"]
    ck = ocp.StandardCheckpointer()
    ck.save(str(tmp_path / "pre"), {"transformer": dense})
    ck.wait_until_finished()

    moe_model = T5ForConditionalGeneration(SIZE, moe_experts=4)
    fresh = moe_model.init(jax.random.PRNGKey(1), input_ids=ids,
                           attention_mask=mask, labels=labels)["params"]
    out = load_pretrained_params(str(tmp_path / "pre"),
                                 {"transformer": fresh})
    umlp = out["transformer"]["encoder"]["layers"]["block"]["mlp"]
    np.testing.assert_array_equal(
        np.asarray(umlp["experts_wi"][:, 2]),
        np.asarray(dense["encoder"]["layers"]["block"]["mlp"]["wi"]
                   ["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(umlp["router"]["kernel"]),
        np.asarray(fresh["encoder"]["layers"]["block"]["mlp"]["router"]
                   ["kernel"]))
    loss = float(moe_model.apply({"params": out["transformer"]},
                                 input_ids=ids, attention_mask=mask,
                                 labels=labels).loss)
    assert np.isfinite(loss)


def test_restore_refuses_dense_moe_boundary(tmp_path):
    """Full-state resume must not silently cross the dense/MoE boundary
    (expert moments have no dense counterpart) — clear error instead,
    pointing at the --init_checkpoint upcycle path."""
    from klab_multimodalmodel_tpu.checkpoint.io import CheckpointManager

    ids, mask, labels = _t5_inputs()
    dense = T5ForConditionalGeneration(SIZE).init(
        jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask,
        labels=labels)["params"]
    mgr = CheckpointManager(str(tmp_path))
    mgr.save("epoch_1", {"params": {"transformer": dense}})
    mgr.wait()
    moe = T5ForConditionalGeneration(SIZE, moe_experts=4).init(
        jax.random.PRNGKey(1), input_ids=ids, attention_mask=mask,
        labels=labels)["params"]
    with pytest.raises(ValueError, match="dense/MoE boundary"):
        mgr.restore("epoch_1", {"params": {"transformer": moe}})


def test_moe_greedy_decode_matches_stepwise_oracle():
    """infer.generate greedy decode (jit while_loop) on an MoE model must
    produce exactly the tokens of a hand-rolled decode_step argmax loop."""
    from klab_multimodalmodel_tpu.infer.generate import greedy_decode

    ids, mask, _ = _t5_inputs()
    L = 6
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_capacity_factor=8.0)
    B = ids.shape[0]
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask,
                        labels=jnp.zeros((B, L), jnp.int32))["params"]
    enc = model.apply({"params": params}, input_ids=ids,
                      attention_mask=mask, method=model.encode)
    got = np.asarray(greedy_decode(model, params, enc, mask, L))

    tok = np.full((B, L), SIZE.pad_token_id, np.int32)
    tok[:, 0] = SIZE.decoder_start_token_id
    cache = {}
    finished = np.zeros(B, bool)
    for t in range(L - 1):
        out, mods = model.apply(
            {"params": params, **({"cache": cache} if cache else {})},
            jnp.asarray(tok[:, t:t + 1]), jnp.asarray(t, jnp.int32), enc,
            L, mask, method=model.decode_step, mutable=["cache"])
        cache = mods["cache"]
        nxt = np.asarray(jnp.argmax(out[:, -1], axis=-1)).astype(np.int32)
        nxt = np.where(finished, SIZE.pad_token_id, nxt)
        tok[:, t + 1] = nxt
        finished |= nxt == SIZE.eos_token_id
        if finished.all():
            break
    np.testing.assert_array_equal(got, tok)


def test_moe_loss_invariant_to_phantom_rows():
    """Appending all-masked phantom rows (the gradient-accumulation pad
    tail, train/loop.py) leaves the total loss (CE + weighted aux) AND the
    gradients exactly those of the unpadded batch: phantom rows are
    excluded from routing, capacity, and the aux group mean
    (ops/moe.py nonempty-group normalization)."""
    ids, mask, labels = _t5_inputs()
    B = ids.shape[0]
    tmask = np.ones(labels.shape, np.float32)
    tmask[:, -4:] = 0.0
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_aux_loss_weight=0.01,
                                       moe_capacity_factor=0.5)  # binding
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask, labels=labels)["params"]

    def loss_fn(p, src, m, lab, w):
        return model.apply({"params": p}, input_ids=src, attention_mask=m,
                           labels=lab, label_weights=w,
                           decoder_attention_mask=w).loss

    # Phantom tail: cycle real rows, zero both masks (what the loop does).
    pad = 3
    idx = np.arange(B + pad) % B
    src_p = jnp.asarray(np.asarray(ids)[idx])
    m_p = np.asarray(mask)[idx].copy(); m_p[B:] = 0.0
    lab_p = jnp.asarray(np.asarray(labels)[idx])
    w_p = np.asarray(tmask)[idx].copy(); w_p[B:] = 0.0

    base = model.apply({"params": params}, input_ids=ids,
                       attention_mask=mask, labels=labels,
                       label_weights=jnp.asarray(tmask),
                       decoder_attention_mask=jnp.asarray(tmask))
    padded = model.apply({"params": params}, input_ids=src_p,
                         attention_mask=jnp.asarray(m_p), labels=lab_p,
                         label_weights=jnp.asarray(w_p),
                         decoder_attention_mask=jnp.asarray(w_p))
    np.testing.assert_allclose(float(padded.aux_loss),
                               float(base.aux_loss), rtol=1e-6)
    np.testing.assert_allclose(float(padded.loss), float(base.loss),
                               rtol=1e-6)

    g0 = jax.grad(loss_fn)(params, ids, mask, labels, jnp.asarray(tmask))
    g1 = jax.grad(loss_fn)(params, src_p, jnp.asarray(m_p), lab_p,
                           jnp.asarray(w_p))
    f0, f1 = _flat(g0), _flat(g1)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f1[k]), np.asarray(f0[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_moe_multimodal_phantom_rows_masked_out():
    """Through the full three-tower cascade: phantom rows must not leak
    into the MoE balance loss via the all-ones IMAGE-token mask — the
    row-validity image mask (models/multimodal.py) masks them wholesale."""
    from klab_multimodalmodel_tpu.models.multimodal import MultiModalModel

    cfg = Config(language_model_name="t5-moe-micro",
                 transformer_model_name="t5-moe-micro",
                 image_model_name="swin-moe-micro",
                 max_source_length=16, max_target_length=8,
                 compute_dtype="float32", scan_unroll=1,
                 moe_experts=4, moe_capacity_factor=0.5,
                 data_dir="synthetic")
    rng = np.random.RandomState(0)
    B, pad = 2, 2
    images = jnp.asarray(rng.rand(B, 32, 32, 3), jnp.float32)
    src = jnp.asarray(rng.randint(3, 512, (B, 16)), jnp.int32)
    tgt = jnp.asarray(rng.randint(3, 512, (B, 8)), jnp.int32)
    smask = jnp.ones((B, 16), jnp.float32)
    tmask = jnp.ones((B, 8), jnp.float32)
    model = MultiModalModel(cfg)
    params = model.init(jax.random.PRNGKey(0), images, src, tgt,
                        source_mask=smask, target_mask=tmask)["params"]

    idx = np.arange(B + pad) % B
    pz = lambda a: np.asarray(a)[idx]
    sm_p = pz(smask).copy(); sm_p[B:] = 0.0
    tm_p = pz(tmask).copy(); tm_p[B:] = 0.0

    base = model.apply({"params": params}, images, src, tgt,
                       source_mask=smask, target_mask=tmask)
    padded = model.apply({"params": params}, jnp.asarray(pz(images)),
                         jnp.asarray(pz(src)), jnp.asarray(pz(tgt)),
                         source_mask=jnp.asarray(sm_p),
                         target_mask=jnp.asarray(tm_p))
    np.testing.assert_allclose(float(padded.aux_loss),
                               float(base.aux_loss), rtol=1e-6)
    np.testing.assert_allclose(float(padded.loss), float(base.loss),
                               rtol=1e-6)


def test_moe_beam1_matches_greedy():
    """Beam search with num_beams=1 on an MoE model must reproduce greedy
    decode token-for-token (ample capacity => per-token routing identical
    across decode paths)."""
    from klab_multimodalmodel_tpu.infer.generate import (beam_search_decode,
                                                         greedy_decode)

    ids, mask, _ = _t5_inputs()
    L = 8
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_capacity_factor=8.0)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask,
                        labels=jnp.zeros((ids.shape[0], L), jnp.int32))["params"]
    enc = model.apply({"params": params}, input_ids=ids,
                      attention_mask=mask, method=model.encode)
    greedy = np.asarray(greedy_decode(model, params, enc, mask, L))
    beam1 = np.asarray(beam_search_decode(model, params, enc, mask, L,
                                          num_beams=1))
    np.testing.assert_array_equal(beam1, greedy)


def test_moe_sharded_decode_matches_single_device():
    """Greedy decode with expert-sharded params on a data x expert mesh
    produces exactly the single-device tokens — serving an MoE straight
    from its training shardings works."""
    from klab_multimodalmodel_tpu.infer.generate import greedy_decode

    ids, mask, _ = _t5_inputs(B=4)
    L = 8
    model = T5ForConditionalGeneration(SIZE, moe_experts=4,
                                       moe_capacity_factor=8.0)
    params = model.init(jax.random.PRNGKey(0), input_ids=ids,
                        attention_mask=mask,
                        labels=jnp.zeros((4, L), jnp.int32))["params"]
    enc = model.apply({"params": params}, input_ids=ids,
                      attention_mask=mask, method=model.encode)
    want = np.asarray(greedy_decode(model, params, enc, mask, L))

    mesh = make_mesh((2, 1, 1, 1, 1, 4))
    shardings = make_param_shardings(params, mesh)
    sharded = jax.device_put(params, shardings)
    with mesh:
        got = np.asarray(greedy_decode(model, sharded, enc, mask, L))
    np.testing.assert_array_equal(got, want)
