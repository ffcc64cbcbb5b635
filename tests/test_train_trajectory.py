"""k-step training-trajectory differential vs the reference's torch loop.

Composes the already-proven single-forward loss parity
(test_multimodal_golden.py) and LR-schedule parity
(test_train.py::test_lr_schedules_match_torch) into the end-to-end claim:
same init (via the HF converters), same batches, the reference's exact
optimizer construction — torch ``Adam(model.transformer.parameters())`` +
``CosineAnnealingLR(T_max=num_epochs)`` stepped once per optimizer step
(``/root/reference/train.py:28-30,66-71``) — against ``train/trainer.py``'s
compiled ``train_step``. Per-step losses must track for the whole run,
including PAST the schedule's quirky ``num_epochs``-step horizon (quirk #2:
torch's closed-form cosine oscillates back up after T_max; optim.py
reproduces it rather than clamping).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from klab_multimodalmodel_tpu.checkpoint import (convert_swinv2,
                                                 convert_t5_encoder,
                                                 convert_t5_lm)
from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                             register_swin_size,
                                             register_t5_size)
from klab_multimodalmodel_tpu.data.image_ops import normalize_images
from klab_multimodalmodel_tpu.train import Trainer
from klab_multimodalmodel_tpu.train.trainer import TrainState
from klab_multimodalmodel_tpu.utils import make_mesh

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY_T5 = T5Size(d_model=32, d_kv=8, d_ff=64, num_layers=2,
                 num_decoder_layers=2, num_heads=4, vocab_size=128,
                 relative_attention_num_buckets=8,
                 relative_attention_max_distance=16, dropout_rate=0.0)
TINY_SWIN = SwinV2Size(image_size=32, patch_size=4, embed_dim=16,
                       depths=(2, 2), num_heads=(2, 4), window_size=4,
                       drop_path_rate=0.0, pretrained_window_sizes=(0, 0))
register_t5_size("t5-tiny-traj", TINY_T5)
register_swin_size("swin-tiny-traj", TINY_SWIN)

K_STEPS = 10
NUM_EPOCHS = 4  # < K_STEPS: the cosine horizon quirk is exercised in-run
LR = 1e-3
BATCH = 8


def _hf_towers():
    torch.manual_seed(0)
    t5_cfg = transformers.T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_decoder_layers=2, num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0,
        decoder_start_token_id=0, tie_word_embeddings=True)
    swin_cfg = transformers.Swinv2Config(
        image_size=32, patch_size=4, num_channels=3, embed_dim=16,
        depths=[2, 2], num_heads=[2, 4], window_size=4, drop_path_rate=0.0,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    lang = transformers.T5EncoderModel(t5_cfg).eval().requires_grad_(False)
    swin = transformers.Swinv2Model(
        swin_cfg, add_pooling_layer=False).eval().requires_grad_(False)
    lm = transformers.T5ForConditionalGeneration(t5_cfg)
    return lang, swin, lm


def _batches(k=K_STEPS):
    rng = np.random.RandomState(7)
    out = []
    for _ in range(k):
        out.append({
            "images": rng.randint(0, 256, (BATCH, 32, 32, 3)).astype(
                np.uint8),
            "source_ids": rng.randint(2, 128, (BATCH, 7)).astype(np.int32),
            "source_mask": np.ones((BATCH, 7), np.int32),
            "target_ids": rng.randint(2, 128, (BATCH, 5)).astype(np.int32),
            "target_mask": np.ones((BATCH, 5), np.int32),
        })
    return out


def _torch_trajectory(towers, batches):
    """The reference loop, verbatim semantics (train.py:28-30,55-71):
    Adam over transformer params only, cosine schedule stepped per
    optimizer step, towers frozen/eval, accumulation_steps=1."""
    lang, swin, lm = towers
    lm.train()  # train.py:52 — transformer only; dropout_rate=0 anyway
    opt = torch.optim.Adam(lm.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=NUM_EPOCHS, eta_min=0)
    losses = []
    for b in batches:
        # Same pixels the framework step computes on-device.
        images = torch.tensor(np.asarray(
            normalize_images(jnp.asarray(b["images"]))).transpose(
                0, 3, 1, 2))
        with torch.no_grad():
            lang_emb = lang(
                input_ids=torch.tensor(b["source_ids"])).last_hidden_state
            img_emb = swin(images).last_hidden_state
        concat = torch.cat((img_emb, lang_emb), dim=1)
        loss = lm(inputs_embeds=concat,
                  labels=torch.tensor(b["target_ids"].astype(
                      np.int64))).loss
        losses.append(loss.item())
        loss.backward()
        opt.step()
        opt.zero_grad()
        sched.step()
    return losses, lm


def _framework_trajectory(towers, batches):
    lang, swin, lm = towers
    cfg = Config(language_model_name="t5-tiny-traj",
                 transformer_model_name="t5-tiny-traj",
                 image_model_name="swin-tiny-traj",
                 lr=LR, lr_scheduler="cosine", compute_dtype="float32",
                 use_vision_projection=False, reference_pad_quirks=True,
                 max_source_length=7, max_target_length=5)
    trainer = Trainer(cfg, make_mesh(cfg.mesh_shape),
                      num_epochs=NUM_EPOCHS)
    state = trainer.init_state(jax.random.PRNGKey(0), BATCH)
    params = {
        "language_model": convert_t5_encoder(lang.state_dict(), TINY_T5),
        "image_model": convert_swinv2(swin.state_dict(), TINY_SWIN),
        "transformer": convert_t5_lm(lm.state_dict(), TINY_T5),
    }
    assert set(params) == set(state.params), (
        "converted tree must mirror init's (no projection params: the "
        "reference concats towers directly)")
    conv = jax.tree.map(jnp.asarray, params)
    state = TrainState(step=state.step, params=conv,
                       opt_state=trainer.tx.init(conv))
    losses = []
    for i, b in enumerate(batches):
        state, loss = trainer.train_step(
            state, trainer.device_put_batch(b), jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses, state


def test_kstep_trajectory_matches_torch_reference_loop():
    towers = _hf_towers()
    batches = _batches()
    fw_losses, fw_state = _framework_trajectory(towers, batches)
    torch_losses, torch_lm = _torch_trajectory(towers, batches)

    # Per-step losses: fp32 end-to-end on both sides; drift accumulates
    # through Adam's eps-divide, so the tolerance loosens slightly with
    # depth but stays tight in absolute terms.
    np.testing.assert_allclose(fw_losses, torch_losses, rtol=2e-4,
                               atol=1e-5)
    # And the run must be non-trivial for the comparison to mean anything:
    # losses vary across steps (fresh batch per step) ...
    assert np.std(fw_losses) > 1e-3, f"flat trajectory: {fw_losses}"

    # ... and the end-state params moved AND agree with torch after K Adam
    # updates (parameter-space, not just loss-space, agreement).
    got = np.asarray(fw_state.params["transformer"]["shared"]["embedding"])
    want = torch_lm.shared.weight.detach().numpy()
    assert np.abs(got).sum() > 0 and not np.allclose(
        got, _hf_towers()[2].shared.weight.detach().numpy(), atol=1e-6), (
        "embedding never updated: the optimizer step is a no-op")
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-5)


def test_kstep_accumulation_trajectory_matches_torch():
    """Gradient accumulation, end to end vs the reference loop
    (train.py:61-71): per microbatch the torch side computes loss,
    divides by accumulation_steps, backwards; every 2nd microbatch it
    steps Adam + the cosine schedule. The framework consumes the same 12
    microbatches as 6 scan-accumulated train_steps of 2 microbatches
    each; per-update losses (mean of the group's microbatch losses, what
    train_step returns) must track torch's."""
    towers = _hf_towers()
    batches = _batches(12)
    accum = 2
    lang, swin, lm = towers
    # Convert AND deep-copy BEFORE the torch loop: state_dict() tensors
    # share storage with the live model, .numpy() keeps that sharing, and
    # even jnp.asarray can alias the numpy buffer on CPU (zero-copy) — so
    # torch's in-place Adam updates would silently leak into the
    # "initial" framework params. np.array(copy=True) severs all of it.
    params = jax.tree.map(lambda x: np.array(x, copy=True), {
        "language_model": convert_t5_encoder(lang.state_dict(), TINY_T5),
        "image_model": convert_swinv2(swin.state_dict(), TINY_SWIN),
        "transformer": convert_t5_lm(lm.state_dict(), TINY_T5),
    })

    # torch side
    lm.train()
    opt = torch.optim.Adam(lm.parameters(), lr=LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=NUM_EPOCHS, eta_min=0)
    torch_losses = []
    group = []
    for i, b in enumerate(batches):
        images = torch.tensor(np.asarray(
            normalize_images(jnp.asarray(b["images"]))).transpose(
                0, 3, 1, 2))
        with torch.no_grad():
            lang_emb = lang(
                input_ids=torch.tensor(b["source_ids"])).last_hidden_state
            img_emb = swin(images).last_hidden_state
        loss = lm(inputs_embeds=torch.cat((img_emb, lang_emb), dim=1),
                  labels=torch.tensor(
                      b["target_ids"].astype(np.int64))).loss
        group.append(loss.item())
        (loss / accum).backward()
        if (i + 1) % accum == 0:
            opt.step()
            opt.zero_grad()
            sched.step()
            torch_losses.append(sum(group) / len(group))
            group = []

    # framework side: same microbatches, 2 per compiled step
    cfg = Config(language_model_name="t5-tiny-traj",
                 transformer_model_name="t5-tiny-traj",
                 image_model_name="swin-tiny-traj",
                 lr=LR, lr_scheduler="cosine", compute_dtype="float32",
                 use_vision_projection=False, reference_pad_quirks=True,
                 accumulation_steps=accum,
                 max_source_length=7, max_target_length=5)
    trainer = Trainer(cfg, make_mesh(cfg.mesh_shape),
                      num_epochs=NUM_EPOCHS)
    state = trainer.init_state(jax.random.PRNGKey(0), BATCH * accum)
    conv = jax.tree.map(jnp.asarray, params)
    state = TrainState(step=state.step, params=conv,
                       opt_state=trainer.tx.init(conv))
    fw_losses = []
    for i in range(0, len(batches), accum):
        merged = {k: np.concatenate([batches[i + j][k] for j in
                                     range(accum)], axis=0)
                  for k in batches[i]}
        state, loss = trainer.train_step(
            state, trainer.device_put_batch(merged), jax.random.PRNGKey(i))
        fw_losses.append(float(loss))

    np.testing.assert_allclose(fw_losses, torch_losses, rtol=2e-4,
                               atol=1e-5)
