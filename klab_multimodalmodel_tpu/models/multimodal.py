"""The multimodal captioning/denoising model — the reference's ``MyModel``.

Architecture (``/root/reference/models/model.py:8-28``): a SwinV2 image
encoder and a *frozen* T5 text encoder produce embeddings which are
concatenated along the sequence axis and fed as ``inputs_embeds`` into a full
T5 encoder-decoder — a three-tower cascade where image+text embeddings act as
soft prompts re-encoded by the main T5's own encoder.

Deliberate divergences from the reference (each with an escape hatch):
  * quirk #8 fix: an optional identity-initialized projection maps vision
    features to the transformer ``d_model`` when they differ (the reference
    hard-crashes for e.g. swinv2-base + t5-base);
  * quirk #3 fix: attention masks cover pad positions and pad tokens are
    excluded from the loss unless ``reference_pad_quirks`` is set;
  * the frozen towers use ``stop_gradient`` (JAX's no_grad) *and* are
    excluded from optimizer updates at the train-state level (quirk #1 fix).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from .swinv2 import SwinV2Encoder
from .t5 import Seq2SeqOutput, T5Encoder, T5ForConditionalGeneration

Dtype = Any


def _identity_or_normal(rng, shape, dtype=jnp.float32):
    """Identity init when square (no-op at init for matching dims)."""
    if shape[0] == shape[1]:
        return jnp.eye(shape[0], dtype=dtype)
    return nn.initializers.lecun_normal()(rng, shape, dtype)


class MultiModalModel(nn.Module):
    """SwinV2 + frozen T5 encoder -> seq-concat -> T5 enc-dec."""

    config: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.image_model = SwinV2Encoder(
            cfg.swin, use_pallas=cfg.use_pallas_attention, dtype=self.dtype,
            softmax_dtype=jnp.bfloat16
            if cfg.swin_softmax_dtype == "bfloat16" else jnp.float32,
            gelu_approximate=cfg.swin_gelu_approximate,
            name="image_model")
        ring = cfg.seq_attention == "ring"
        self.language_model = T5Encoder(cfg.language_t5, dtype=self.dtype,
                                        scan_unroll=cfg.scan_unroll,
                                        use_pallas=cfg.use_pallas_t5_attention,
                                        ring_attention=ring,
                                        name="language_model")
        self.transformer = T5ForConditionalGeneration(
            cfg.transformer_t5, dtype=self.dtype, remat=cfg.remat,
            scan_unroll=cfg.scan_unroll,
            use_pallas=cfg.use_pallas_t5_attention, ring_attention=ring,
            pipeline_stages=cfg.pipeline_stages,
            pipeline_microbatches=cfg.pipeline_microbatches,
            moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            moe_aux_loss_weight=cfg.moe_aux_loss_weight,
            name="transformer")
        d_model = cfg.transformer_t5.d_model
        vis_dim = cfg.swin.num_features
        self.needs_vision_proj = (
            cfg.use_vision_projection or vis_dim != d_model)
        if self.needs_vision_proj:
            self.vision_projection = nn.Dense(
                d_model, use_bias=False, dtype=self.dtype,
                kernel_init=_identity_or_normal, name="vision_projection")
        lang_dim = cfg.language_t5.d_model
        self.needs_lang_proj = lang_dim != d_model
        if self.needs_lang_proj:
            self.language_projection = nn.Dense(
                d_model, use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.lecun_normal(),
                name="language_projection")

    # -- embedding cascade -------------------------------------------------
    def encode_multimodal(self, images: jax.Array, source_ids: jax.Array,
                          source_mask: Optional[jax.Array] = None,
                          deterministic: bool = True
                          ) -> tuple[jax.Array, Optional[jax.Array]]:
        """images (B,H,W,3) + token ids -> (concat_embeds, concat_mask).

        Mirrors ``MyModel.forward`` up to the concat
        (``/root/reference/models/model.py:20-23``): language tower always
        frozen; image tower frozen unless ``--image_model_train``.
        """
        cfg = self.config
        # Reference parity: ``train.py:52`` toggles ONLY ``transformer`` to
        # train mode — the SwinV2 and T5-encoder towers stay in eval mode
        # (no dropout / drop-path) even under ``--image_model_train``, which
        # changes requires_grad but never calls ``.train()``. Running the
        # towers deterministically also removes their drop-path/dropout
        # masks from the hot step (frozen-tower VPU work).
        lang = self.language_model(input_ids=source_ids,
                                   attention_mask=source_mask,
                                   deterministic=True)
        lang = jax.lax.stop_gradient(lang)  # torch.no_grad parity
        img = self.image_model(images, deterministic=True)
        if not cfg.image_model_train:
            img = jax.lax.stop_gradient(img)
        return self._project_and_concat(img, lang, source_mask)

    def _project_and_concat(self, img: jax.Array, lang: jax.Array,
                            source_mask: Optional[jax.Array]
                            ) -> tuple[jax.Array, Optional[jax.Array]]:
        """Trainable projections + seq-axis concat + concat mask: the shared
        tail of ``encode_multimodal`` and ``loss_from_image_features`` (the
        cached-feature path promises bit-identical behavior to __call__, so
        there is exactly one copy of this logic)."""
        if self.needs_vision_proj:
            img = self.vision_projection(img)
        if self.needs_lang_proj:
            lang = self.language_projection(lang)
        concat = jnp.concatenate([img, lang], axis=1)
        if source_mask is None:
            return concat, None
        # Image tokens are valid wherever the ROW is: a row whose source is
        # entirely padding (a gradient-accumulation phantom row,
        # train/loop.py tail) is masked wholesale, image tokens included —
        # it must not leak into MoE routing statistics. The reference never
        # feeds such rows (its final group is simply smaller), so for every
        # real row this is its unconditional torch.ones mask.
        row_valid = jnp.max(source_mask, axis=1, keepdims=True)
        img_mask = jnp.broadcast_to(row_valid, img.shape[:2])
        return concat, jnp.concatenate([img_mask, source_mask], axis=1)

    # -- frozen-feature cache path ------------------------------------------
    def image_features(self, images: jax.Array) -> jax.Array:
        """Frozen vision-tower forward, PRE-projection: the cacheable part.

        The vision projection is trainable, so the cache stores the tower
        output and the projection is re-applied every step.
        """
        return jax.lax.stop_gradient(
            self.image_model(images, deterministic=True))

    def language_features(self, source_ids: jax.Array,
                          source_mask: Optional[jax.Array] = None
                          ) -> jax.Array:
        """Frozen language-tower forward, PRE-projection: cacheable when the
        dataset's source text is static per sample (caption prompts; NOT
        span corruption, which re-masks every epoch)."""
        if self.config.reference_pad_quirks:
            source_mask = None
        return jax.lax.stop_gradient(
            self.language_model(input_ids=source_ids,
                                attention_mask=source_mask,
                                deterministic=True))

    def loss_from_image_features(self, image_features: jax.Array,
                                 source_ids: jax.Array,
                                 target_ids: jax.Array,
                                 source_mask: Optional[jax.Array] = None,
                                 target_mask: Optional[jax.Array] = None,
                                 language_features: Optional[jax.Array] = None,
                                 deterministic: bool = True) -> Seq2SeqOutput:
        """Training forward from cached tower features — bit-identical to
        ``__call__`` when ``image_features == image_features(images)`` (the
        frozen tower runs deterministically, see ``encode_multimodal``).
        ``language_features``, when given, replaces the frozen text-encoder
        forward the same way."""
        cfg = self.config
        if cfg.reference_pad_quirks:
            source_mask = None
            target_mask = None
        if language_features is None:
            lang = self.language_model(input_ids=source_ids,
                                       attention_mask=source_mask,
                                       deterministic=True)
            lang = jax.lax.stop_gradient(lang)
        else:
            lang = language_features.astype(self.dtype)
        img = image_features.astype(self.dtype)
        concat, concat_mask = self._project_and_concat(img, lang,
                                                       source_mask)
        label_weights = None
        if target_mask is not None:
            label_weights = target_mask.astype(jnp.float32)
        return self.transformer(
            inputs_embeds=concat, attention_mask=concat_mask,
            labels=target_ids, label_weights=label_weights,
            decoder_attention_mask=self._decoder_mask(target_mask),
            deterministic=deterministic)

    # -- training forward --------------------------------------------------
    def __call__(self, images: jax.Array, source_ids: jax.Array,
                 target_ids: jax.Array,
                 source_mask: Optional[jax.Array] = None,
                 target_mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> Seq2SeqOutput:
        cfg = self.config
        if cfg.reference_pad_quirks:
            # Bit-parity mode: no attention masks anywhere, pads in the loss
            # (quirk #3, /root/reference/models/model.py:21,26).
            source_mask = None
            target_mask = None
        concat, concat_mask = self.encode_multimodal(
            images, source_ids, source_mask, deterministic)
        label_weights = None
        if target_mask is not None:
            label_weights = target_mask.astype(jnp.float32)
        return self.transformer(
            inputs_embeds=concat, attention_mask=concat_mask,
            labels=target_ids, label_weights=label_weights,
            decoder_attention_mask=self._decoder_mask(target_mask),
            deterministic=deterministic)

    def _decoder_mask(self, target_mask):
        """Decoder-side mask, passed only under MoE: it gates the decoder
        stack's ROUTING so pad targets neither claim expert capacity nor
        skew the balance loss. Loss-neutral for attention itself — target
        pads trail the sequence, so causal masking already hides them from
        real queries and label_weights zero their loss rows. Dense models
        keep the reference's no-decoder-mask behavior bit-for-bit."""
        if self.config.moe_experts > 0:
            return target_mask
        return None

    # -- generation entry (encoder half; the decode loop lives in infer/) --
    def encode_for_generation(self, images: jax.Array, source_ids: jax.Array,
                              source_mask: Optional[jax.Array] = None
                              ) -> tuple[jax.Array, Optional[jax.Array]]:
        if self.config.reference_pad_quirks:
            # Same gate as __call__: bit-parity mode attends pads during
            # generation too (the reference's generate sees no attention
            # mask, /root/reference/models/model.py:21,28) — and a
            # quirks-trained model only ever saw pad-attending activations.
            source_mask = None
        concat, concat_mask = self.encode_multimodal(
            images, source_ids, source_mask, deterministic=True)
        enc = self.transformer.encode(inputs_embeds=concat,
                                      attention_mask=concat_mask,
                                      deterministic=True)
        return enc, concat_mask

    def decode_step(self, token: jax.Array, step: jax.Array,
                    encoder_hidden: jax.Array, max_decode_len: int,
                    encoder_mask: Optional[jax.Array] = None) -> jax.Array:
        return self.transformer.decode_step(
            token, step, encoder_hidden, max_decode_len,
            encoder_attention_mask=encoder_mask)

    @nn.nowrap
    def transformer_module(self) -> T5ForConditionalGeneration:
        """Standalone T5 module matching the ``transformer`` subtree —
        for the generation loop, which decodes against
        ``params['transformer']`` directly."""
        return T5ForConditionalGeneration(
            self.config.transformer_t5, dtype=self.dtype,
            remat=self.config.remat, scan_unroll=self.config.scan_unroll,
            moe_experts=self.config.moe_experts,
            moe_top_k=self.config.moe_top_k,
            moe_capacity_factor=self.config.moe_capacity_factor,
            moe_aux_loss_weight=self.config.moe_aux_loss_weight)
