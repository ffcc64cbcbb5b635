"""End-to-end captioning: images + prompt -> decoded strings.

Covers the reference's inference demo (``visualization.ipynb`` cells 3-8):
load checkpoint, preprocess one image, greedy-generate, decode with
``skip_special_tokens``.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.datasets import COCO_PROMPT
from ..data.image_ops import normalize_images
from ..models.multimodal import MultiModalModel
from ..text.tokenizer import TokenizerBase
from ..utils.bucketing import pow2_bucket_width
from .generate import generate, stream_decode


class Captioner:
    """Batched caption generation from a trained run's params.

    ``bucket_source=True`` (default) trims the tokenized prompt to the
    smallest power-of-two column bucket >= the longest real prompt
    (min 16, capped at ``max_source_length``) before the encoder runs.
    Caption prompts are short and constant (the reference's 10-token COCO
    prompt vs ``max_source_length`` 256), so this cuts the frozen text
    -encoder forward ~16x and the decoder's per-step cross-attention K/V
    ~4x at the flagship geometry — semantically free, since every trimmed
    column is pad the attention masks already exclude (the same static
    -shape 'longest' recovery as the train loop's ``--bucket_lengths``).
    """

    def __init__(self, config: Config, params: Any,
                 tokenizer: TokenizerBase, bucket_source: bool = True,
                 decode_int8: bool = False, device=None):
        if config.pipeline_stages > 1:
            # Incremental decode is a sequential KV-cache loop — nothing to
            # pipeline. Fold the stage axis back into the scanned-layer
            # layout (a pure reshape) and run the plain model, so training
            # -time caption tracking works unchanged under --pipeline_stages.
            import dataclasses

            from ..models.t5 import unpipeline_t5_params

            params = dict(params)
            params["transformer"] = unpipeline_t5_params(
                params["transformer"])
            # Reset the pipe factor to 1 in BOTH mesh fields: the pipeline
            # factor may live on the DCN axis (--dcn_mesh_shape; config
            # validates ici*dcn == stages), and leaving either non-1 makes
            # dataclasses.replace fail re-validation.
            pipe_idx = config.mesh_axis_names.index("pipe")

            def _reset_pipe(shape):
                s = list(shape)
                if pipe_idx < len(s):
                    s[pipe_idx] = 1
                return tuple(s)

            config = dataclasses.replace(
                config, pipeline_stages=1, pipeline_microbatches=0,
                mesh_shape=_reset_pipe(config.mesh_shape),
                dcn_mesh_shape=_reset_pipe(config.dcn_mesh_shape))
        self.config = config
        # ``device``: pin this captioner to ONE device (replica serving,
        # serve/replicas.py). Params commit to it here; inputs commit in
        # ``_encode_prefill``; jit then compiles/executes per the committed
        # placement, so N replicas on N chips never contend. None keeps
        # JAX's default placement (single-device serving, training evals).
        self.device = device
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self.tokenizer = tokenizer
        self.bucket_source = bucket_source
        self.model = MultiModalModel(config)
        # ``decode_int8``: serving-time weight-only quantization of the
        # sequential decode loop (infer/quantize.py). The encoder prefill
        # (one batched forward) keeps full-precision params; only the
        # per-step HBM weight stream shrinks.
        # KLAB_DECODE_SPECULATIVE=<K>: opt the plain-greedy decode into
        # prompt-lookup speculative decoding with draft length K
        # (infer/speculative.py; token-identical output, fewer decoder
        # passes when drafts accept — measured in BASELINE.md). Same
        # env-lever family as KLAB_DECODE_INT8.
        self._speculative_draft = int(
            os.environ.get("KLAB_DECODE_SPECULATIVE", "0"))
        self._decode_params = params["transformer"]
        if decode_int8:
            from .quantize import quantize_for_decode

            self._decode_params = quantize_for_decode(params["transformer"])
            if device is not None:
                self._decode_params = jax.device_put(self._decode_params,
                                                     device)
        # The encode prefill MUST be jitted: an eager `model.apply` runs the
        # whole SwinV2+T5 encoder op-by-op (thousands of device dispatches —
        # measured 3.2 s/caption over a tunneled chip vs 39 ms compiled).
        # Source widths are power-of-two buckets and batch sizes come from
        # the service's bucket set, so the compiled-program set stays small.
        self._encode = jax.jit(
            lambda params, images, ids, mask: self.model.apply(
                {"params": params}, images, ids, mask,
                method=self.model.encode_for_generation))

    def caption(self, images_uint8: np.ndarray,
                prompts: Optional[Sequence[str]] = None,
                max_length: Optional[int] = None,
                num_beams: Optional[int] = None,
                do_sample: bool = False, temperature: float = 1.0,
                top_k: int = 0, top_p: float = 1.0,
                rng=None, min_length: int = 0,
                repetition_penalty: float = 1.0,
                no_repeat_ngram_size: int = 0) -> list[str]:
        """images (B, H, W, 3) uint8 -> captions."""
        return self.caption_finish(self.caption_launch(
            images_uint8, prompts, max_length=max_length,
            num_beams=num_beams, do_sample=do_sample,
            temperature=temperature, top_k=top_k, top_p=top_p, rng=rng,
            min_length=min_length, repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size))

    def caption_launch(self, images_uint8: np.ndarray,
                       prompts: Optional[Sequence[str]] = None,
                       max_length: Optional[int] = None,
                       num_beams: Optional[int] = None,
                       do_sample: bool = False, temperature: float = 1.0,
                       top_k: int = 0, top_p: float = 1.0,
                       rng=None, min_length: int = 0,
                       repetition_penalty: float = 1.0,
                       no_repeat_ngram_size: int = 0) -> jax.Array:
        """Enqueue the device work (encode prefill + decode loop) and
        return the token-id device array WITHOUT blocking on it — JAX
        dispatch is asynchronous, so a serving pipeline can launch batch
        N+1 while this batch computes. ``caption_finish`` blocks."""
        enc_hidden, enc_mask = self._encode_prefill(images_uint8, prompts)
        cfg = self.config
        return generate(
            self.model.transformer_module(), self._decode_params,
            enc_hidden, enc_mask,
            max_length=max_length or cfg.generate_max_length,
            num_beams=num_beams or cfg.num_beams,
            do_sample=do_sample, temperature=temperature, top_k=top_k,
            top_p=top_p, rng=rng, min_length=min_length,
            repetition_penalty=repetition_penalty,
            no_repeat_ngram_size=no_repeat_ngram_size,
            speculative_draft=self._speculative_draft)

    def caption_finish(self, ids: jax.Array) -> list[str]:
        """Block on the device read and detokenize (host work)."""
        return self.tokenizer.batch_decode(np.asarray(ids),
                                           skip_special_tokens=True)

    def _encode_prefill(self, images_uint8: np.ndarray,
                        prompts: Optional[Sequence[str]]):
        """Tokenize + bucket the prompts, normalize images, run the jitted
        encode: the shared front half of batch and streaming captioning."""
        cfg = self.config
        B = images_uint8.shape[0]
        prompts = list(prompts) if prompts is not None else [COCO_PROMPT] * B
        enc_in = self.tokenizer(prompts, max_length=cfg.max_source_length)
        src_ids = np.asarray(enc_in.input_ids)
        src_mask = np.asarray(enc_in.attention_mask)
        # In reference_pad_quirks mode pads are deliberately attended
        # (quirk #3 bit-parity), so trimming them would change results.
        # MoE models are excluded too: expert capacity quantizes on the
        # STATIC padded width (ops/moe.py:moe_capacity), so trimming
        # changes which tokens overflow — same reason config.py refuses
        # bucket_lengths with moe_experts.
        if (self.bucket_source and not cfg.reference_pad_quirks
                and not cfg.moe_experts):
            # Tokenize at full length first so truncation semantics never
            # change, then trim pad columns to the bucket (the SAME width
            # policy as the train loop's --bucket_lengths; utils/bucketing).
            width = pow2_bucket_width(src_mask, 16)
            src_ids, src_mask = src_ids[:, :width], src_mask[:, :width]
        def commit(x):
            return (jnp.asarray(x) if self.device is None
                    else jax.device_put(x, self.device))

        images = normalize_images(commit(images_uint8))
        return self._encode(self.params, images, commit(src_ids),
                            commit(src_mask))

    def encode_tokens(self, images_uint8: np.ndarray, src_ids: np.ndarray,
                      src_mask: np.ndarray):
        """Encoder prefill from ALREADY-tokenized prompts: normalize the
        images on device and run the jitted encode at exactly the given
        source width. The continuous-batching scheduler
        (``serve/continuous.py``) uses this to keep its one fixed engine
        source width (it trims/pads the token columns itself)."""

        def commit(x):
            return (jnp.asarray(x) if self.device is None
                    else jax.device_put(x, self.device))

        images = normalize_images(commit(images_uint8))
        return self._encode(self.params, images, commit(src_ids),
                            commit(src_mask))

    def caption_stream(self, images_uint8: np.ndarray,
                       prompts: Optional[Sequence[str]] = None,
                       max_length: Optional[int] = None,
                       chunk_size: int = 4, do_sample: bool = False,
                       temperature: float = 1.0, top_k: int = 0,
                       top_p: float = 1.0, rng=None, min_length: int = 0,
                       repetition_penalty: float = 1.0,
                       no_repeat_ngram_size: int = 0):
        """Streaming captioning: a generator yielding ``(texts, done)``
        with cumulative decoded captions after the first token and then
        after every ``chunk_size`` tokens. The final yield's texts equal
        :meth:`caption`'s output for the same arguments (greedy and
        sampling; beams don't stream — see ``generate.stream_decode``)."""
        enc_hidden, enc_mask = self._encode_prefill(images_uint8, prompts)
        cfg = self.config
        for tokens, n_valid, done in stream_decode(
                self.model.transformer_module(), self._decode_params,
                enc_hidden, enc_mask,
                max_length=max_length or cfg.generate_max_length,
                chunk_size=chunk_size, do_sample=do_sample,
                temperature=temperature, top_k=top_k, top_p=top_p, rng=rng,
                min_length=min_length,
                repetition_penalty=repetition_penalty,
                no_repeat_ngram_size=no_repeat_ngram_size):
            yield (self.tokenizer.batch_decode(
                tokens[:, :n_valid], skip_special_tokens=True), done)
