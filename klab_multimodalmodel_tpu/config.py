"""Configuration system.

Reference parity: mirrors the 15 argparse flags of
``/root/reference/modules/config.py:3-24`` (same names, defaults, and choices),
extended with TPU-native knobs (mesh shape, precision, padding buckets, ...).

Unlike the reference's bare ``argparse.Namespace``, the config is a frozen
dataclass that is serialized into the run directory (``config.json``) so every
run is reproducible.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from typing import Any, Sequence


# ---------------------------------------------------------------------------
# Model geometry tables
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class T5Size:
    """Geometry + recipe of a T5 checkpoint family member.

    Matches the published google/t5 configs (the reference loads these via
    ``T5ForConditionalGeneration.from_pretrained`` at
    ``/root/reference/models/model.py:14-17``). ``feed_forward_proj`` and
    ``tie_word_embeddings`` parameterize the recipe beyond the reference's
    v1.0 five: v1.1 / Flan checkpoints use gated-gelu MLPs and an untied
    LM head.
    """

    d_model: int
    d_kv: int
    d_ff: int
    num_layers: int
    num_decoder_layers: int
    num_heads: int
    vocab_size: int = 32128
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "relu"  # original T5 uses un-gated ReLU MLPs
    tie_word_embeddings: bool = True
    pad_token_id: int = 0
    eos_token_id: int = 1
    decoder_start_token_id: int = 0


# The five sizes the reference exposes via --language_model_name /
# --transformer_model_name choices (/root/reference/modules/config.py:8-9).
T5_SIZES: dict[str, T5Size] = {
    "t5-small": T5Size(d_model=512, d_kv=64, d_ff=2048, num_layers=6,
                       num_decoder_layers=6, num_heads=8),
    "t5-base": T5Size(d_model=768, d_kv=64, d_ff=3072, num_layers=12,
                      num_decoder_layers=12, num_heads=12),
    "t5-large": T5Size(d_model=1024, d_kv=64, d_ff=4096, num_layers=24,
                       num_decoder_layers=24, num_heads=16),
    "t5-3b": T5Size(d_model=1024, d_kv=128, d_ff=16384, num_layers=24,
                    num_decoder_layers=24, num_heads=32),
    "t5-11b": T5Size(d_model=1024, d_kv=128, d_ff=65536, num_layers=24,
                     num_decoder_layers=24, num_heads=128),
}

# Beyond the reference choices: the T5 v1.1 recipe (gated tanh-GELU MLPs,
# untied LM head — models/t5.py:T5Mlp) and its Flan instruction-tuned twins,
# the natural modern drop-ins for the reference's t5-large towers. Same
# geometries as the HF configs of the same names.


def _v11(d_model, d_ff, num_layers, num_heads):
    return T5Size(d_model=d_model, d_kv=64, d_ff=d_ff, num_layers=num_layers,
                  num_decoder_layers=num_layers, num_heads=num_heads,
                  feed_forward_proj="gated-gelu", tie_word_embeddings=False)


for _stem in ("google/t5-v1_1", "google/flan-t5"):
    T5_SIZES[f"{_stem}-small"] = _v11(512, 1024, 8, 6)
    T5_SIZES[f"{_stem}-base"] = _v11(768, 2048, 12, 12)
    T5_SIZES[f"{_stem}-large"] = _v11(1024, 2816, 24, 16)
    T5_SIZES[f"{_stem}-xl"] = _v11(2048, 5120, 24, 32)
    T5_SIZES[f"{_stem}-xxl"] = _v11(4096, 10240, 24, 64)
del _stem  # registration loop variable; not part of the module API


@dataclasses.dataclass(frozen=True)
class SwinV2Size:
    """Geometry of a SwinV2 checkpoint family member.

    Default mirrors microsoft/swinv2-base-patch4-window8-256, the reference's
    default --image_model_name (/root/reference/modules/config.py:6).
    """

    image_size: int = 256
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 128
    depths: tuple[int, ...] = (2, 2, 18, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    drop_path_rate: float = 0.1
    pretrained_window_sizes: tuple[int, ...] = (0, 0, 0, 0)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @property
    def num_patches_out(self) -> int:
        side = self.image_size // self.patch_size // 2 ** (len(self.depths) - 1)
        return side * side


SWINV2_SIZES: dict[str, SwinV2Size] = {
    "microsoft/swinv2-tiny-patch4-window8-256": SwinV2Size(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "microsoft/swinv2-small-patch4-window8-256": SwinV2Size(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "microsoft/swinv2-base-patch4-window8-256": SwinV2Size(),
    "microsoft/swinv2-large-patch4-window12-192-22k": SwinV2Size(
        image_size=192, embed_dim=192, depths=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 48), window_size=12),
}


# ---------------------------------------------------------------------------
# Main run config
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Config:
    """One config object for training + inference.

    The first block reproduces the reference's argparse surface one-to-one
    (/root/reference/modules/config.py:3-24). The second block holds
    TPU-native settings that have no reference counterpart.
    """

    # --- reference-compatible flags (names, defaults, choices preserved) ---
    image_model_name: str = "microsoft/swinv2-base-patch4-window8-256"
    image_model_train: bool = False
    language_model_name: str = "t5-large"
    transformer_model_name: str = "t5-large"
    max_source_length: int = 256
    max_target_length: int = 128
    lr: float = 0.001
    lr_scheduler: str = ""  # '', cosine, linear, exponential, step
    batch_size: int = 64  # per-chip batch size (per-GPU in the reference)
    accumulation_steps: int = 1
    num_epochs: int | None = None
    num_steps: int | None = None
    save_interval: int | None = None
    data_dir: str = "/user/data/mscoco2017/"
    result_dir: str = "results/"

    # --- TPU-native extensions ---
    seed: int = 0
    # Mesh: data x fsdp x tensor x sequence x pipeline x expert
    # parallelism. -1 on the data axis means "all remaining devices".
    # Shorter tuples (pre-seq/pipe/expert layouts) are right-padded with 1.
    mesh_shape: tuple[int, ...] = (-1, 1, 1, 1, 1, 1)
    mesh_axis_names: tuple[str, ...] = ("data", "fsdp", "tensor", "seq",
                                        "pipe", "expert")
    # Multi-slice pods: per-axis DCN factors (mesh_shape becomes the
    # PER-SLICE shape). E.g. (2, 1, 1) on two v5e-256 slices = data
    # parallel across slices over DCN, fsdp/tensor inside each slice over
    # ICI (utils/mesh.py:make_mesh). (1,1,1) = single slice.
    dcn_mesh_shape: tuple[int, ...] = (1, 1, 1, 1, 1, 1)
    # Compute dtype policy: params fp32, activations bf16 (MXU-native).
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Remat policy for transformer layers: '', 'full', 'dots_saveable'.
    remat: str = ""
    # Scan-over-layers unroll factor: 0 = fully unroll (best runtime; XLA
    # fuses/pipelines across layers), 1 = pure while-loop scan (fastest
    # compile), n = partial. Measured on v5e: full unroll is ~25% faster.
    scan_unroll: int = 0
    # PRNG implementation for dropout keys: 'rbg' uses the TPU hardware
    # generator (threefry dropout costs ~50% extra on the t5 grad step).
    dropout_rng_impl: str = "rbg"
    # Optimizer: 'adam' (reference parity, train.py:28) or 'adafactor'
    # (T5's original optimizer; factored second moments cut optimizer HBM by
    # ~6 GB for t5-large, enabling the full flagship on one 16 GB chip).
    optimizer: str = "adam"
    # dtype for Adam's first moment (optax mu_dtype): 'bfloat16' halves the
    # mu read+write HBM traffic of the update step (the second moment stays
    # fp32 — it feeds a sqrt and needs the dynamic range). Slightly changes
    # update numerics, so fp32 default; measured impact in BASELINE.md.
    adam_mu_dtype: str = "float32"
    # Store the FROZEN towers' params in bf16 (they only feed bf16 compute
    # and receive no updates — numerically identical to the compute path).
    frozen_param_dtype: str = "float32"
    # dtype of the SwinV2 attention logits/softmax chain. The fp32 default
    # matches HF numerics; 'bfloat16' halves the dominant VPU/HBM cost of
    # the frozen vision tower (cosine-attention logits are bounded, so bf16
    # softmax is numerically safe; measured impact in BASELINE.md).
    swin_softmax_dtype: str = "float32"
    # SwinV2 MLP activation: exact erf GELU (HF parity) vs the tanh
    # approximation — erf is the VPU-heaviest op of the frozen MLPs
    # (~500M elements/step at batch 32); deviation ~1e-3, opt-in.
    swin_gelu_approximate: bool = False
    # Route SwinV2 window attention through the fused Pallas kernel.
    # Measured 0.91x XLA on v5e for the 256px geometry (XLA's fusions are
    # already near the VPU/bandwidth bound there) — default off; the kernel
    # is the foundation for long-context / larger-window configs.
    use_pallas_attention: bool = False
    # Route T5 full-sequence attention (both towers + enc-dec) through the
    # fused Pallas kernel with per-stack bias packing and in-kernel dropout.
    # Measured 0.86x XLA on the full train step at the bench geometry
    # (BASELINE.md ablation; tools/bench_t5_pallas.py) — the recompute
    # backward costs more than fused dropout saves at these short sequence
    # lengths, so default off. Decode steps always use the XLA path.
    use_pallas_t5_attention: bool = False
    # Sequence-parallel attention backend, effective only when the mesh's
    # ``seq`` axis is >1 (--mesh_shape D F T S). 'allgather' (default):
    # the XLA SPMD partitioner gathers full K/V per device — optimal at
    # reference-scale sequences. 'ring': K/V stay sharded and rotate over
    # the seq axis via ppermute with a flash-style running softmax
    # (ops/ring_attention.py) — O(L/n) activation memory per device, the
    # long-context layout. Both are loss-equivalent to the dense path
    # (tests/test_ring_attention.py, test_spmd_equivalence.py).
    seq_attention: str = "allgather"
    # Pipeline parallelism over the mesh's ``pipe`` axis: the MAIN
    # transformer's encoder/decoder layer stacks are split into this many
    # stages (each holding num_layers/stages contiguous layers, params
    # sharded P('pipe', ...)) and executed as a GPipe microbatch pipeline —
    # a lax.scan over ticks whose stage-shift lowers to collective-permute
    # over ICI (models/t5.py:_PipelineTicks). The frozen towers stay
    # unpipelined (they are a fraction of the transformer's depth/FLOPs).
    # Requires the mesh's pipe axis == pipeline_stages when > 1.
    pipeline_stages: int = 1
    # Microbatches per step for the pipeline (bubble fraction =
    # (S-1)/(M+S-1)). 0 = pipeline_stages. Must divide the per-step batch.
    pipeline_microbatches: int = 0
    # Mixture-of-Experts (SURVEY.md §2D EP row — beyond the reference):
    # replace every MLP of the MAIN transformer's blocks with a
    # Switch-style sparse MoE of this many experts (each a full d_ff FFN).
    # Expert weights and dispatched tokens shard over the mesh's
    # ``expert`` axis (ops/moe.py; the token exchange is XLA-inserted).
    # 0 = dense (default). The frozen towers stay dense. A fresh-trained
    # architecture — no pretrained T5 checkpoint maps onto it.
    moe_experts: int = 0
    # Experts per token: 1 = Switch Transformer, 2 = GShard-style top-2.
    moe_top_k: int = 1
    # Per-expert slot capacity = ceil(top_k * tokens/experts * factor);
    # overflowed tokens skip the MLP (residual passes them through).
    moe_capacity_factor: float = 1.25
    # Weight of the Switch load-balancing auxiliary loss added to the CE
    # loss (the Switch paper's 1e-2 default).
    moe_aux_loss_weight: float = 0.01
    # Quirk #3 compatibility (SURVEY.md §2A): the reference never builds
    # attention masks and does not mask pad positions out of the loss.
    # Defaults fix both; set True for bit-parity with the reference.
    reference_pad_quirks: bool = False
    # Quirk #1 (SURVEY.md §2A): reference's optimizer covers only the
    # transformer even when Swin is trainable. Default fixes it; the flag
    # reproduces the reference behaviour exactly.
    freeze_image_model_updates: bool = False
    # Optional learned projection between vision features and d_model
    # (quirk #8 fix); initialised to identity when dims already match.
    use_vision_projection: bool = True
    # Tokenizer: a HuggingFace tokenizers JSON file (unigram/BPE), a raw
    # SentencePiece ``spiece.model`` proto (the reference's tokenizer
    # artifact, converted in-memory), or '' for the byte fallback
    # (tests / smoke runs).
    tokenizer_path: str = ""
    # Batch-encode through the native C++ unigram core
    # (native/klab_host.cpp) instead of the Python/Rust tokenizers path —
    # same full HF-T5 chain (charsmap, strip, metaspace, sentinels),
    # parity-pinned by tests/test_native.py. Requires tokenizer_path and
    # the built native library.
    native_tokenizer: bool = False
    # Initialize params from a converted pretrained checkpoint (the --output
    # dir of tools/convert_hf_checkpoint.py) when starting a fresh run — the
    # equivalent of the reference's startup from_pretrained pulls
    # (models/model.py:14-17). Ignored when resuming from a train-state
    # checkpoint in result_dir.
    init_checkpoint: str = ""
    # Debug config (SURVEY.md §5 race-detection/sanitizer row): NaN checks
    # and a guard against silent host<->device transfers inside the step.
    debug_nans: bool = False
    debug_transfer_guard: bool = False
    # Cache the frozen image tower's features across epochs: with the vision
    # tower frozen (the reference's default recipes, run_scripts/caption/
    # train_only_transformer.sh — quirk #1 means even `train_with_swin`
    # never updates it), its forward is deterministic, so recomputing the
    # SwinV2 forward every step for 50 epochs is redundant work. When set,
    # the train loop extracts features once (epoch 1) into a memory-mapped
    # cache under result_dir and later epochs train the transformer directly
    # on cached features — bit-identical losses, ~2x step throughput at the
    # bench geometry. Requires image_model_train=False.
    cache_frozen_features: bool = False
    # Preemption / mid-epoch resume (SURVEY.md §5 checkpoint row: full
    # train-state incl. RNG + data-iterator state). halt_after_steps > 0
    # stops after that many optimizer steps, saving a step_N checkpoint
    # with the within-epoch cursor, dropout RNG and loss partials — a
    # resumed run is bit-identical to the uninterrupted one
    # (tests/test_train.py::test_bit_exact_midepoch_resume).
    halt_after_steps: int = 0
    # Save the same preemption checkpoint on SIGTERM (the signal TPU
    # preemption / maintenance events deliver) after the in-flight
    # optimizer step completes.
    save_on_sigterm: bool = True
    # Multi-process runs reach SIGTERM consensus (a tiny cross-host
    # all-gather of the signal flag) every N optimizer steps, so ALL
    # processes enter the collective preemption save together even when
    # the signal lands on one host. Single-process runs halt immediately.
    preempt_sync_steps: int = 10
    # Leftover microbatches when len(loader) % accumulation_steps != 0
    # (the reference runs a ragged final partial update, train.py:61-67):
    #   'pad'   - run the final partial update with zero-weight padding rows
    #             (gradient-exact equivalent of the reference's ragged step);
    #   'drop'  - skip the leftovers (changes step counts vs the reference);
    #   'error' - refuse to run with a non-divisible loader length.
    accumulation_tail: str = "pad"
    # Profiling (SURVEY.md §5.1): trace the first N optimizer steps of the
    # first epoch into {result_dir}/profile (0 = off), and optionally serve
    # the live profiler endpoint for TensorBoard's profile plugin.
    profile_steps: int = 0
    profile_server_port: int = 0  # 0 = off
    # Optional TensorBoard scalars (train/val loss, LR, img/s) under
    # {result_dir}/tb — beyond-reference observability (SURVEY.md §5).
    tensorboard: bool = False
    # Data pipeline
    num_workers: int = 0  # 0 = os.cpu_count() // 4, mirroring loader.py:88
    # Bucketed dynamic padding: trim each update group's source/target
    # padding to the smallest power-of-two bucket >= its longest real row
    # (floors 16/8, capped at max_*_length). The TPU-static-shape
    # equivalent of the reference's padding='longest' (quirk #4,
    # /root/reference/train.py:56): one cached XLA program per bucket, and
    # the default parity recipe stops paying 256-column attention over
    # ~10-token caption prompts. Loss-identical (pads are masked out of
    # attention and loss; equivalence pinned by test_train.py). Not
    # compatible with reference_pad_quirks (pads IN the loss there).
    bucket_lengths: bool = False
    # Decode workers: 'thread' (PIL releases the GIL for jpeg decode) or
    # 'process' (fork()ed workers, the torch num_workers equivalent —
    # loader.py:88) for loads where per-sample Python work would serialize
    # on the GIL. Measured scaling in BASELINE.md (tools/bench_pipeline.py).
    decode_workers: str = "thread"
    prefetch_batches: int = 2
    log_every_steps: int = 50
    # Training-time caption-quality tracking (beyond the reference, which
    # has no quantitative evaluation): every N epochs greedy-decode up to
    # eval_captions_limit COCO-val images and log CIDEr-D / BLEU-4
    # (official PTB tokenization). Needs a COCO-layout data_dir;
    # single-process runs only (decode is not sharded across processes).
    eval_captions_every: int = 0
    eval_captions_limit: int = 256
    # Generation defaults — HF GenerationConfig defaults the reference
    # inherits via transformer.generate (models/model.py:28): greedy,
    # max_length=20, decoder_start = pad id.
    generate_max_length: int = 20
    num_beams: int = 1

    def __post_init__(self) -> None:
        # Normalize mesh fields: 3-tuples (pre-seq-axis configs, incl. every
        # serialized run dir from earlier rounds) are right-padded to the
        # 4-axis (data, fsdp, tensor, seq) layout.
        canonical = ("data", "fsdp", "tensor", "seq", "pipe", "expert")
        names = tuple(self.mesh_axis_names)
        if names == canonical[:len(names)]:
            names = canonical
        object.__setattr__(self, "mesh_axis_names", names)
        for field_name in ("mesh_shape", "dcn_mesh_shape"):
            shape = tuple(int(s) for s in getattr(self, field_name))
            if not 3 <= len(shape) <= len(names):
                raise ValueError(
                    f"{field_name}={shape}: expected 3 or {len(names)} axes")
            shape = shape + (1,) * (len(names) - len(shape))
            object.__setattr__(self, field_name, shape)
        if self.lr_scheduler not in ("", "cosine", "linear", "exponential", "step"):
            raise ValueError(f"unknown lr_scheduler {self.lr_scheduler!r}")
        # dtype-string knobs: consumers test == 'bfloat16', so a typo (e.g.
        # 'bf16') would otherwise silently fall back to fp32 when Config is
        # constructed programmatically (bench/tools bypass argparse choices).
        for field_name in ("compute_dtype", "param_dtype", "adam_mu_dtype",
                           "frozen_param_dtype", "swin_softmax_dtype"):
            v = getattr(self, field_name)
            if v not in ("float32", "bfloat16"):
                raise ValueError(
                    f"{field_name}={v!r}: expected 'float32' or 'bfloat16'")
        if self.optimizer not in ("adam", "adafactor"):
            raise ValueError(f"unknown optimizer {self.optimizer!r}")
        if self.seq_attention not in ("allgather", "ring"):
            raise ValueError(
                f"unknown seq_attention {self.seq_attention!r}")
        # Axis sizes by name (custom axis-name lists may be shorter). The
        # global mesh axis is the ICI factor x the DCN factor — a pipe or
        # expert factor placed in --dcn_mesh_shape must trip the same
        # validation (it would otherwise build a replicated axis nothing
        # shards over: a correct-looking run at half throughput).
        # Returns None when the factor is the -1 wildcard ("remaining
        # devices", resolved against the device count at mesh build):
        # size-dependent checks (divisibility, == stages) are skipped for
        # it, but the requires-a-flag checks still fire — an explicit -1
        # on a special axis states intent to use that axis.
        def _axis(name: str) -> int | None:
            try:
                i = self.mesh_axis_names.index(name)
            except ValueError:
                return 1
            ici = self.mesh_shape[i] if i < len(self.mesh_shape) else 1
            dcn = (self.dcn_mesh_shape[i]
                   if i < len(self.dcn_mesh_shape) else 1)
            if ici == -1 or dcn == -1:
                return None
            return ici * dcn

        if self.pipeline_stages > 1:
            if self.seq_attention == "ring":
                raise ValueError(
                    "pipeline_stages > 1 with seq_attention='ring' is not "
                    "supported (shard_map inside the pipeline's vmapped "
                    "stages); use the default allgather seq path")
            if self.use_pallas_t5_attention:
                raise ValueError(
                    "pipeline_stages > 1 with use_pallas_t5_attention is "
                    "not supported; drop one of the flags")
            if _axis("pipe") not in (None, 1, self.pipeline_stages):
                raise ValueError(
                    f"mesh pipe axis {_axis('pipe')} must equal "
                    f"pipeline_stages={self.pipeline_stages} (or 1 to run "
                    "the schedule unsharded)")
            if _axis("seq") != 1:
                raise ValueError(
                    "pipeline_stages > 1 with a seq mesh axis > 1 is not "
                    "supported (sharding constraints inside the vmapped "
                    "stages); shard long sequences with --mesh_shape seq "
                    "instead of the pipeline")
        elif _axis("pipe") != 1:
            raise ValueError(
                f"mesh pipe axis {_axis('pipe')} > 1 requires "
                "--pipeline_stages to match")
        if self.moe_experts > 0:
            if self.moe_top_k not in (1, 2):
                raise ValueError(
                    f"moe_top_k={self.moe_top_k}: expected 1 (Switch) "
                    "or 2 (GShard)")
            if self.pipeline_stages > 1:
                raise ValueError(
                    "moe_experts > 0 with pipeline_stages > 1 is not "
                    "supported (the MoE aux loss does not thread through "
                    "the pipeline tick schedule); shard experts with the "
                    "mesh expert axis instead")
            expert_axis = _axis("expert")
            if (expert_axis is not None
                    and self.moe_experts % max(expert_axis, 1) != 0):
                raise ValueError(
                    f"moe_experts={self.moe_experts} must be divisible by "
                    f"the mesh expert axis {expert_axis}")
            if self.moe_capacity_factor <= 0:
                raise ValueError("moe_capacity_factor must be positive")
            if self.bucket_lengths:
                raise ValueError(
                    "moe_experts > 0 with bucket_lengths is not supported: "
                    "expert capacity quantizes on the (static) padded "
                    "sequence length, so per-bucket capacities would break "
                    "bucket_lengths' loss-identity guarantee; run MoE at "
                    "fixed max lengths")
        elif _axis("expert") != 1:
            raise ValueError(
                f"mesh expert axis {_axis('expert')} > 1 requires "
                "--moe_experts")
        if self.accumulation_tail not in ("pad", "drop", "error"):
            raise ValueError(
                f"unknown accumulation_tail {self.accumulation_tail!r}")
        if self.bucket_lengths and self.reference_pad_quirks:
            raise ValueError(
                "bucket_lengths trims pad columns, but reference_pad_quirks "
                "keeps every position in the loss — the combination cannot "
                "be bit-exact; drop one of the flags")
        if self.cache_frozen_features and self.image_model_train:
            raise ValueError(
                "cache_frozen_features requires a frozen vision tower "
                "(image_model_train=False): a tower that takes gradient "
                "updates produces different features every step")

    # -- derived model geometries ------------------------------------------
    @property
    def language_t5(self) -> T5Size:
        return _t5_size(self.language_model_name)

    @property
    def transformer_t5(self) -> T5Size:
        return _t5_size(self.transformer_model_name)

    @property
    def swin(self) -> SwinV2Size:
        return _swin_size(self.image_model_name)

    # -- (de)serialization -------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    def save(self, result_dir: str | None = None) -> str:
        path = os.path.join(result_dir or self.result_dir, "config.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())
        return path

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        field_names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in field_names}
        for key in ("mesh_shape", "mesh_axis_names", "dcn_mesh_shape"):
            if key in kwargs and isinstance(kwargs[key], list):
                kwargs[key] = tuple(kwargs[key])
        return cls(**kwargs)


# Custom geometry registry: lets tests and users register tiny model sizes
# under arbitrary names without touching the published tables.
_CUSTOM_T5: dict[str, T5Size] = {}
_CUSTOM_SWIN: dict[str, SwinV2Size] = {}


def register_t5_size(name: str, size: T5Size) -> None:
    _CUSTOM_T5[name] = size


def register_swin_size(name: str, size: SwinV2Size) -> None:
    _CUSTOM_SWIN[name] = size


def _t5_size(name: str) -> T5Size:
    if name in _CUSTOM_T5:
        return _CUSTOM_T5[name]
    if name in T5_SIZES:
        return T5_SIZES[name]
    raise KeyError(f"unknown T5 model name {name!r}; register_t5_size() first")


def _swin_size(name: str) -> SwinV2Size:
    if name in _CUSTOM_SWIN:
        return _CUSTOM_SWIN[name]
    if name in SWINV2_SIZES:
        return SWINV2_SIZES[name]
    raise KeyError(
        f"unknown SwinV2 model name {name!r}; register_swin_size() first")


# ---------------------------------------------------------------------------
# CLI — flag-name compatible with /root/reference/modules/config.py
# ---------------------------------------------------------------------------


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="KLab MultiModalModel — TPU-native (JAX/XLA/Pallas)")
    d = Config()
    # Reference flags — names/defaults/choices preserved
    # (/root/reference/modules/config.py:5-22).
    parser.add_argument("--image_model_name", type=str, default=d.image_model_name)
    parser.add_argument("--image_model_train", action="store_true")
    parser.add_argument("--language_model_name", type=str,
                        default=d.language_model_name,
                        choices=list(T5_SIZES.keys()) + list(_CUSTOM_T5.keys()))
    parser.add_argument("--transformer_model_name", type=str,
                        default=d.transformer_model_name,
                        choices=list(T5_SIZES.keys()) + list(_CUSTOM_T5.keys()))
    parser.add_argument("--max_source_length", type=int, default=d.max_source_length)
    parser.add_argument("--max_target_length", type=int, default=d.max_target_length)
    parser.add_argument("--lr", type=float, default=d.lr)
    parser.add_argument("--lr_scheduler", type=str, default=d.lr_scheduler,
                        choices=["", "cosine", "linear", "exponential", "step"])
    parser.add_argument("--batch_size", type=int, default=d.batch_size)
    parser.add_argument("--accumulation_steps", type=int, default=d.accumulation_steps)
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--num_steps", type=int, default=None)
    parser.add_argument("--save_interval", type=int, default=None)
    parser.add_argument("--data_dir", type=str, default=d.data_dir)
    parser.add_argument("--result_dir", type=str, default=d.result_dir)
    # TPU-native extensions
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument(
        "--mesh_shape", type=int, nargs="+", default=list(d.mesh_shape),
        help="3-6 ints: DATA FSDP TENSOR [SEQ [PIPE [EXPERT]]] "
             "(ICI factors; -1 = remaining devices)")
    parser.add_argument(
        "--dcn_mesh_shape", type=int, nargs="+",
        default=list(d.dcn_mesh_shape),
        help="3-6 ints: DATA FSDP TENSOR [SEQ [PIPE [EXPERT]]] "
             "(DCN factors for multi-slice; global axis = ICI x DCN)")
    parser.add_argument("--compute_dtype", type=str, default=d.compute_dtype,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--remat", type=str, default=d.remat,
                        choices=["", "full", "dots_saveable"])
    parser.add_argument("--scan_unroll", type=int, default=d.scan_unroll)
    parser.add_argument("--optimizer", type=str, default=d.optimizer,
                        choices=["adam", "adafactor"])
    parser.add_argument("--adam_mu_dtype", type=str, default=d.adam_mu_dtype,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--frozen_param_dtype", type=str,
                        default=d.frozen_param_dtype,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--use_pallas_attention", action="store_true")
    parser.add_argument("--swin_softmax_dtype", type=str,
                        default=d.swin_softmax_dtype,
                        choices=["float32", "bfloat16"])
    parser.add_argument("--swin_gelu_approximate", action="store_true")
    parser.add_argument("--use_pallas_t5_attention", action="store_true")
    parser.add_argument("--seq_attention", type=str, default=d.seq_attention,
                        choices=["allgather", "ring"])
    parser.add_argument("--pipeline_stages", type=int,
                        default=d.pipeline_stages)
    parser.add_argument("--pipeline_microbatches", type=int,
                        default=d.pipeline_microbatches)
    parser.add_argument("--moe_experts", type=int, default=d.moe_experts)
    parser.add_argument("--moe_top_k", type=int, default=d.moe_top_k)
    parser.add_argument("--moe_capacity_factor", type=float,
                        default=d.moe_capacity_factor)
    parser.add_argument("--moe_aux_loss_weight", type=float,
                        default=d.moe_aux_loss_weight)
    parser.add_argument("--reference_pad_quirks", action="store_true")
    parser.add_argument("--freeze_image_model_updates", action="store_true")
    parser.add_argument("--cache_frozen_features", action="store_true")
    parser.add_argument("--tokenizer_path", type=str, default=d.tokenizer_path)
    parser.add_argument("--native_tokenizer", action="store_true")
    parser.add_argument("--halt_after_steps", type=int,
                        default=d.halt_after_steps)
    parser.add_argument("--init_checkpoint", type=str,
                        default=d.init_checkpoint)
    parser.add_argument("--num_workers", type=int, default=d.num_workers)
    parser.add_argument("--decode_workers", type=str,
                        default=d.decode_workers,
                        choices=["thread", "process"])
    parser.add_argument("--bucket_lengths", action="store_true")
    parser.add_argument("--accumulation_tail", type=str,
                        default=d.accumulation_tail,
                        choices=["pad", "drop", "error"])
    parser.add_argument("--tensorboard", action="store_true")
    parser.add_argument("--profile_steps", type=int, default=d.profile_steps)
    parser.add_argument("--profile_server_port", type=int,
                        default=d.profile_server_port)
    parser.add_argument("--log_every_steps", type=int, default=d.log_every_steps)
    parser.add_argument("--eval_captions_every", type=int,
                        default=d.eval_captions_every)
    parser.add_argument("--eval_captions_limit", type=int,
                        default=d.eval_captions_limit)
    parser.add_argument("--generate_max_length", type=int, default=d.generate_max_length)
    parser.add_argument("--num_beams", type=int, default=d.num_beams)
    return parser


def parse_arguments(argv: Sequence[str] | None = None) -> Config:
    """Drop-in equivalent of the reference's ``parse_arguments``
    (/root/reference/modules/config.py:3), returning a ``Config``."""
    ns = build_arg_parser().parse_args(argv)
    kwargs: dict[str, Any] = vars(ns)
    kwargs["mesh_shape"] = tuple(kwargs["mesh_shape"])
    kwargs["dcn_mesh_shape"] = tuple(kwargs["dcn_mesh_shape"])
    return Config(**kwargs)
