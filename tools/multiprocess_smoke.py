"""One process of an N-process SPMD training job — executed evidence.

The reference's only distribution mechanism is multi-process: ``torchrun
--nnodes=1 --nproc_per_node=4`` spawns 4 OS processes that rendezvous via
c10d/NCCL (``/root/reference/train.py:12``,
``/root/reference/run_scripts/caption/train_only_transformer.sh:1``). This
tool executes the TPU-native equivalent surface for real: N OS processes
rendezvous through ``jax.distributed.initialize`` (loopback coordinator +
gloo CPU collectives in the test harness; autodetected ICI/DCN on TPU pods),
each host feeds only its data shard
(``DataLoader(process_index=...)`` -> ``make_array_from_process_local_data``),
the XLA SPMD partitioner reduces gradients across processes, and orbax
checkpoint writes/restores are collective.

Run as one process of an N-process job (tests/test_multiprocess.py and
``__graft_entry__.dryrun_multichip(n_devices, n_processes=N)`` spawn N):

  python tools/multiprocess_smoke.py --process_id I --num_processes N \
      --coordinator localhost:PORT --result_dir DIR --out OUT_I.json

Emits OUT_I.json with per-epoch global-mean losses, SHA-256 digests of the
final params/opt-state bytes, and a .npz dump of the final params. The
digests are identical across the N processes (replicated state) and across
reruns of the same topology (gloo reductions are deterministic). Across
*different* process topologies (2x4 vs 1x8) the frozen towers are
bit-identical — proving identical data sharding, init and forward — while
trainable params carry ulp-level deltas (measured max 6e-9 on the micro
model) because gloo's cross-process all-reduce and XLA's in-process
all-reduce sum partial gradients in different orders; the same is true of
NCCL vs single-GPU in the reference's world. tests/test_multiprocess.py
asserts exactly this contract.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default="localhost:9876")
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--process_id", type=int, default=0)
    p.add_argument("--devices_per_process", type=int, default=4)
    p.add_argument("--result_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_epochs", type=int, default=2)
    p.add_argument("--save_interval", type=int, default=1)
    p.add_argument("--halt_after_steps", type=int, default=0,
                   help="simulate preemption: checkpoint+exit mid-run")
    p.add_argument("--sigterm_at_tick", type=int, default=0,
                   help="deliver SIGTERM to THIS process at update N "
                        "(tests cross-process preemption consensus)")
    p.add_argument("--sigterm_on_process", type=int, default=0,
                   help="which process_id self-delivers the SIGTERM")
    p.add_argument("--preempt_sync_steps", type=int, default=10)
    p.add_argument("--dcn_data_parallel", action="store_true",
                   help="hybrid ICI x DCN mesh: per-process devices form "
                        "the slice, data parallel across processes over "
                        "the DCN axis (CPU rig: process = slice granule)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--cache_frozen_features", action="store_true")
    p.add_argument("--bucket_lengths", action="store_true")
    p.add_argument("--skew_lengths", action="store_true",
                   help="synthetic captions with extreme length spread so "
                        "hosts' local shards land in different pow2 "
                        "buckets — exercises the cross-host bucket-width "
                        "consensus in train.loop.bucket_batch")
    p.add_argument("--pretrain", action="store_true",
                   help="span-corruption synthetic data instead of captions")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="Switch-MoE transformer with the expert axis "
                        "spanning the whole job — the token-exchange "
                        "collectives cross the process boundary")
    p.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--compile_cache", default="",
                   help="persistent XLA compile-cache dir shared by the "
                        "job's processes (and across relaunches). Heavy "
                        "programs (MoE) can skew two CPU processes' first "
                        "compiles past gloo's fixed 30 s key-exchange "
                        "window; a warm cache keeps the skew near zero")
    return p.parse_args(argv)


def state_digests(state) -> dict:
    """SHA-256 over the replicated state bytes, leaf-path-ordered."""
    import jax
    import numpy as np

    def digest(tree):
        h = hashlib.sha256()
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
            h.update(str(path).encode())
            x = leaf.addressable_data(0) if hasattr(
                leaf, "addressable_data") else leaf
            h.update(np.asarray(x).tobytes())
        return h.hexdigest()

    return {"params": digest(state.params),
            "opt_state": digest(state.opt_state)}


def main(argv=None):
    args = parse_args(argv)

    # All topology setup BEFORE jax initializes a backend.
    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{args.devices_per_process}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["KLAB_CPU_COLLECTIVES"] = "gloo"
    if args.num_processes > 1:
        os.environ["KLAB_MULTIHOST"] = "1"
        os.environ["KLAB_COORDINATOR"] = args.coordinator
        os.environ["KLAB_NUM_PROCESSES"] = str(args.num_processes)
        os.environ["KLAB_PROCESS_ID"] = str(args.process_id)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from klab_multimodalmodel_tpu.config import (Config, SwinV2Size, T5Size,
                                                 register_swin_size,
                                                 register_t5_size)
    from klab_multimodalmodel_tpu.train.loop import train

    register_t5_size("t5-micro-mp", T5Size(
        d_model=32, d_kv=8, d_ff=64, num_layers=2, num_decoder_layers=2,
        num_heads=4, vocab_size=512, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0))
    register_swin_size("swin-micro-mp", SwinV2Size(
        image_size=32, patch_size=4, embed_dim=16, depths=(2, 2),
        num_heads=(2, 4), window_size=4, drop_path_rate=0.0,
        pretrained_window_sizes=(0, 0)))

    cfg = Config(
        language_model_name="t5-micro-mp",
        transformer_model_name="t5-micro-mp",
        image_model_name="swin-micro-mp",
        max_source_length=16,
        # skew mode widens the target cap so short rows bucket to 8 while
        # long rows force 32 (byte tokenizer: ~1 token/char)
        max_target_length=32 if args.skew_lengths else 8,
        batch_size=1,  # per chip -> global batch = device_count
        num_epochs=args.num_epochs, save_interval=args.save_interval,
        halt_after_steps=args.halt_after_steps,
        preempt_sync_steps=args.preempt_sync_steps,
        dcn_mesh_shape=((args.num_processes, 1, 1)
                        if args.dcn_data_parallel else (1, 1, 1)),
        # MoE mode: expert axis = the global device count, so expert
        # token-exchange collectives span OS processes (gloo on the CPU
        # rig, ICI/DCN on pods). Data axis 2 keeps a real batch dimension.
        moe_experts=args.moe_experts,
        mesh_shape=((2, 1, 1, 1, 1, -1) if args.moe_experts
                    else (-1, 1, 1)),
        compute_dtype="float32",
        cache_frozen_features=args.cache_frozen_features,
        bucket_lengths=args.bucket_lengths,
        scan_unroll=1,
        data_dir=("synthetic-pretrain" if args.pretrain
                  else "synthetic-skew" if args.skew_lengths
                  else "synthetic"),
        result_dir=args.result_dir)

    if args.sigterm_at_tick and args.process_id == args.sigterm_on_process:
        # Deterministic single-host SIGTERM: the other processes must join
        # the collective preemption save via the consensus sync.
        import signal as _signal

        from klab_multimodalmodel_tpu.obs import profiler

        orig_tick = profiler.StepWindowTrace.tick
        calls = {"n": 0}

        def tick(self):
            calls["n"] += 1
            if calls["n"] == args.sigterm_at_tick:
                os.kill(os.getpid(), _signal.SIGTERM)
            return orig_tick(self)

        profiler.StepWindowTrace.tick = tick

    out = train(cfg, resume=args.resume)

    # maybe_init_distributed ran inside train(); the topology must be real.
    assert jax.process_count() == args.num_processes, (
        jax.process_count(), args.num_processes)
    assert jax.process_index() == args.process_id

    import numpy as np

    npz_path = args.out + ".params.npz"
    leaves = jax.tree_util.tree_flatten_with_path(out["state"].params)[0]
    np.savez(npz_path, **{
        str(path): np.asarray(leaf.addressable_data(0))
        for path, leaf in leaves})

    result = {
        "process_id": args.process_id,
        "params_npz": npz_path,
        "num_processes": args.num_processes,
        "device_count": jax.device_count(),
        "losses": out["losses"],
        "steps": out["steps"],
        "min_val_loss": out["min_val_loss"],
        "halted": bool(out.get("halted", False)),
        "digests": state_digests(out["state"]),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"proc {args.process_id}/{args.num_processes}: "
          f"steps={result['steps']} params={result['digests']['params'][:16]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
