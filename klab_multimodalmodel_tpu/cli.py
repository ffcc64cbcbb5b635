"""Installed console entry points — available after ``pip install``
without a checkout.

``klab-train``: same surface as the repo-root ``train.py`` (flag-compatible
with the reference's ``/root/reference/train.py:108-109``).
``klab-eval``: CIDEr-D / BLEU-1..4 / ROUGE-L caption evaluation of a trained run over
COCO val (fills the reference's evaluation gap — it only eyeballs one
caption in ``visualization.ipynb`` cell 8).
``klab-caption``: the reference's inference demo (``visualization.ipynb``
cells 3-8) as a command — load a trained run, caption image files.
"""

from __future__ import annotations

from .config import parse_arguments
from .train import train


def main() -> None:
    train(parse_arguments())


def _load_run(result_dir: str, checkpoint: str):
    """(config, tokenizer, params) of a trained run directory — the shared
    preamble of every inference-side entry point."""
    import os

    import orbax.checkpoint as ocp

    from .config import Config
    from .text import load_tokenizer

    with open(os.path.join(result_dir, "config.json")) as f:
        config = Config.from_json(f.read())
    tokenizer = load_tokenizer(config.tokenizer_path)
    ckpt_dir = os.path.join(os.path.abspath(result_dir),
                            "checkpoints", checkpoint)
    restored = ocp.StandardCheckpointer().restore(ckpt_dir)
    params = restored["params"] if "params" in restored else restored
    return config, tokenizer, params


def eval_main() -> None:
    import argparse
    import json

    from .evaluation import run

    p = argparse.ArgumentParser(
        description="CIDEr-D / BLEU-1..4 / ROUGE-L caption evaluation over COCO val "
                    "(official PTB tokenization semantics)")
    p.add_argument("--result_dir", required=True)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N images")
    p.add_argument("--num_beams", type=int, default=None)
    args = p.parse_args()

    config, tokenizer, params = _load_run(args.result_dir, args.checkpoint)
    if args.data_dir:
        config.data_dir = args.data_dir
    if args.num_beams:
        config.num_beams = args.num_beams
    metrics = run(config, params, tokenizer, limit=args.limit)
    print(json.dumps(metrics, indent=2))


def caption_main() -> None:
    import argparse

    import numpy as np

    from .data.datasets import load_image_resized
    from .infer.captioner import Captioner

    p = argparse.ArgumentParser(
        description="Caption image files with a trained run "
                    "(the reference's visualization.ipynb demo)")
    p.add_argument("images", nargs="+", help="image file paths")
    p.add_argument("--result_dir", required=True)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--prompt", default=None,
                   help="override the training prompt (an explicitly "
                        "empty string probes promptless decoding)")
    p.add_argument("--max_length", type=int, default=None)
    p.add_argument("--num_beams", type=int, default=None)
    p.add_argument("--min_length", type=int, default=0)
    p.add_argument("--repetition_penalty", type=float, default=1.0)
    p.add_argument("--no_repeat_ngram_size", type=int, default=0)
    args = p.parse_args()

    config, tokenizer, params = _load_run(args.result_dir, args.checkpoint)
    captioner = Captioner(config, params, tokenizer)
    images = np.stack([load_image_resized(path, config.swin.image_size)
                       for path in args.images])
    prompts = ([args.prompt] * len(args.images)
               if args.prompt is not None else None)
    captions = captioner.caption(
        images, prompts=prompts, max_length=args.max_length,
        num_beams=args.num_beams, min_length=args.min_length,
        repetition_penalty=args.repetition_penalty,
        no_repeat_ngram_size=args.no_repeat_ngram_size)
    for path, text in zip(args.images, captions):
        print(f"{path}\t{text}")


def serve_main() -> None:
    import argparse

    from .serve.http import CaptionHTTPServer
    from .serve.service import CaptionService

    p = argparse.ArgumentParser(
        description="Serve a trained run over HTTP with dynamic batching "
                    "(POST /caption, streaming POST /caption_stream, "
                    "GET /healthz, GET /stats)")
    p.add_argument("--result_dir", required=True)
    p.add_argument("--checkpoint", default="best")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8,
                   help="largest coalesced batch; requests pad to "
                        "power-of-two buckets up to this")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="how long the first queued request waits for "
                        "companions before its batch dispatches")
    p.add_argument("--no_warmup", action="store_true",
                   help="skip pre-compiling the batch buckets (first "
                        "requests then pay XLA compiles)")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decode (infer/quantize.py): "
                        "~4x less HBM weight traffic per decode step")
    p.add_argument("--speculative_draft", type=int, default=0,
                   help="prompt-lookup speculative decoding with draft "
                        "length K for plain-greedy requests "
                        "(infer/speculative.py; token-identical output, "
                        "fewer decoder passes when drafts accept); 0 off")
    p.add_argument("--max_gen_length", type=int, default=128,
                   help="upper bound on per-request max_length (KV-cache "
                        "size / compile-time guard)")
    p.add_argument("--stream_chunk", type=int, default=4,
                   help="default tokens per /caption_stream SSE event "
                        "(clients may override with chunk_size)")
    p.add_argument("--replicas", type=int, default=1,
                   help="serve N single-chip replicas (one per device, "
                        "least-loaded routing); throughput scales "
                        "~linearly, latency stays single-chip")
    p.add_argument("--continuous", action="store_true",
                   help="continuous batching for the greedy default path "
                        "(serve/continuous.py): a resident decode batch "
                        "requests join/leave mid-flight; beams/sampling "
                        "fall back to the dynamic batcher")
    p.add_argument("--slots", type=int, default=16,
                   help="resident decode-batch rows for --continuous")
    p.add_argument("--engine_chunk", type=int, default=4,
                   help="decode steps between admission/reap boundaries "
                        "for --continuous")
    args = p.parse_args()
    if args.speculative_draft < 0:
        p.error(f"--speculative_draft must be >= 0, got "
                f"{args.speculative_draft}")
    if args.continuous and args.replicas > 1:
        raise SystemExit("--continuous with --replicas is not supported "
                         "yet; pick one scale-out mode")

    from .serve.service import batch_buckets

    if args.speculative_draft:
        # The Captioner reads the KLAB_DECODE_SPECULATIVE env lever at
        # construction; the flag is its CLI spelling (every service kind
        # below builds its Captioner(s) after this point).
        import os

        os.environ["KLAB_DECODE_SPECULATIVE"] = str(args.speculative_draft)

    config, tokenizer, params = _load_run(args.result_dir, args.checkpoint)
    service_kw = dict(max_batch=args.max_batch,
                      window_ms=args.batch_window_ms,
                      decode_int8=args.int8,
                      max_gen_length=args.max_gen_length,
                      stream_chunk=args.stream_chunk)
    if args.replicas > 1:
        import jax

        from .serve.replicas import ReplicatedCaptionService

        devices = jax.devices()
        if args.replicas > len(devices):
            raise SystemExit(f"--replicas {args.replicas} > "
                             f"{len(devices)} visible devices")
        service = ReplicatedCaptionService(
            config, params, tokenizer, devices[:args.replicas],
            **service_kw)
    elif args.continuous:
        from .serve.continuous import ContinuousCaptionService

        service = ContinuousCaptionService(
            config, params, tokenizer, slots=args.slots,
            engine_chunk=args.engine_chunk, **service_kw)
    else:
        service = CaptionService(config, params, tokenizer, **service_kw)
    server = CaptionHTTPServer(service, host=args.host, port=args.port)
    n_buckets = 0 if args.no_warmup else len(batch_buckets(args.max_batch))
    print(f"klab-serve: listening on {args.host}:{server.port} "
          f"(warming {n_buckets} buckets)")
    server.start(warmup=not args.no_warmup)
    print("klab-serve: ready")
    # Clean shutdown on SIGTERM (what orchestrators send before SIGKILL):
    # stop the accept loop and close the service instead of dying mid-write
    # — the serving-side analogue of the trainer's save_on_sigterm.
    import signal
    import threading

    halt = threading.Event()
    try:
        signal.signal(signal.SIGTERM, lambda *_: halt.set())
    except ValueError:
        pass  # not the main thread (embedding harness) — Ctrl-C only
    try:
        halt.wait()  # serve until SIGTERM or KeyboardInterrupt
        print("klab-serve: SIGTERM — draining")
    except KeyboardInterrupt:
        pass
    server.stop()


if __name__ == "__main__":
    main()
