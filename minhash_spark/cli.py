"""Shared CLI plumbing: every job entrypoint (dedup / search / analyze /
stream_dedup) takes the same analyzer + banding flags, and a drifted copy
would silently produce mismatched config hashes between the index-time and
query-time CLIs. One definition here; per-job extras stay in the jobs."""

from __future__ import annotations

import argparse

from minhash_spark.config import MinHashConfig


def add_analyzer_args(p: argparse.ArgumentParser, tokenizer_default: str = "char_shingle") -> None:
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--bit", type=int, default=1)
    p.add_argument(
        "--tokenizer",
        default=tokenizer_default,
        choices=["word", "standard", "char_shingle", "word_shingle"],
    )
    p.add_argument(
        "--filters",
        nargs="*",
        default=None,
        help="analyzer-chain token filters in order (e.g. --filters lowercase stop)",
    )
    p.add_argument("--shingle-k", type=int, default=9)
    p.add_argument("--word-n", type=int, default=3)
    p.add_argument("--num-bands", type=int, default=21)
    p.add_argument("--rows-per-band", type=int, default=6)
    p.add_argument(
        "--kernel-group",
        default="murmur",
        choices=["murmur", "rolling"],
        help="char-shingle window grouping: murmur (parallel-safe default) "
        "or rolling (dedup-first, faster serially / on bandwidth-rich "
        "executors); signature bytes identical either way",
    )


def config_from_args(args: argparse.Namespace, **overrides) -> MinHashConfig:
    """MinHashConfig from the shared flags; job-specific fields (e.g.
    verify_threshold, max_bucket_size) are passed as overrides."""
    tok_params = (
        {"k": args.shingle_k}
        if args.tokenizer == "char_shingle"
        else ({"n": args.word_n} if args.tokenizer == "word_shingle" else {})
    )
    if args.filters:
        tok_params = {**tok_params, "filters": list(args.filters)}
    return MinHashConfig(
        seed=args.seed,
        size=args.size,
        bit=args.bit,
        tokenizer=args.tokenizer,
        tokenizer_params=tok_params,
        num_bands=args.num_bands,
        rows_per_band=args.rows_per_band,
        kernel_group=getattr(args, "kernel_group", "murmur"),
        **overrides,
    )
