"""The reference's ``_analyze`` demo surface (README.md:17-38 of
codelibs/elasticsearch-minhash shows ``GET _analyze`` with a ``minhash``
token filter returning the signature token): tokenize a text with the
chosen analyzer chain and print the tokens plus the b-bit MinHash signature
in every surface encoding (base64, bit-string, hex) and the LSH band keys.

Pure kernel path — no SparkSession (the same code the Arrow UDFs run, so
what this prints is byte-identical to what the pipeline indexes).

Example:
    python jobs/analyze.py --text "minhash is fun" --tokenizer word
    python jobs/analyze.py --text "..." --tokenizer standard --filters lowercase stop
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--bit", type=int, default=1)
    p.add_argument(
        "--tokenizer",
        default="word",
        choices=["word", "standard", "char_shingle", "word_shingle"],
    )
    p.add_argument("--filters", nargs="*", default=None)
    p.add_argument("--shingle-k", type=int, default=9)
    p.add_argument("--word-n", type=int, default=3)
    p.add_argument("--num-bands", type=int, default=21)
    p.add_argument("--rows-per-band", type=int, default=6)
    p.add_argument("--show-tokens", action="store_true")
    args = p.parse_args()

    from minhash_spark import kernel
    from minhash_spark.config import MinHashConfig
    from minhash_spark.functions.udfs import signature_for_text
    from minhash_spark.tokenize import make_tokenizer

    tok_params = (
        {"k": args.shingle_k}
        if args.tokenizer == "char_shingle"
        else ({"n": args.word_n} if args.tokenizer == "word_shingle" else {})
    )
    if args.filters:
        tok_params = {**tok_params, "filters": list(args.filters)}
    cfg = MinHashConfig(
        seed=args.seed,
        size=args.size,
        bit=args.bit,
        tokenizer=args.tokenizer,
        tokenizer_params=tok_params,
        num_bands=args.num_bands,
        rows_per_band=args.rows_per_band,
    )

    sig, bands = signature_for_text(args.text, cfg)
    out = {
        "config_hash": cfg.config_hash(),
        "n_tokens": len(make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)(args.text)),
        "sig_b64": kernel.to_base64(sig),  # reference encoding (BitSet-truncated)
        "sig_bits": kernel.to_bit_string(sig),
        "sig_hex": sig.hex(),
        "band_keys": bands,
    }
    if args.show_tokens:
        out["tokens"] = make_tokenizer(cfg.tokenizer, **cfg.tokenizer_params)(args.text)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
