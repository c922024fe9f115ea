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
    from minhash_spark.cli import add_analyzer_args, config_from_args

    add_analyzer_args(p, tokenizer_default="word")
    p.add_argument("--show-tokens", action="store_true")
    args = p.parse_args()

    from minhash_spark import kernel
    from minhash_spark.functions.udfs import signature_for_text
    from minhash_spark.tokenize import make_tokenizer

    cfg = config_from_args(args)

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
