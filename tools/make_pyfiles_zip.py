"""Package minhash_spark for spark-submit --py-files -> dist/minhash_spark.zip."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def main():
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "minhash_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted((ROOT / "minhash_spark").rglob("*.py")):
            z.write(f, f.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
