"""Build ``dist/krawler_spark.zip`` for ``spark-submit --py-files``.

The north rule runs the engine "via spark-submit --py-files on a
multi-executor cluster": the driver and every executor python worker
import the package from this archive (zipimport), so it must carry the
package sources AND the vendored data files (the publicsuffix.org
list), and nothing in the package may assume ``__file__`` is a real
filesystem path (see functions/kanon.py ``_psl_lines``).

Usage: python scripts/package.py [--out dist/krawler_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "krawler_spark")


def build_zip(out_path: str) -> list[str]:
    """Write the archive; returns the archived relative names."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    names: list[str] = []
    # deflate for everything (including the big vendored .dat — it
    # compresses well and executors unpack once per python worker
    # process, so decompression cost is a per-worker one-off)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(PKG):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".pyc"):
                    continue
                if not (fn.endswith(".py") or fn.endswith(".dat")):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
                names.append(rel)
    return names


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "krawler_spark.zip"))
    args = ap.parse_args()
    names = build_zip(args.out)
    print(f"{args.out}: {len(names)} files")
    print(
        "submit: spark-submit --py-files", args.out,
        "scripts/submit_crawl.py --warehouse <path> --corpus <parquet-or-iceberg>",
    )


if __name__ == "__main__":
    main()
