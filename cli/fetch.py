"""Fetch released artifacts into the standard data layout.

Mirrors `/root/reference/fetch_demo_data.sh` (SMPL body models + TokenHMR
checkpoint + tokenizer, registration-gated on the MPI site).  Because the
downloads require login, each artifact takes the user's authenticated URL:

  python -m cli.fetch --data-dir data \
      tokenhmr_ckpt=https://...  tokenizer_ckpt=https://...

Local paths are accepted too (copied into the layout is NOT done — they
pass through, and the printed mapping shows where the CLIs expect them).
"""
from __future__ import annotations

import argparse
import sys

from tokenhmr_tpu.utils.artifacts import ARTIFACT_PATHS, fetch


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data")
    p.add_argument("pairs", nargs="*",
                   help="name=url_or_path pairs; known names: "
                        + ", ".join(sorted(ARTIFACT_PATHS)))
    p.add_argument("--list", action="store_true",
                   help="print the artifact table and exit")
    args = p.parse_args(argv)

    if args.list or not args.pairs:
        print("artifact layout (relative to --data-dir):")
        for name, rel in sorted(ARTIFACT_PATHS.items()):
            print(f"  {name:16s} -> {rel}")
        if not args.pairs:
            print("\nnothing to fetch (pass name=url pairs)")
        return 0

    rc = 0
    for pair in args.pairs:
        if "=" not in pair:
            print(f"skipping malformed pair {pair!r} (want name=url)",
                  file=sys.stderr)
            rc = 2
            continue
        name, url = pair.split("=", 1)
        try:
            path = fetch(name, url, data_dir=args.data_dir)
            print(f"{name}: {path}")
        except Exception as e:
            print(f"{name}: FAILED ({e})", file=sys.stderr)
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
