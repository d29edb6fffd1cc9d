#!/usr/bin/env python
"""Validate the rgb16bit benchmark images against data/MANIFEST.json.

Zero-egress environments can't download the imagecompression.info set
(reference conf/img/*.yaml, README.md:31-32), so the manifest ships with
null hashes. This tool implements trust-on-first-use:

  * for each manifest entry, locate the file via the same search order the
    framework uses (implicit_image_tpu.data.resolve_benchmark_path),
  * validate the container format (binary P6 PPM, 16-bit maxval, 3
    channels, minimum dimensions),
  * if the manifest sha256 is null, compute and RECORD it (first use);
    if non-null, ENFORCE it (any later corruption/substitution fails).

Exit code 0 = all present files valid (missing files are reported but not
fatal unless --require-all). After this passes, the realimage pytest suite
(tests/test_realimage.py) and `make finals.real` run against the files
with zero edits.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MANIFEST = REPO / "data" / "MANIFEST.json"

sys.path.insert(0, str(REPO))

from implicit_image_tpu.data import resolve_benchmark_path  # noqa: E402


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _ppm_header(path: Path):
    """Parse a binary-P6 PPM header -> (width, height, maxval)."""
    with open(path, "rb") as f:
        data = f.read(256)
    tokens, i = [], 0
    while len(tokens) < 4 and i < len(data):
        if data[i : i + 1].isspace():
            i += 1
            continue
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] not in b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(data[i:j])
        i = j
    if len(tokens) < 4 or tokens[0] != b"P6":
        raise ValueError(f"{path}: not a binary P6 PPM")
    return int(tokens[1]), int(tokens[2]), int(tokens[3])


def verify(require_all: bool = False, write: bool = True,
           manifest_path: Path = MANIFEST) -> int:
    manifest_path = Path(manifest_path)
    manifest = json.loads(manifest_path.read_text())
    failures, missing, updated = [], [], False
    for entry in manifest["images"]:
        rel = entry["file"]
        path = resolve_benchmark_path(f"img/{rel}")
        if path is None:
            missing.append(entry["name"])
            print(f"MISSING  {entry['name']}: drop {rel} into data/ "
                  f"(source: {entry['source_url']})")
            continue
        path = Path(path)
        try:
            w, h, maxval = _ppm_header(path)
        except ValueError as e:
            failures.append(str(e))
            print(f"INVALID  {entry['name']}: {e}")
            continue
        if maxval != 65535:
            failures.append(f"{entry['name']}: maxval {maxval} != 65535")
            print(f"INVALID  {entry['name']}: 8-bit file (maxval {maxval}); "
                  "the protocol needs the rgb16bit set")
            continue
        if h < entry["min_height"] or w < entry["min_width"]:
            failures.append(f"{entry['name']}: {w}x{h} too small")
            print(f"INVALID  {entry['name']}: {w}x{h} below "
                  f"{entry['min_width']}x{entry['min_height']}")
            continue
        digest = _sha256(path)
        nbytes = path.stat().st_size
        if entry["sha256"] is None:
            entry["sha256"] = digest
            entry["bytes"] = nbytes
            updated = True
            print(f"RECORDED {entry['name']}: sha256={digest[:16]}… "
                  f"({nbytes} bytes) [trust-on-first-use]")
        elif entry["sha256"] != digest:
            failures.append(f"{entry['name']}: sha256 mismatch")
            print(f"MISMATCH {entry['name']}: manifest {entry['sha256'][:16]}… "
                  f"!= file {digest[:16]}…")
        else:
            print(f"OK       {entry['name']}: sha256 verified ({nbytes} bytes)")
    if updated and write:
        manifest_path.write_text(json.dumps(manifest, indent=2) + "\n")
        print(f"manifest updated: {manifest_path}")
    if failures:
        return 1
    if require_all and missing:
        return 2
    return 0


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--require-all", action="store_true",
                    help="fail if any benchmark image is missing")
    ap.add_argument("--no-write", action="store_true",
                    help="do not record first-use hashes into the manifest")
    args = ap.parse_args()
    sys.exit(verify(require_all=args.require_all, write=not args.no_write))


if __name__ == "__main__":
    main()
