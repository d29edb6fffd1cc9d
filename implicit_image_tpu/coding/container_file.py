"""Single-file container (.iic) — pack a run dir into one artifact.

The run-dir layout (config.json + model_quantized/{compressed_weights.data,
meta_data.json}) mirrors the reference's on-disk format
(reference entropy_coding/__init__.py:70-121 writes exactly those two
model files); a production codec ships ONE file. `pack_run` bundles the
three files into a stored (uncompressed — the payload is already
entropy-coded) zip with deterministic member metadata, so identical runs
pack to identical bytes. `decompress.decode_run`, the decompress CLI and
api.decompress_image accept a packed file anywhere a run dir is accepted.

Containers that delta-code against a SHARED artifact (quant.delta) stay
packable — the artifact is encoder/decoder state referenced by
path+sha256, deliberately not in the bitstream. A SINGLE inter-frame
(P) container (a `prev` link to the previous frame) is refused in .iic —
one file without its chain cannot decode — but a WHOLE sequence packs
into one `.iiv` file (`pack_sequence`): all frames plus a sequence.json
GOP index, decodable by `sequence.decode_sequence` directly (including
frame-seek).

    python -m implicit_image_tpu.coding.container_file pack <run_dir> [out.iic]
    python -m implicit_image_tpu.decompress <file.iic>
    python -m implicit_image_tpu.coding.container_file pack-seq <seq_dir> [out.iiv]
    python -m implicit_image_tpu.sequence decode <file.iiv> [frame=t]
"""
from __future__ import annotations

import json
import zipfile
from pathlib import Path
from typing import Optional, Sequence, Union

__all__ = [
    "pack_run", "unpack_run", "is_packed_container", "MEMBERS",
    "pack_sequence", "unpack_sequence", "is_packed_sequence",
    "sequence_index",
]

MEMBERS = (
    "config.json",
    "model_quantized/meta_data.json",
    "model_quantized/compressed_weights.data",
)
# fixed timestamp -> byte-identical packs for identical runs
_EPOCH = (1980, 1, 1, 0, 0, 0)


def pack_run(
    run_dir: Union[str, Path], out_path: Union[str, Path, None] = None
) -> Path:
    """Bundle a decodable run dir into one .iic file; returns its path."""
    run_dir = Path(run_dir)
    for name in MEMBERS:
        if not (run_dir / name).is_file():
            raise FileNotFoundError(
                f"{run_dir} is not a decodable run dir (missing {name})"
            )
    meta = json.loads(
        (run_dir / "model_quantized" / "meta_data.json").read_text()
    )
    delta = meta.get("__meta__", {}).get("delta", {})
    if "prev" in delta:
        raise ValueError(
            f"{run_dir} is an inter-frame (P) container chained to "
            f"{delta['prev']!r} — a single file cannot carry the decode "
            "chain; pack the sequence's I-frame or ship the seq_* dir"
        )
    out_path = Path(out_path) if out_path else run_dir.with_suffix(".iic")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as z:
        for name in MEMBERS:
            info = zipfile.ZipInfo(name, date_time=_EPOCH)
            z.writestr(info, (run_dir / name).read_bytes(),
                       compress_type=_member_compression(name),
                       compresslevel=9)
    return out_path


def _member_compression(name: str) -> int:
    """Deflate the JSON manifests, store the entropy-coded payload.

    The 48-frame `.iiv` measurement (BASELINE.md "Sequence at clip
    scale") showed the container overhead was PER-FRAME JSON, not
    amortizing: meta_data/config/summary.json were ~318 KB of a 351 KB
    overhead. Deflate level 9 is deterministic for a given zlib, so
    identical runs still pack to identical bytes; readers are untouched
    (zipfile decompresses members transparently, and pre-r5 all-stored
    archives remain readable)."""
    return (
        zipfile.ZIP_DEFLATED if name.endswith(".json")
        else zipfile.ZIP_STORED
    )


def is_packed_container(path: Union[str, Path]) -> bool:
    path = Path(path)
    if not path.is_file() or not zipfile.is_zipfile(path):
        return False
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    return all(m in names for m in MEMBERS)


def unpack_run(
    path: Union[str, Path], dest: Union[str, Path, None] = None
) -> Path:
    """Extract a packed container to a run dir (default: alongside the
    file, named after its stem); returns the run dir."""
    path = Path(path)
    if not is_packed_container(path):
        raise ValueError(
            f"{path} is not a packed .iic container "
            f"(expected a stored zip holding {', '.join(MEMBERS)})"
        )
    dest = Path(dest) if dest else path.parent / path.stem
    with zipfile.ZipFile(path) as z:
        for name in MEMBERS:
            target = dest / name
            # the member list is the fixed MEMBERS tuple — no traversal risk
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(z.read(name))
    return dest


# ---- sequence container (.iiv) — pack an I+P chain into ONE file ----
# The per-frame `prev` links are INTERNAL to the archive (relative frame
# names), so unlike a single P-frame .iic the whole chain ships and
# decodes; I-frame quant.delta artifacts stay external shared state
# (path + sha256 in each frame manifest), exactly like .iic.

_FRAME_MEMBERS = (
    "config.json",
    "summary.json",
    "model_quantized/meta_data.json",
    "model_quantized/compressed_weights.data",
)
_SEQ_INDEX = "sequence.json"


def sequence_index(seq_root: Union[str, Path]) -> dict:
    """Build the .iiv index for a seq_* dir: ordered frames with their
    kind (I = standalone, P = chained to `prev`) read from the frame
    manifests — the GOP map decode_sequence(frame=t) seeks with."""
    seq_root = Path(seq_root)
    frame_dirs = sorted(
        d for d in seq_root.iterdir()
        if d.is_dir() and d.name.startswith("frame_")
    )
    if not frame_dirs:
        raise FileNotFoundError(f"no frame_* dirs under {seq_root}")
    frames = []
    for d in frame_dirs:
        meta = json.loads(
            (d / "model_quantized" / "meta_data.json").read_text()
        )
        delta = meta.get("__meta__", {}).get("delta", {})
        frames.append({
            "name": d.name,
            "kind": "P" if "prev" in delta else "I",
            "prev": delta.get("prev"),
        })
    if frames[0]["kind"] != "I":
        raise ValueError(
            f"{seq_root}: first frame {frames[0]['name']} is not an "
            "I-frame — the chain has no decode root"
        )
    return {"format": "iiv-1", "frames": frames}


def pack_sequence(
    seq_root: Union[str, Path], out_path: Union[str, Path, None] = None
) -> Path:
    """Bundle a seq_* dir (sequence.py output) into one .iiv file."""
    seq_root = Path(seq_root)
    index = sequence_index(seq_root)
    out_path = (
        Path(out_path) if out_path else seq_root.with_suffix(".iiv")
    )
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as z:
        info = zipfile.ZipInfo(_SEQ_INDEX, date_time=_EPOCH)
        z.writestr(info, json.dumps(index, indent=2, sort_keys=True),
                   compress_type=zipfile.ZIP_DEFLATED, compresslevel=9)
        for fr in index["frames"]:
            for name in _FRAME_MEMBERS:
                src = seq_root / fr["name"] / name
                if not src.is_file():
                    raise FileNotFoundError(
                        f"{seq_root / fr['name']} is not a decodable "
                        f"frame dir (missing {name})"
                    )
                member = zipfile.ZipInfo(
                    f"{fr['name']}/{name}", date_time=_EPOCH
                )
                z.writestr(member, src.read_bytes(),
                           compress_type=_member_compression(name),
                           compresslevel=9)
    return out_path


def is_packed_sequence(path: Union[str, Path]) -> bool:
    path = Path(path)
    if not path.is_file() or not zipfile.is_zipfile(path):
        return False
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
    return _SEQ_INDEX in names


def read_sequence_index(path: Union[str, Path]) -> dict:
    """The sequence.json GOP index of a packed .iiv, without extracting
    any frame payloads (zip central-directory + one small member read)."""
    path = Path(path)
    if not is_packed_sequence(path):
        raise ValueError(
            f"{path} is not a packed .iiv sequence container "
            f"(expected a stored zip with a {_SEQ_INDEX} index)"
        )
    with zipfile.ZipFile(path) as z:
        return json.loads(z.read(_SEQ_INDEX))


def unpack_sequence(
    path: Union[str, Path],
    dest: Union[str, Path, None] = None,
    frames: Optional[Sequence[str]] = None,
) -> Path:
    """Extract a .iiv file back to a seq dir; returns that dir.

    `frames` (GOP seek): extract only the named frame dirs — a seek to
    frame t needs just the nearest I-frame and the P-chain to t, so the
    rest of the archive's payload bytes are never read."""
    path = Path(path)
    index = read_sequence_index(path)
    dest = Path(dest) if dest else path.parent / path.stem
    want = None if frames is None else set(frames)
    with zipfile.ZipFile(path) as z:
        (dest / _SEQ_INDEX).parent.mkdir(parents=True, exist_ok=True)
        (dest / _SEQ_INDEX).write_text(
            json.dumps(index, indent=2, sort_keys=True)
        )
        for fr in index["frames"]:
            if "/" in fr["name"] or fr["name"].startswith("."):
                raise ValueError(f"suspicious frame name {fr['name']!r}")
            if want is not None and fr["name"] not in want:
                continue
            for name in _FRAME_MEMBERS:
                target = dest / fr["name"] / name
                # member paths are rebuilt from the fixed tuple — no
                # traversal risk from hostile archives
                target.parent.mkdir(parents=True, exist_ok=True)
                target.write_bytes(z.read(f"{fr['name']}/{name}"))
    return dest


def main(argv: Optional[list] = None) -> None:
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) >= 2 and argv[0] == "pack":
        out = pack_run(argv[1], argv[2] if len(argv) > 2 else None)
        print(f"packed {argv[1]} -> {out} ({out.stat().st_size} bytes)")
        return
    if len(argv) >= 2 and argv[0] == "unpack":
        out = unpack_run(argv[1], argv[2] if len(argv) > 2 else None)
        print(f"unpacked {argv[1]} -> {out}")
        return
    if len(argv) >= 2 and argv[0] == "pack-seq":
        out = pack_sequence(argv[1], argv[2] if len(argv) > 2 else None)
        print(f"packed {argv[1]} -> {out} ({out.stat().st_size} bytes)")
        return
    if len(argv) >= 2 and argv[0] == "unpack-seq":
        out = unpack_sequence(argv[1], argv[2] if len(argv) > 2 else None)
        print(f"unpacked {argv[1]} -> {out}")
        return
    raise SystemExit(
        "usage: python -m implicit_image_tpu.coding.container_file "
        "pack <run_dir> [out.iic] | unpack <file.iic> [dest_dir] | "
        "pack-seq <seq_dir> [out.iiv] | unpack-seq <file.iiv> [dest_dir]"
    )


if __name__ == "__main__":
    main()
