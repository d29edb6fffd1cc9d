"""Progressive (quality-scalable) container — format 4.

A prefix of the bitstream decodes to a usable image; the rest refines it
to BIT-EXACT full quality. The reference's container (its
entropy_coding/__init__.py:70-120) is all-or-nothing; no INR codec
capability like this exists there.

The trick is VQ-rank nesting, possible because the k-means codebooks here
are per-tensor SCALAR codebooks: sort each tensor's centroids, relabel
every weight by rank, and split the 8-bit rank into nibbles.

  * hi nibble = which of the 16 sorted runs the weight falls in — with a
    16-entry usage-weighted run-mean codebook this is a coarse but
    faithful quantizer (the base layer);
  * lo nibble picks the exact centroid inside the run (the refinement).

Full decode reconstructs rank = hi·16 + lo and reads the sorted codebook
— numerically IDENTICAL to the non-progressive container (the same
centroid values, reordered). The cost of progressivity is only the
entropy lost by coding the nibble planes separately (measured in
BASELINE.md "Progressive container").

Since round 5 the lo plane is CONTEXT-PARTITIONED ("ctx_lo" header
flag): each tensor's lo nibbles are stored grouped by their hi value
(stable sort by hi), which the decoder inverts because it has already
read hi from the base section. Separate coding of the planes costs
H(hi)+H(lo) ≥ H(rank) bits; grouping lets the (adaptive / dictionary)
backends approach the conditional H(lo|hi), so the split tax collapses
to the coder's context-adaptation overhead — measured to cut the
progressive rate tax vs the flat container (BASELINE.md "Progressive
container"). Pre-r5 containers (no flag) decode unchanged.

Layout: `compressed_weights.data` = base_blob || refine_blob, each an
independently-decodable `encode_stream` payload; `meta_data.json` tags
every tensor with its section and `__meta__.base_bytes` marks the prefix
length. Unquantized tensors (first/last weights, biases, frozen extras)
live in the base section — any render needs them. Non-nibble-splittable
quantized tensors (uint16 labels, per-channel int8 QAT codes) also stay
in the base section, unsplit.
"""
from __future__ import annotations

import json
from collections import OrderedDict
from pathlib import Path
from typing import Dict, Union

import numpy as np

from implicit_image_tpu.coding.parsers import decode_stream, encode_stream

__all__ = ["compress_progressive", "read_progressive", "base_bytes"]

_RUN = 16  # ranks per base group (hi nibble)


def _split_entries(state_dict, pinned_layers=frozenset()):
    """Partition the state dict into (base_entries, refine_entries), both
    ordered name->array, applying rank-nesting to flat-VQ uint8 labels.

    `pinned_layers` (delta streams): layer indices whose label 0 is the
    frozen PRUNED slot (training/quant_phase.py) — there the permutation
    pins label 0 <-> rank 0 and value-sorts only labels 1.., so the
    decoder's sparsity test `labels != 0` keeps meaning "pruned" on rank
    labels: the full stream stays bit-exact to the flat delta container,
    and the base prefix zeroes pruned weights exactly (the other rank-
    0-group centroids zero too — the measured base-quality cost of
    progressivity on a delta stream)."""
    base: "OrderedDict[str, np.ndarray]" = OrderedDict()
    refine: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for name, arr in state_dict.items():
        if name.endswith(".labeled_weight"):
            cname = name.replace("labeled_weight", "centroids")
            book = state_dict.get(cname)
            if (
                book is not None
                and arr.dtype == np.uint8
                and book.ndim == 1
                and book.size <= 256
            ):
                layer_i = int(name.split(".", 2)[1])
                if layer_i in pinned_layers and book.size > 1:
                    order = np.concatenate(
                        [[0], 1 + np.argsort(book[1:], kind="stable")]
                    )
                else:
                    order = np.argsort(book, kind="stable")
                rank_of = np.empty(book.size, np.uint8)
                rank_of[order] = np.arange(book.size, dtype=np.uint8)
                ranks = rank_of[arr]
                sorted_book = np.ascontiguousarray(book[order])
                counts = np.bincount(ranks.reshape(-1), minlength=book.size)
                n_groups = -(-book.size // _RUN)
                base_book = np.empty(n_groups, book.dtype)
                for g in range(n_groups):
                    lo, hi = g * _RUN, min((g + 1) * _RUN, book.size)
                    c = counts[lo:hi].astype(np.float64)
                    vals = sorted_book[lo:hi].astype(np.float64)
                    base_book[g] = (
                        (vals * c).sum() / c.sum() if c.sum() else vals.mean()
                    )
                stem = name[: -len(".labeled_weight")]
                hi = (ranks >> 4).astype(np.uint8)
                lo = (ranks & 15).astype(np.uint8)
                # ctx_lo: store lo grouped by its hi context (stable, so
                # the decoder inverts it from hi alone) — the backends
                # then code ~H(lo|hi) instead of the marginal H(lo)
                perm = np.argsort(hi.reshape(-1), kind="stable")
                base[f"{stem}.labels_hi"] = hi
                base[f"{stem}.base_centroids"] = base_book
                refine[f"{stem}.labels_lo"] = (
                    lo.reshape(-1)[perm].reshape(lo.shape)
                )
                refine[f"{stem}.centroids"] = sorted_book
                continue
        if name.endswith(".centroids") and any(
            k.endswith(".labels_lo")
            and k[: -len(".labels_lo")] == name[: -len(".centroids")]
            for k in refine
        ):
            continue  # consumed by the matching labeled_weight above
        base[name] = arr
    return base, refine


def compress_progressive(
    state_dict: Dict[str, np.ndarray],
    dir_name: Union[str, Path],
    stream_name: str = "auto",
    base_finetune=None,
    delta=None,
    **kwargs,
) -> int:
    """Write the format-4 progressive container; returns total payload
    bytes (the rate metric — same semantics as compress_state_dict).

    `base_finetune(base_entries) -> {name: array}` may replace
    `.base_centroids` entries (same shapes/dtypes) — the encoder-side
    output-distortion finetune (quant/base_layer.py). It can never touch
    full-stream fidelity: the refinement layer ignores base_centroids.

    `delta` (quant.delta + progressive, VERDICT r3 item 5): same dict as
    compress_state_dict's — the quantized layers' codebooks are RESIDUAL
    codebooks against the shared warm-start artifact. Rank nesting then
    pins label 0 <-> rank 0 on those layers (see _split_entries), so the
    full stream decodes bit-exact to the flat delta container while the
    base prefix still stands alone (offsets + 16-entry residual books).
    """
    from implicit_image_tpu.coding import _plane_group_payload, delta_meta_entry

    dir_name = Path(dir_name)
    dir_name.mkdir(exist_ok=True, parents=True)

    base, refine = _split_entries(
        OrderedDict((k, np.ascontiguousarray(v)) for k, v in state_dict.items()),
        pinned_layers=(
            frozenset(int(i) for i in delta["layers"]) if delta else frozenset()
        ),
    )
    if base_finetune is not None:
        for name, book in (base_finetune(base) or {}).items():
            if not name.endswith(".base_centroids") or name not in base:
                raise ValueError(f"base_finetune may only replace "
                                 f".base_centroids entries, got {name!r}")
            if np.asarray(book).shape != base[name].shape:
                raise ValueError(f"base_finetune changed the shape of {name}")
            base[name] = np.ascontiguousarray(
                np.asarray(book, base[name].dtype)
            )
    meta = OrderedDict()
    order = 0
    for sec, entries in ((0, base), (1, refine)):
        for name, arr in entries.items():
            meta[str(order)] = {
                "shape": list(arr.shape),
                "dtype": str(arr.dtype),
                "name": name,
                "sec": sec,
            }
            order += 1
    base_blob = encode_stream(
        stream_name, _plane_group_payload(list(base.values())), **kwargs
    )
    refine_blob = encode_stream(
        stream_name, _plane_group_payload(list(refine.values())), **kwargs
    )
    meta["__meta__"] = {
        "format": 4,
        "plane_group": True,
        "shuffle": True,
        "ctx_lo": True,  # lo plane grouped by hi context (see module doc)
        "base_bytes": len(base_blob),
    }
    if delta is not None:
        meta["__meta__"]["delta"] = delta_meta_entry(delta, stream_name)
    (dir_name / "compressed_weights.data").write_bytes(base_blob + refine_blob)
    (dir_name / "meta_data.json").write_text(
        json.dumps(meta, indent=2, sort_keys=True)
    )
    return (dir_name / "compressed_weights.data").stat().st_size


def base_bytes(dir_name: Union[str, Path]) -> int:
    """Prefix length (bytes) that decodes standalone at base quality."""
    meta = json.loads((Path(dir_name) / "meta_data.json").read_text())
    return int(meta["__meta__"]["base_bytes"])


def read_progressive(
    dir_name: Union[str, Path],
    stream_name: str = "auto",
    base_only: bool = False,
    **kwargs,
) -> "OrderedDict[str, np.ndarray]":
    """Read a format-4 container back to STORED arrays under the standard
    names (labeled_weight + centroids), so decompress_state_dict's
    materialization applies unchanged.

    base_only=True touches ONLY the first base_bytes of the payload (the
    file may be physically truncated to that prefix): labels are the hi
    nibbles against the 16-entry run-mean codebook. Full reads merge the
    refinement: rank = hi*16 + lo against the sorted codebook —
    numerically identical to the non-progressive container.
    """
    from implicit_image_tpu.coding import _plane_ungroup

    dir_name = Path(dir_name)
    meta = json.loads((dir_name / "meta_data.json").read_text())
    hdr = meta.pop("__meta__")
    if int(hdr.get("format", 1)) != 4:
        raise ValueError(f"{dir_name} is not a progressive (format-4) container")
    nbase = int(hdr["base_bytes"])
    meta = {int(k): v for k, v in meta.items()}
    infos_all = [
        (meta[o]["name"], meta[o]["dtype"], meta[o]["shape"], meta[o]["sec"])
        for o in sorted(meta)
    ]
    payload = (dir_name / "compressed_weights.data").read_bytes()
    if len(payload) < nbase:
        raise ValueError(
            f"payload truncated below the base layer ({len(payload)} < {nbase} bytes)"
        )

    def _section(sec: int, blob: bytes):
        infos = [(n, d, s) for n, d, s, se in infos_all if se == sec]
        expected = sum(
            (int(np.prod(s, dtype=np.int64)) if s else 1)
            * np.dtype(d).itemsize
            for _, d, s in infos
        )
        try:
            dec = decode_stream(
                stream_name, blob, expected_size=expected, **kwargs
            )
        except ValueError:
            raise
        except Exception as e:  # zlib.error / ZstdError / LZMAError / ...
            raise ValueError(
                f"corrupt progressive container {dir_name} section {sec} "
                f"(backend {stream_name}): {e!r}"
            ) from e
        return _plane_ungroup(dec, infos)

    base = _section(0, payload[:nbase])
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    if base_only:
        for name, arr in base.items():
            if name.endswith(".labels_hi"):
                stem = name[: -len(".labels_hi")]
                out[f"{stem}.labeled_weight"] = arr
            elif name.endswith(".base_centroids"):
                stem = name[: -len(".base_centroids")]
                out[f"{stem}.centroids"] = arr
            else:
                out[name] = arr
        return out

    refine = _section(1, payload[nbase:])
    ctx_lo = bool(hdr.get("ctx_lo", False))
    for name, arr in base.items():
        if name.endswith(".labels_hi"):
            stem = name[: -len(".labels_hi")]
            lo = refine[f"{stem}.labels_lo"]
            if ctx_lo:
                # invert the encoder's group-by-hi permutation (stable
                # sort of the hi plane we just decoded)
                perm = np.argsort(arr.reshape(-1), kind="stable")
                lo_flat = np.empty(lo.size, lo.dtype)
                lo_flat[perm] = lo.reshape(-1)
                lo = lo_flat.reshape(lo.shape)
            out[f"{stem}.labeled_weight"] = (
                (arr.astype(np.uint16) << 4) | lo.astype(np.uint16)
            ).astype(np.uint8)
            out[f"{stem}.centroids"] = refine[f"{stem}.centroids"]
        elif name.endswith(".base_centroids"):
            continue
        else:
            out[name] = arr
    return out
