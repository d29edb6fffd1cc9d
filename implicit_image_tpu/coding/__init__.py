"""Entropy coding — serialize (quantized) model params to the compressed
bitstream, and the decode path back to a rendered image.

Capability parity with reference `pipeline/entropy_coding/__init__.py`:
  * `linear_state_dict`      (:15-41)  — quantized layers stored as
    uint8/uint16 `labeled_weight` + fp `centroids` instead of fp weights
  * `compress_state_dict`    (:70-120) — writes `compressed_weights.data`
    (one compressed stream of concatenated tensor bytes) + `meta_data.json`
    (ordered per-tensor shape/dtype/name manifest); returns the byte count,
    THE rate metric (consumed at compress.py:253-263)
  * `decompress_state_dict`  (:123-186) — offset-walks the decompressed
    buffer per the manifest and re-materializes weight = centroids[labels]
  * plus a proper decode→render entry point (`decode_and_render`), which the
    reference lacks — decode Mpix/s is a tracked benchmark (BASELINE.md).

Host-side by design: entropy coding is byte-exact CPU work (zstd/lzma/
huffman C libraries); the TPU renders the decoded params.
"""
from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

import jax.numpy as jnp

from implicit_image_tpu.coding.parsers import (
    backend_names,
    decode_stream,
    encode_stream,
)

__all__ = [
    "linear_state_dict",
    "state_ref_map",
    "apply_xor_residual",
    "compress_state_dict",
    "decompress_state_dict",
    "read_raw_container",
    "params_from_state_dict",
    "decode_and_render",
    "render_region",
    "backend_names",
    "sparsity",
]


def sparsity(arr) -> float:
    """Fraction of zero entries (reference entropy_coding/utils.py:6-10)."""
    arr = np.asarray(arr)
    return float((arr == 0).sum() / arr.size)


def linear_state_dict(
    params,
    codebooks=None,
    half: Union[bool, str] = True,
) -> "OrderedDict[str, np.ndarray]":
    """Flatten a params pytree to an ordered name->array dict.

    Naming: `layers.{i}.weight` / `.bias` / `.labeled_weight` / `.centroids`
    plus any frozen extras under their own key (e.g. Fourier `layers.0.B`).
    Quantized layers (codebooks[i] is not None) store labels + centroids;
    labels are uint8 when they fit, else uint16 (reference :33-38).

    `half`:
      * True   — all floats fp16, the reference protocol (it calls
        model.half() before compressing, compress.py:250). Measured to
        cost ~1 dB decoded PSNR at the d8/w128 operating point, almost
        entirely from the ω₀=50 first layer (phase error 50·x·Δw).
      * "auto" — mixed precision (default pipeline policy): UNquantized
        tensors (first/last weights, biases, frozen extras) stay fp32,
        centroids fp16. Recovers decoded PSNR to within 0.01 dB of the
        quant PSNR for ~3% more rate; the per-tensor dtype manifest
        already round-trips mixed dtypes, no format change needed.
      * False  — all floats fp32.
    """
    import jax

    # ONE batched device->host transfer (async copies pipelined by
    # device_get) — per-leaf np.asarray costs a tunnel round-trip per
    # tensor (~30 leaves x ~40 ms measured on the axon runtime ≈ 1.2 s
    # of the encode stage; batched it is ~0.1 s)
    params, codebooks = jax.device_get((params, codebooks))

    fdtype = np.float16 if half is True else np.float32
    cdtype = np.float32 if half is False else np.float16
    state: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for i, layer in enumerate(params):
        book = codebooks[i] if codebooks is not None else None
        for key, val in layer.items():
            arr = np.asarray(val)
            if key == "w" and book is not None and hasattr(book, "scales"):
                # fbgemm-style per-channel symmetric (PerChannelCodebook):
                # int8 codes + per-output-channel scales; decode is
                # codes * scales (quant/uniform.py)
                state[f"layers.{i}.labeled_weight"] = np.asarray(
                    book.codes, np.int8
                )
                state[f"layers.{i}.qscale"] = np.asarray(book.scales).astype(
                    cdtype
                )
            elif key == "w" and book is not None:
                labels = np.asarray(book.labels)
                dtype = np.uint8 if labels.max(initial=0) < 256 else np.uint16
                state[f"layers.{i}.labeled_weight"] = labels.astype(dtype)
                state[f"layers.{i}.centroids"] = np.asarray(book.centroids).astype(
                    cdtype
                )
            elif key == "w":
                state[f"layers.{i}.weight"] = arr.astype(fdtype)
            elif key == "b":
                state[f"layers.{i}.bias"] = arr.astype(fdtype)
            else:
                state[f"layers.{i}.{key}"] = arr.astype(fdtype)
    return state


def state_ref_map(params) -> Dict[str, np.ndarray]:
    """A params pytree -> {canonical state name: fp32 array} (the naming
    rules of linear_state_dict, no quantization/half) — the encoder-side
    reference map for delta XOR residuals."""
    import jax

    params = jax.device_get(params)
    out: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params):
        for key, val in layer.items():
            name = {"w": "weight", "b": "bias"}.get(key, key)
            out[f"layers.{i}.{name}"] = np.asarray(val, np.float32)
    return out


def _xor_arrays(arr: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Bitwise XOR of two same-shape float arrays in arr's dtype (the
    transform is its own inverse)."""
    u = {2: np.uint16, 4: np.uint32, 8: np.uint64}[arr.dtype.itemsize]
    a = np.ascontiguousarray(arr)
    r = np.ascontiguousarray(ref.astype(arr.dtype))
    return (a.view(u) ^ r.view(u)).view(arr.dtype)


def apply_xor_residual(state, ref_map) -> Tuple["OrderedDict[str, np.ndarray]", list]:
    """LOSSLESS delta transform for the UNquantized tensors of a delta
    container: store bit-pattern XOR against the shared reference (the
    meta artifact / previous frame). Near-identical floats share sign,
    exponent and leading mantissa bits, so the XOR is mostly zero bytes
    and the plane-grouped entropy backend crushes it; decode XORs back —
    bit-exact by construction (unlike an arithmetic residual, which
    re-rounds). Quantized layers are untouched (their names are
    labeled_weight/centroids, absent from the reference map).

    Returns (transformed state, list of transformed names).
    """
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    xored = []
    for name, arr in state.items():
        ref = ref_map.get(name)
        if (
            ref is not None
            and arr.dtype.kind == "f"
            and tuple(np.shape(ref)) == tuple(arr.shape)
        ):
            out[name] = _xor_arrays(arr, np.asarray(ref))
            xored.append(name)
        else:
            out[name] = arr
    return out, xored


def _shuffle_tensor_bytes(arr: np.ndarray) -> bytes:
    """Byte-plane split: all 0th bytes of every element, then all 1st, …

    Groups the highly-skewed fp16 sign/exponent bytes into one contiguous
    run and the near-random mantissa bytes into another, which every
    entropy backend compresses ~5% smaller than element-interleaved bytes
    (measured in tests/test_coding.py). Identity for 1-byte dtypes.

    Defined via _tensor_planes so format-2 (per-tensor shuffle) and
    format-3 (global plane grouping) payload bytes can never diverge.
    """
    return b"".join(_tensor_planes(arr))


def _unshuffle_tensor_bytes(buf: bytes, dtype: np.dtype, size: int) -> np.ndarray:
    if dtype.itemsize == 1 or size == 0:
        return np.frombuffer(buf, dtype=dtype, count=size)
    planes = np.frombuffer(buf, dtype=np.uint8, count=size * dtype.itemsize)
    return planes.reshape(dtype.itemsize, size).T.copy().view(dtype).reshape(size)


def _tensor_planes(arr: np.ndarray) -> list:
    """Byte planes of one tensor (plane k = k-th byte of every element)."""
    flat = np.ascontiguousarray(arr).reshape(-1)
    if flat.size == 0:
        return [b""]
    if flat.dtype.itemsize == 1:
        return [flat.tobytes()]
    mat = flat.view(np.uint8).reshape(-1, flat.dtype.itemsize).T
    return [np.ascontiguousarray(row).tobytes() for row in mat]


def _plane_group_payload(arrays) -> bytes:
    """Format-3 byte layout: the plane-k bytes of EVERY tensor before any
    plane-(k+1) bytes. Adaptive/backend statistics then persist across
    tensors of the same plane kind instead of resetting at each tensor's
    exponent/mantissa transition; measured −1.2% mean rate vs format 2 on
    the finals-ladder streams, smaller on every stream
    (benchmarks/context_ab.py; the per-tensor-context alternative was
    +18.6% and is rejected there)."""
    all_planes = [_tensor_planes(a) for a in arrays]
    max_planes = max((len(p) for p in all_planes), default=1)
    return b"".join(
        b"".join(p[k] for p in all_planes if len(p) > k)
        for k in range(max_planes)
    )


def _plane_ungroup(dec: bytes, infos) -> Dict[str, np.ndarray]:
    """Inverse of _plane_group_payload; infos = ordered (name, dtype,
    shape) triples from the manifest."""
    sizes = [
        int(np.prod(shape, dtype=np.int64)) if shape else 1
        for _, _, shape in infos
    ]
    itemsizes = [np.dtype(dt).itemsize for _, dt, _ in infos]
    max_planes = max(itemsizes, default=1)
    planes: Dict[int, list] = {i: [] for i in range(len(infos))}
    offset = 0
    for k in range(max_planes):
        for i, (sz, isz) in enumerate(zip(sizes, itemsizes)):
            if isz > k and sz > 0:
                planes[i].append(dec[offset : offset + sz])
                offset += sz
    out: Dict[str, np.ndarray] = {}
    for i, (name, dt, shape) in enumerate(infos):
        dtype = np.dtype(dt)
        if sizes[i] == 0:
            out[name] = np.zeros(shape, dtype)
            continue
        buf = b"".join(planes[i])
        arr = _unshuffle_tensor_bytes(buf, dtype, sizes[i])
        out[name] = arr.reshape(shape)
    return out


def delta_meta_entry(delta: Dict[str, Any], stream_name: str) -> Dict[str, Any]:
    """Normalize a `delta` kwarg into the manifest's __meta__.delta entry
    (shared by the flat and progressive container writers)."""
    entry = {
        "sha256": str(delta["sha256"]),
        "layers": [int(i) for i in delta["layers"]],
    }
    if delta.get("xor"):
        # unquantized tensors stored as bit-pattern XOR against the
        # shared reference (apply_xor_residual) — lossless
        entry["xor"] = [str(n) for n in delta["xor"]]
    if "prev" in delta:
        # inter-frame residual (sequence.py): offsets come from the
        # PREVIOUS container's decoded weights; `prev` is a path
        # relative to this container dir, sha256 is of the previous
        # container's compressed_weights.data (chain integrity)
        entry["prev"] = str(delta["prev"])
        entry["stream"] = str(delta.get("stream", stream_name))
    else:
        entry["artifact"] = str(delta["artifact"])
    return entry


def compress_state_dict(
    state_dict: Dict[str, np.ndarray],
    dir_name: Union[str, Path],
    stream_name: str = "zstd",
    shuffle: bool = True,
    plane_group: bool = True,
    delta: Optional[Dict[str, Any]] = None,
    **kwargs,
) -> int:
    """Write compressed_weights.data + meta_data.json; return payload bytes.

    Default container is format 3 (global plane grouping, shuffle=True +
    plane_group=True): −1.2% mean rate vs the format-2 per-tensor shuffle
    at bit-identical content. plane_group=False writes format 2;
    shuffle=False writes the reference-compatible format-1 byte layout.

    `delta` (quant.delta — beyond reference): records that the quantized
    layers' codebooks are RESIDUAL codebooks against a shared
    encoder/decoder artifact (the meta-learned warm start): a dict
    {"artifact": path-as-configured, "sha256": hex of the artifact file,
    "layers": [params indices]}. The decoder resolves + hash-checks the
    artifact and reconstructs w = (offset + centroids[labels]) *
    (labels != 0) for those layers.
    """
    dir_name = Path(dir_name)
    dir_name.mkdir(exist_ok=True, parents=True)
    binary_file = dir_name / "compressed_weights.data"
    meta_file = dir_name / "meta_data.json"

    meta = OrderedDict()
    arrays = []
    for order, (name, arr) in enumerate(state_dict.items()):
        arr = np.ascontiguousarray(arr)
        arrays.append(arr)
        meta[str(order)] = {
            "shape": list(arr.shape),
            "dtype": str(arr.dtype),
            "name": name,
        }
    if shuffle and plane_group:
        raw = _plane_group_payload(arrays)
        meta["__meta__"] = {"format": 3, "shuffle": True, "plane_group": True}
    elif shuffle:
        raw = b"".join(_shuffle_tensor_bytes(a) for a in arrays)
        # format-2 marker; omitted for shuffle=False so the archive stays
        # byte-level readable by the REFERENCE's decompress_state_dict
        # (its reader does int(k) over all meta keys, __init__.py:138)
        meta["__meta__"] = {"format": 2, "shuffle": True}
    else:
        raw = b"".join(a.tobytes() for a in arrays)
    if delta is not None:
        # delta streams are never reference-readable (the reference has no
        # shared-artifact notion), so writing __meta__ is fine even at
        # shuffle=False
        meta.setdefault("__meta__", {"format": 1, "shuffle": False})
        meta["__meta__"]["delta"] = delta_meta_entry(delta, stream_name)

    payload = encode_stream(stream_name, raw, **kwargs)
    binary_file.write_bytes(payload)
    meta_file.write_text(json.dumps(meta, indent=2, sort_keys=True))
    return binary_file.stat().st_size


def read_raw_container(
    dir_name: Union[str, Path], stream_name: str = "zstd", **kwargs
) -> "OrderedDict[str, np.ndarray]":
    """Read a container back to the STORED per-tensor arrays (labels,
    centroids, fp16/fp32 weights) without re-materializing weights —
    the analysis/recoding entry (benchmarks/context_ab.py)."""
    dir_name = Path(dir_name)
    meta = json.loads((dir_name / "meta_data.json").read_text())
    fmt = meta.pop("__meta__", {"format": 1, "shuffle": False})
    if int(fmt.get("format", 1)) == 4:
        # progressive container (coding/progressive.py): base_only=True
        # reads just the standalone prefix (base-quality decode)
        from implicit_image_tpu.coding.progressive import read_progressive

        return read_progressive(
            dir_name, stream_name,
            base_only=bool(kwargs.pop("base_only", False)), **kwargs,
        )
    shuffle = bool(fmt.get("shuffle", False))
    plane_group = bool(fmt.get("plane_group", False))
    meta = {int(k): v for k, v in meta.items()}

    infos = [
        (meta[o]["name"], meta[o]["dtype"], meta[o]["shape"])
        for o in sorted(meta)
    ]
    # the manifest pins the exact raw payload size; passing it down turns
    # silent truncation/corruption into a loud ValueError and bounds the
    # native decoders' declared-size output allocation
    expected = sum(
        (int(np.prod(shape, dtype=np.int64)) if shape else 1)
        * np.dtype(dt).itemsize
        for _, dt, shape in infos
    )
    try:
        dec = decode_stream(
            stream_name,
            (dir_name / "compressed_weights.data").read_bytes(),
            expected_size=expected,
            **kwargs,
        )
    except ValueError:
        raise
    except Exception as e:  # zlib.error / ZstdError / LZMAError / ...
        raise ValueError(
            f"corrupt container {dir_name} (backend {stream_name}): {e!r}"
        ) from e
    if plane_group:  # format 3
        grouped = _plane_ungroup(dec, infos)
        return OrderedDict((name, grouped[name]) for name, _, _ in infos)

    raw: "OrderedDict[str, np.ndarray]" = OrderedDict()
    offset = 0
    for name, dt, shape in infos:
        dtype = np.dtype(dt)
        size = int(np.prod(shape, dtype=np.int64)) if shape else 1
        nbytes = size * dtype.itemsize
        if shuffle:
            arr = _unshuffle_tensor_bytes(dec[offset : offset + nbytes], dtype, size)
        else:
            arr = np.frombuffer(dec, dtype=dtype, count=size, offset=offset)
        raw[name] = arr.reshape(shape)
        offset += nbytes
    return raw


def _resolve_delta_offsets(
    dir_name: Path,
    info: Dict[str, Any],
    override: Optional[Union[str, Path]] = None,
) -> Dict[int, np.ndarray]:
    """Locate + hash-check the shared delta artifact; return {layer: w}.

    Search order: explicit override, the path as recorded at encode time,
    that path relative to the repo root, the artifact's basename next to
    the run dir, and the repo's committed assets/meta/ — the same
    drop-in philosophy as data.resolve_benchmark_path. The sha256 check
    makes a wrong artifact fail loudly instead of decoding garbage.
    """
    import hashlib

    repo = Path(__file__).resolve().parents[2]
    rec = Path(info["artifact"])
    candidates = []
    if override is not None:
        candidates.append(Path(override))
    candidates += [
        rec,
        repo / rec,
        dir_name / rec.name,
        dir_name.parent / rec.name,
        repo / "assets" / "meta" / rec.name,
    ]
    path = next((c for c in candidates if c.is_file()), None)
    if path is None:
        raise FileNotFoundError(
            f"delta artifact {info['artifact']!r} not found (searched "
            f"{[str(c) for c in candidates]}); pass delta_artifact=<path> "
            "or place the file in assets/meta/"
        )
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    if digest != info["sha256"]:
        raise ValueError(
            f"delta artifact {path} sha256 mismatch: stream was encoded "
            f"against {info['sha256'][:12]}…, file is {digest[:12]}…"
        )
    npz = np.load(path)
    # the artifact is a meta-init .npz (training/metainit.py
    # save_meta_init): tensors live under "params.{i}.{w|b|...}"; map to
    # the canonical state names (weights feed the +offset rule, all
    # entries serve the XOR residual decode)
    out: Dict[str, np.ndarray] = {}
    for k in npz.files:
        if not k.startswith("params."):
            continue
        _, idx, key = k.split(".", 2)
        name = {"w": "weight", "b": "bias"}.get(key, key)
        out[f"layers.{int(idx)}.{name}"] = np.asarray(npz[k], np.float32)
    return out


def _resolve_prev_offsets(
    dir_name: Path,
    info: Dict[str, Any],
    prev_state: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Reference map for an inter-frame delta container: the PREVIOUS
    frame's decoded state (sequence.py). `prev_state` short-circuits the
    walk — the sequence decoder decodes frames in order and hands each
    frame the one it just produced; standalone decodes recurse down the
    reference chain (O(chain length), every link sha256-checked)."""
    import hashlib

    prev_dir = (dir_name / info["prev"]).resolve()
    payload = prev_dir / "compressed_weights.data"
    if not payload.is_file():
        raise FileNotFoundError(
            f"inter-frame delta container {dir_name} references previous "
            f"frame {info['prev']!r} -> {prev_dir}, which has no "
            "compressed_weights.data; decode the sequence in place or via "
            "sequence.decode_sequence"
        )
    digest = hashlib.sha256(payload.read_bytes()).hexdigest()
    if digest != info["sha256"]:
        raise ValueError(
            f"previous frame {prev_dir} sha256 mismatch: this stream was "
            f"encoded against {info['sha256'][:12]}…, file is "
            f"{digest[:12]}… (broken sequence chain)"
        )
    if prev_state is None:
        prev_state = decompress_state_dict(
            prev_dir, str(info.get("stream", "zstd"))
        )
    return {k: np.asarray(v, np.float32) for k, v in prev_state.items()}


def decompress_state_dict(
    dir_name: Union[str, Path],
    stream_name: str = "zstd",
    delta_artifact: Optional[Union[str, Path]] = None,
    prev_state: Optional[Dict[str, np.ndarray]] = None,
    **kwargs,
) -> Dict[str, np.ndarray]:
    """Read the bitstream back; re-materialize weight = centroids[labels].

    Returns float32 arrays keyed by canonical names (`layers.{i}.weight`
    etc.), exactly the reference's decode semantics (:146-185). Delta
    streams (quant.delta) additionally add the shared-artifact offset:
    w = (offset + centroids[labels]) * (labels != 0); `delta_artifact`
    overrides the artifact location recorded in the manifest. Inter-frame
    delta streams (sequence.py) take their offsets from the PREVIOUS
    frame's decoded weights instead: pass that frame's decoded state as
    `prev_state` when decoding a sequence in order, or leave it None and
    the chain is walked (and sha256-verified) recursively.
    """
    dir_name = Path(dir_name)
    raw = read_raw_container(dir_name, stream_name, **kwargs)
    fmt = json.loads((dir_name / "meta_data.json").read_text()).get(
        "__meta__", {}
    )
    refs: Dict[str, np.ndarray] = {}
    delta_layers: set = set()
    if "delta" in fmt:
        if "prev" in fmt["delta"]:
            refs = _resolve_prev_offsets(dir_name, fmt["delta"], prev_state)
        else:
            refs = _resolve_delta_offsets(
                dir_name, fmt["delta"], delta_artifact
            )
        delta_layers = {int(i) for i in fmt["delta"]["layers"]}
        # XOR residual decode for the unquantized tensors
        # (apply_xor_residual — self-inverse, bit-exact)
        for name in fmt["delta"].get("xor", []):
            raw[name] = _xor_arrays(raw[name], refs[name])

    out: Dict[str, np.ndarray] = {}
    for name, arr in raw.items():
        if "centroids" in name or "qscale" in name:
            continue
        if "labeled_weight" in name:
            qscale_name = name.replace("labeled_weight", "qscale")
            if qscale_name in raw:  # per-channel symmetric (fbgemm QAT)
                scales = np.asarray(raw[qscale_name], np.float32)
                weight = arr.astype(np.float32) * scales[None, :]
            else:
                centroids = raw[name.replace("labeled_weight", "centroids")]
                weight = centroids[arr]
                layer_i = int(name.split(".", 2)[1])
                if layer_i in delta_layers:
                    weight = (
                        weight.astype(np.float32)
                        + refs[f"layers.{layer_i}.weight"]
                    ) * (arr != 0)
            out[name.replace("labeled_weight", "weight")] = weight.astype(np.float32)
        else:
            out[name] = np.asarray(arr, dtype=np.float32)
    return out


def params_from_state_dict(state_dict: Dict[str, np.ndarray]) -> Tuple[dict, ...]:
    """Rebuild the params pytree from a decoded state dict."""
    layers: Dict[int, dict] = {}
    for name, arr in state_dict.items():
        _, idx, key = name.split(".", 2)
        i = int(idx)
        key = {"weight": "w", "bias": "b"}.get(key, key)
        layers.setdefault(i, {})[key] = jnp.asarray(arr)
    return tuple(layers[i] for i in sorted(layers))


# Compiled render programs keyed by VALUE (ModelDef/configs are frozen
# dataclasses): a fresh `jax.jit(lambda ...)` per call would retrace —
# and through the tunnel recompile (~15-20 s) — for EVERY decode, which
# made batched_compress's per-image decode loop ~4x slower than its
# whole batched fit. Entries are tiny (a closed jitted callable); the
# model zoo is small, so no eviction.
_render_cache: Dict[tuple, Any] = {}


def _get_render(mdef, mcfg, height: int, width: int,
                precision: str = "tensorfloat32"):
    import jax

    from implicit_image_tpu.data import get_grid

    key = (mdef, mcfg, int(height), int(width), precision)
    fn = _render_cache.get(key)
    if fn is None:
        grid = get_grid(height, width)
        if precision:
            # DECODER matmul precision: the silent TPU default is one
            # bf16 pass, which CAPS the rendered quality near ~53 dB —
            # visibly lossy against 58+ dB bitstreams (measured,
            # BASELINE.md "Matmul pass precision"). Three passes cost
            # ~10 ms extra at 512²; accuracy is the decoder's job.
            def render(p):
                with jax.default_matmul_precision(precision):
                    return mdef.apply(p, grid, mcfg)

            fn = jax.jit(render)
        else:
            fn = jax.jit(lambda p: mdef.apply(p, grid, mcfg))
        _render_cache[key] = fn
    return fn


def decode_and_render(
    dir_name: Union[str, Path],
    stream_name: str,
    mdef,
    mcfg,
    height: int,
    width: int,
    benchmark: bool = True,
    **kwargs,
):
    """Full decoder: bitstream -> params -> rendered (H, W, 3) image.

    Returns (image, stats) where stats has host decode and device render
    wall-clock plus Mpix/s. The reference has no decode entry point
    (SURVEY.md §3.2); this is the canonical one.

    benchmark=False skips the steady-state render-rate measurement (a
    compiled 8-rep scan) — used by the orchestrator's per-run decoded-PSNR
    check, where only the decoded image matters.
    """
    import jax
    import numpy as np_

    from implicit_image_tpu.data import get_grid

    t0 = time.perf_counter()
    state = decompress_state_dict(dir_name, stream_name, **kwargs)
    t0b = time.perf_counter()
    params = params_from_state_dict(state)  # host->device upload
    if isinstance(params[-1], dict):
        # force the async transfer to finish (fetch one scalar back)
        np_.asarray(jnp.ravel(next(iter(params[-1].values())))[0])
    t1 = time.perf_counter()
    grid = get_grid(height, width)
    render = _get_render(mdef, mcfg, height, width)
    img = np_.asarray(render(params))  # (compile +) first render + readback
    t2 = time.perf_counter()
    if not benchmark:
        return img, {
            "decode_s": t0b - t0,
            "upload_s": t1 - t0b,
            "first_render_s": t2 - t1,
        }
    # Steady-state device rate: K renders inside ONE dispatch (per-dispatch
    # tunnel latency and block_until_ready are unreliable on remote TPU
    # runtimes), forced to completion by a host readback of a scalar.
    reps = 8

    @jax.jit
    def render_many(p):
        def body(c, _):
            # tie the params to the carry so XLA cannot hoist the render
            # out of the loop (the perturbation is below f32 resolution)
            pc = jax.tree_util.tree_map(lambda x: x * (1.0 + c * 1e-38), p)
            out = mdef.apply(pc, grid, mcfg)
            return c + out[0, 0, 0], None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return acc

    np_.asarray(render_many(params))  # warm-up compile
    t3 = time.perf_counter()
    np_.asarray(render_many(params))
    t4 = time.perf_counter()
    render_s = (t4 - t3) / reps
    stats = {
        "decode_s": t0b - t0,  # host entropy decode only
        "upload_s": t1 - t0b,  # host->device param transfer
        "first_render_s": t2 - t1,
        "render_s": render_s,
        "mpix_per_s": (height * width) / max(render_s, 1e-9) / 1e6,
    }
    return img, stats


def _get_region_render(mdef, mcfg):
    """One jit wrapper per (model, config), shared across render_region
    calls — grid is a traced argument, so every band/window shape reuses
    the same cache and identical shapes never recompile."""
    import jax

    key = ("region", mdef, mcfg)
    fn = _render_cache.get(key)
    if fn is None:
        # same decoder-precision default as _get_render
        def render(p, g):
            with jax.default_matmul_precision("tensorfloat32"):
                return mdef.apply(p, g, mcfg)

        fn = jax.jit(render)
        _render_cache[key] = fn
    return fn


def render_region(
    mdef,
    mcfg,
    params,
    height: int,
    width: int,
    roi: Optional[Tuple[int, int, int, int]] = None,
    tile_rows: int = 0,
) -> "np.ndarray":
    """Render (a window of) an arbitrary H×W lattice from decoded params.

    The INR artifact is resolution-free: `height`/`width` need not match
    the fitted size (super-resolution / thumbnail decode), and `roi =
    (row0, row1, col0, col1)` selects an axis-aligned window of that
    lattice — the window render is bit-identical to the corresponding
    slice of the full render (get_grid_window semantics). `tile_rows > 0`
    renders row bands of at most that many rows per device call and
    stitches on host, bounding device memory for huge outputs (gigapixel
    decode from a KB-scale bitstream). The reference has no counterpart:
    its decode path can only re-evaluate the full training grid
    (SURVEY.md §3.2, reference entropy_coding/__init__.py:123-186).

    Not supported for fixed-geometry families (wavelet_siren asserts the
    training grid shape — models/wavelet_siren.py).
    """
    from implicit_image_tpu.data import get_grid_window

    r0, r1, c0, c1 = roi if roi is not None else (0, height, 0, width)
    if not (0 <= r0 < r1 <= height and 0 <= c0 < c1 <= width):
        raise ValueError(f"roi {roi} out of bounds for {height}x{width}")
    render = _get_region_render(mdef, mcfg)
    if tile_rows <= 0 or tile_rows >= r1 - r0:
        grid = get_grid_window(height, width, r0, r1, c0, c1)
        return np.asarray(render(params, grid))
    # Row-band tiling: every full band shares ONE compiled program; a
    # shorter remainder band (if any) costs one extra compile. Dispatch is
    # async, so keeping a small window of bands in flight overlaps device
    # compute with host readback while still bounding device memory.
    bands, pending = [], []
    for y in range(r0, r1, tile_rows):
        g = get_grid_window(height, width, y, min(y + tile_rows, r1), c0, c1)
        pending.append(render(params, g))
        if len(pending) > 2:
            bands.append(np.asarray(pending.pop(0)))
    bands.extend(np.asarray(b) for b in pending)
    return np.concatenate(bands, axis=0)
