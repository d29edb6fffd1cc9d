"""Stream backends for the weight bitstream.

Capability parity with reference `entropy_coding/parsers.py` (NumpyParser,
LZMAParser) and `get_stream_writer/reader` (__init__.py:44-67), plus two
backends the reference lacks:

  * plain   — raw bytes (reference NumpyParser, parsers.py:20-42)
  * zstd    — level-22 (reference __init__.py:45-46; conf/entropy_coding/
              zstd.yaml), zlib fallback when zstandard is unavailable
  * lzma    — (reference LZMAParser, parsers.py:45-63)
  * huffman — real canonical-Huffman codec (the reference declared this
              backend but left it a stub, __init__.py:51-52,64-65)
  * range   — adaptive order-1 binary range coder (native C++); beats
              zstd-22 on the actual fp16-weight / k-means-label payload
  * rans    — static 2-way interleaved rANS (native C++): fractional-bit
              rate at table-driven decode speed — the decode-latency-
              optimized choice for serving
  * auto    — encodes with every backend, keeps the smallest (1-byte tag)

Functional API instead of the reference's writer/reader classes: the whole
payload is one buffer (the reference also compresses the concatenated
tensor bytes as a single stream), so `encode_stream`/`decode_stream` on
bytes is the natural form.
"""
from __future__ import annotations

import lzma
import zlib

from implicit_image_tpu.coding.huffman import huffman_decode, huffman_encode
from implicit_image_tpu.coding.range_coder import range_decode, range_encode
from implicit_image_tpu.coding.rans import rans_decode, rans_encode

__all__ = ["encode_stream", "decode_stream", "backend_names"]

backend_names = ("plain", "zstd", "lzma", "huffman", "range", "rans", "auto")

# Candidate set for the `auto` backend; tag byte = index in this tuple.
# Append-only: existing tags are burned into already-written containers.
_AUTO_ORDER = ("zstd", "lzma", "huffman", "range", "plain", "rans")


def encode_stream(name: str, raw: bytes, level: int = 22, **kwargs) -> bytes:
    if name == "plain":
        return raw
    if name == "zstd":
        try:
            import zstandard

            return zstandard.ZstdCompressor(level=level).compress(raw)
        except ImportError:  # zero-dep fallback, container self-describes
            return zlib.compress(raw, 9)
    if name == "lzma":
        return lzma.compress(raw)
    if name == "huffman":
        return huffman_encode(raw)
    if name == "range":
        return range_encode(raw)
    if name == "rans":
        return rans_encode(raw)
    if name == "auto":
        best_tag, best = 0, None
        for tag, backend in enumerate(_AUTO_ORDER):
            blob = encode_stream(backend, raw, level=level)
            if best is None or len(blob) < len(best):
                best_tag, best = tag, blob
        return bytes([best_tag]) + best
    raise NotImplementedError(f"stream writer {name} not found.")


def decode_stream(
    name: str, blob: bytes, expected_size: int = None, **kwargs
) -> bytes:
    """Decode one backend stream. `expected_size` (when the caller knows
    the exact raw payload size, e.g. from the container manifest) turns
    silent truncation/corruption into a loud ValueError and — for the
    native backends, whose declared-size field would otherwise drive the
    output allocation — bounds that allocation to the expected size."""
    if name == "plain":
        if expected_size is not None and len(blob) != expected_size:
            raise ValueError(
                f"corrupt plain stream: {len(blob)} bytes, container "
                f"manifest expects {expected_size}"
            )
        return blob
    if name in ("huffman", "range", "rans"):
        dec = {"huffman": huffman_decode, "range": range_decode,
               "rans": rans_decode}[name](blob, expected_size=expected_size)
        if expected_size is not None and len(dec) != expected_size:
            raise ValueError(
                f"corrupt {name} stream: decoded {len(dec)} bytes, "
                f"container manifest expects {expected_size}"
            )
        return dec
    if name == "zstd":
        # pick the codec by stream CONTENT, not by local import
        # availability — a stream zlib-encoded on a machine without
        # zstandard must still decode on one that has it (and vice versa)
        is_zstd = blob[:4] == b"\x28\xb5\x2f\xfd"
        if is_zstd:
            try:
                import zstandard
            except ImportError as e:
                raise RuntimeError(
                    "stream is zstd-compressed but the zstandard package "
                    "is unavailable in this environment"
                ) from e
            # decompressobj handles frames without a content-size header
            # (the reference's stream_writer API emits those,
            # entropy_coding/__init__.py:97-116) as well as one-shot frames
            dec = zstandard.ZstdDecompressor().decompressobj().decompress(blob)
        else:
            dec = zlib.decompress(blob)
    elif name == "lzma":
        dec = lzma.decompress(blob)
    elif name == "auto":
        if not blob:
            raise ValueError("empty auto-coded stream")
        tag = blob[0]
        if tag >= len(_AUTO_ORDER):
            raise ValueError(f"corrupt auto-coded stream: unknown backend tag {tag}")
        return decode_stream(_AUTO_ORDER[tag], blob[1:],
                             expected_size=expected_size)
    else:
        raise NotImplementedError(f"stream reader {name} not found.")
    if expected_size is not None and len(dec) != expected_size:
        raise ValueError(
            f"corrupt {name} stream: decoded {len(dec)} bytes, container "
            f"manifest expects {expected_size}"
        )
    return dec
