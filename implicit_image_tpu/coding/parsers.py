"""Stream backends for the weight bitstream.

Capability parity with reference `entropy_coding/parsers.py` (NumpyParser,
LZMAParser) and `get_stream_writer/reader` (__init__.py:44-67): four
backends {plain, zstd, lzma, huffman}, selected by name. The reference's
zstd level-22 default comes from conf/entropy_coding/zstd.yaml; its huffman
backend was an unimplemented stub — here it is real (huffman.py, with a
native C++ fast path).

Functional API instead of the reference's writer/reader classes: the whole
payload is one buffer (the reference also compresses the concatenated
tensor bytes as a single stream), so `encode_stream`/`decode_stream` on
bytes is the natural form.
"""
from __future__ import annotations

import lzma
import zlib

from implicit_image_tpu.coding.huffman import huffman_decode, huffman_encode

__all__ = ["encode_stream", "decode_stream", "backend_names"]

backend_names = ("plain", "zstd", "lzma", "huffman")


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
    raise NotImplementedError(f"stream writer {name} not found.")


def decode_stream(name: str, blob: bytes, **kwargs) -> bytes:
    if name == "plain":
        return blob
    if name == "zstd":
        try:
            import zstandard

            return zstandard.ZstdDecompressor().decompress(blob)
        except ImportError:
            return zlib.decompress(blob)
    if name == "lzma":
        return lzma.decompress(blob)
    if name == "huffman":
        return huffman_decode(blob)
    raise NotImplementedError(f"stream reader {name} not found.")
