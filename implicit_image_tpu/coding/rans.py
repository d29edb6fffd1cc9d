"""Static 2-way interleaved rANS codec — Python API + pure-Python fallback.

Fast-decode entropy backend: fractional-bit rate (like the range coder's
order-0 floor) at table-driven decode speed (like Huffman). Hot path is
the native C++ codec (native/rans.cpp) loaded via ctypes and built on
first use with g++; the pure-Python fallback emits the bit-identical
container format:

  u32 magic 'IIRA' | u64 raw_size | u16 n_syms
  | n_syms x { u8 symbol, u16 freq }   (freqs sum to 1<<14 exactly)
  | u32 state0 | u32 state1 | renorm byte stream

The reference's entropy stage offers only generic LZ codecs over the
weight bytes (reference entropy_coding/__init__.py:44-67); rANS is the
decode-latency-optimized native counterpart.
"""
from __future__ import annotations

import ctypes
import struct
from typing import List, Optional

import numpy as np

from implicit_image_tpu.coding.native_loader import codec_protos, load_or_build

__all__ = ["rans_encode", "rans_decode", "native_available"]

_MAGIC = 0x41524949  # "IIRA"
_SCALE_BITS = 14
_SCALE = 1 << _SCALE_BITS
_RANS_L = 1 << 23

_lib: Optional[ctypes.CDLL] = None
_native_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _native_failed
    if _lib is not None or _native_failed:
        return _lib
    _lib = load_or_build("libiirans.so", "rans.cpp", codec_protos("iirans"))
    _native_failed = _lib is None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


# ---------------------------------------------------------------- fallback


def _normalize_freqs(freq: List[int], total: int) -> List[int]:
    """Cumulative rounding to sum 1<<14; mirrors rans.cpp normalize()."""
    scaled = [0] * 256
    acc = 0
    cum = 0
    for s in range(256):
        acc += freq[s]
        new_cum = acc * _SCALE // total
        scaled[s] = new_cum - cum
        cum = new_cum
    deficit = 0
    for s in range(256):
        if freq[s] and scaled[s] == 0:
            scaled[s] = 1
            deficit += 1
    while deficit > 0:  # steal from the largest bin (lowest index wins ties)
        big = -1
        for s in range(256):
            if scaled[s] > 1 and (big < 0 or scaled[s] > scaled[big]):
                big = s
        scaled[big] -= 1
        deficit -= 1
    return scaled


def _py_encode(data: bytes) -> bytes:
    n = len(data)
    freq = [0] * 256
    for b in data:
        freq[b] += 1
    scaled = _normalize_freqs(freq, n) if n else [0] * 256
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + scaled[s]

    out = bytearray(struct.pack("<IQ", _MAGIC, n))
    present = [s for s in range(256) if scaled[s]]
    out += struct.pack("<H", len(present))
    for s in present:
        out += struct.pack("<BH", s, scaled[s])
    if n == 0:
        return bytes(out)

    renorm = bytearray()  # emitted "backwards": built in reverse order
    x0 = x1 = _RANS_L
    for j in range(n - 1, -1, -1):
        b = data[j]
        f = scaled[b]
        x = x1 if j & 1 else x0
        x_max = ((_RANS_L >> _SCALE_BITS) << 8) * f
        while x >= x_max:
            renorm.append(x & 0xFF)
            x >>= 8
        x = ((x // f) << _SCALE_BITS) + (x % f) + cum[b]
        if j & 1:
            x1 = x
        else:
            x0 = x
    out += struct.pack("<II", x0, x1)
    out += bytes(reversed(renorm))
    return bytes(out)


def _py_decode(blob: bytes) -> bytes:
    if len(blob) < 14:
        raise ValueError("truncated rans stream")
    magic, raw = struct.unpack_from("<IQ", blob, 0)
    if magic != _MAGIC:
        raise ValueError("bad rans magic")
    if raw == 0:
        return b""
    (n_syms,) = struct.unpack_from("<H", blob, 12)
    hp = 14
    if len(blob) < hp + 3 * n_syms + 8:
        raise ValueError("truncated rans stream")
    scaled = [0] * 256
    for _ in range(n_syms):
        s, f = struct.unpack_from("<BH", blob, hp)
        hp += 3
        scaled[s] = f
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + scaled[s]
    if cum[256] != _SCALE:
        raise ValueError("corrupt rans frequency table")
    slot = np.zeros(_SCALE, np.uint8)
    for s in range(256):
        if scaled[s]:
            slot[cum[s] : cum[s + 1]] = s

    x0, x1 = struct.unpack_from("<II", blob, hp)
    p = hp + 8
    out = bytearray()
    for i in range(raw):
        x = x1 if i & 1 else x0
        lo = x & (_SCALE - 1)
        s = int(slot[lo])
        out.append(s)
        x = scaled[s] * (x >> _SCALE_BITS) + lo - cum[s]
        while x < _RANS_L:
            if p >= len(blob):
                raise ValueError("truncated rans stream")
            x = (x << 8) | blob[p]
            p += 1
        if i & 1:
            x1 = x
        else:
            x0 = x
    return bytes(out)


# ---------------------------------------------------------------- public


def rans_encode(data: bytes) -> bytes:
    lib = _load_native()
    if lib is None:
        return _py_encode(data)
    cap = lib.iirans_bound(len(data))
    out = ctypes.create_string_buffer(cap)
    n = lib.iirans_encode(data, len(data), out, cap)
    if n == 0:
        return _py_encode(data)
    return out.raw[:n]


def rans_decode(blob: bytes, expected_size: Optional[int] = None) -> bytes:
    # validate the header here so every corrupt path raises ValueError
    # (the contract the other backends follow) before any allocation
    if len(blob) < 14:
        raise ValueError("truncated rans stream")
    magic, raw = struct.unpack_from("<IQ", blob, 0)
    if magic != _MAGIC:
        raise ValueError("bad rans magic")
    if expected_size is not None and raw != expected_size:
        # the container layer knows the exact payload size from the
        # manifest — a mismatched declared size is corruption, caught
        # BEFORE the size-raw allocation (rANS can legitimately expand
        # arbitrarily, so only this check fully bounds it)
        raise ValueError(
            f"corrupt rans stream: declares {raw} bytes, container "
            f"manifest expects {expected_size}"
        )
    if raw == 0:
        return b""
    if raw > 1 << 40:  # corrupt size field would drive the allocation
        raise ValueError(f"implausible rans raw size {raw}")
    lib = _load_native()
    if lib is None:
        return _py_decode(blob)
    out = ctypes.create_string_buffer(raw)
    got = lib.iirans_decode(blob, len(blob), out, raw)
    if got != raw:
        return _py_decode(blob)  # raises ValueError with the root cause
    return out.raw[:raw]
