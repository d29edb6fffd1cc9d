"""Shared build-on-first-use ctypes loader for the native entropy codecs.

Both coding/native/*.cpp codecs expose the same shape of C API
(bound/encode/decode); this helper compiles the .so with g++ if missing
and binds the prototypes, returning None when no native toolchain exists
(callers fall back to their bit-identical pure-Python implementations).

Concurrent multirun processes may race to build: compile to a unique temp
name and os.replace (atomic) into place.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, Optional, Sequence, Tuple

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")

# fn name -> (restype, argtypes)
Prototypes = Dict[str, Tuple[object, Sequence[object]]]


def load_or_build(so_name: str, src_name: str, protos: Prototypes) -> Optional[ctypes.CDLL]:
    so_path = os.path.join(NATIVE_DIR, so_name)
    try:
        if not os.path.exists(so_path):
            src = os.path.join(NATIVE_DIR, src_name)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=NATIVE_DIR)
            os.close(fd)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", src, "-o", tmp],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
                os.replace(tmp, so_path)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so_path)
        for fn, (restype, argtypes) in protos.items():
            sym = getattr(lib, fn)
            sym.restype = restype
            sym.argtypes = list(argtypes)
        return lib
    except Exception:
        return None


# the common codec signature: bound(u64)->u64, encode/decode(buf,u64,buf,u64)->u64
def codec_protos(prefix: str) -> Prototypes:
    u64 = ctypes.c_uint64
    buf = ctypes.c_char_p
    return {
        f"{prefix}_bound": (u64, [u64]),
        f"{prefix}_encode": (u64, [buf, u64, buf, u64]),
        f"{prefix}_decode": (u64, [buf, u64, buf, u64]),
    }
