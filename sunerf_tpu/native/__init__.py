"""Native (C++) helpers, compiled on demand with g++ and loaded via ctypes.

Currently: the RICE_1 tile decompressor for compressed FITS (rice.cpp).
Pure-Python fallbacks exist for every native routine (slower, same results),
so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_lib = None
_lib_tried = False


def _build_dir() -> str:
    d = os.environ.get('SUNERF_TPU_NATIVE_CACHE',
                       os.path.join(os.path.expanduser('~'), '.cache',
                                    'sunerf_tpu'))
    os.makedirs(d, exist_ok=True)
    return d


def _load_library():
    """Compile rice.cpp (cached by source hash) and dlopen it; None when no
    working g++ is available."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(_SRC_DIR, 'rice.cpp')
    try:
        with open(src, 'rb') as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(_build_dir(), f'librice_{tag}.so')
        if not os.path.exists(so):
            tmp = so + f'.tmp{os.getpid()}'
            subprocess.run(['g++', '-O3', '-shared', '-fPIC', src, '-o', tmp],
                           check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)  # atomic under concurrent builders
        lib = ctypes.CDLL(so)
        lib.rice_decode.restype = ctypes.c_int
        lib.rice_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_int, ctypes.c_int]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        logger.warning('native rice decoder unavailable (%s); '
                       'falling back to pure Python', e)
        _lib = None
    return _lib


_RICE_PARAMS = {1: (3, 6, np.uint8), 2: (4, 14, np.int16), 4: (5, 25, np.int32)}


def _rice_decode_py(buf: bytes, npix: int, bytepix: int,
                    nblock: int) -> np.ndarray:
    """Pure-Python RICE_1 decoder (same algorithm as rice.cpp)."""
    fsbits, fsmax, dtype = _RICE_PARAMS[bytepix]
    bbits = bytepix * 8
    mask = (1 << bbits) - 1
    out = np.empty(npix, dtype)

    pos = 0      # bit cursor state
    acc, nbits = 0, 0
    data = memoryview(buf)

    def get(n):
        nonlocal pos, acc, nbits
        while nbits < n:
            if pos >= len(data):
                raise ValueError('truncated RICE stream')
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= n
        v = (acc >> nbits) & ((1 << n) - 1)
        acc &= (1 << nbits) - 1
        return v

    def unary():
        nonlocal pos, acc, nbits
        count = 0
        while True:
            if nbits == 0:
                if pos >= len(data):
                    raise ValueError('truncated RICE stream')
                acc = data[pos]
                pos += 1
                nbits = 8
            if acc == 0:
                count += nbits
                nbits = 0
                continue
            top = acc.bit_length() - 1
            count += nbits - 1 - top
            nbits = top
            acc &= (1 << nbits) - 1
            return count

    half = 1 << (bbits - 1)

    def signed(v):  # unsigned bbits-wide value -> the output dtype's value
        return v - (1 << bbits) if bytepix > 1 and v >= half else v

    lastpix = get(bbits)
    i = 0
    while i < npix:
        fs = get(fsbits) - 1
        imax = min(i + nblock, npix)
        if fs < 0:
            out[i:imax] = signed(lastpix)
            i = imax
        else:
            direct = fs == fsmax
            while i < imax:
                if direct:
                    diff = get(bbits)
                else:
                    diff = (unary() << fs) | (get(fs) if fs else 0)
                if diff & 1:
                    diff = (~(diff >> 1)) & mask
                else:
                    diff >>= 1
                lastpix = (lastpix + diff) & mask
                out[i] = signed(lastpix)
                i += 1
    return out


def rice_decode(buf: bytes, npix: int, bytepix: int = 4,
                nblock: int = 32) -> np.ndarray:
    """Decompress one RICE_1 tile to npix pixels of width bytepix bytes."""
    if bytepix not in _RICE_PARAMS:
        raise ValueError(f'unsupported RICE BYTEPIX {bytepix}')
    lib = _load_library()
    dtype = _RICE_PARAMS[bytepix][2]
    if lib is not None:
        out = np.empty(npix, dtype)
        rc = lib.rice_decode(buf, len(buf),
                             out.ctypes.data_as(ctypes.c_void_p),
                             npix, bytepix, nblock)
        if rc == 0:
            return out
        raise ValueError(f'RICE stream decode failed (rc={rc}, '
                         f'npix={npix}, bytepix={bytepix})')
    return _rice_decode_py(buf, npix, bytepix, nblock)
