"""Native host codec: ctypes bridge to hostcodec.cpp.

Builds `libhostcodec.so` with g++ on first use (cached next to the
source) and exposes batch encode/decode between numpy uint64 word
arrays and device limb arrays. Falls back to the pure-Python
`fields.limb` codec when no compiler is available — every caller goes
through `encode_ints` / `decode_limbs`, so behavior is identical.
"""
from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

from ..fields.limb import FieldSpec, LIMB_BITS, int_to_limbs, limbs_to_int

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhostcodec.so")
_SRC = os.path.join(_DIR, "hostcodec.cpp")


@functools.lru_cache(None)
def _lib():
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.ls_encode.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_uint32)]
        lib.ls_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_uint64)]
        return lib
    except Exception:
        return None


def _words(x: int) -> np.ndarray:
    return np.array([(x >> (64 * i)) & ((1 << 64) - 1) for i in range(4)],
                    dtype=np.uint64)


@functools.lru_cache(None)
def _ctx(p: int, nlimbs: int, decode: bool) -> np.ndarray:
    R260 = 1 << (LIMB_BITS * nlimbs)
    factor = pow(R260, -1, p) if decode else (R260 % p)
    ctx = np.concatenate([
        _words(p), _words((1 << 512) % p), _words(factor),
        _words((1 << 256) % p),
        np.array([(-pow(p, -1, 1 << 64)) % (1 << 64), nlimbs],
                 dtype=np.uint64),
    ])
    return np.ascontiguousarray(ctx, dtype=np.uint64)


def ints_to_words(xs) -> np.ndarray:
    """Python ints -> [n, 4] uint64 LE words."""
    out = np.empty((len(xs), 4), dtype=np.uint64)
    mask = (1 << 64) - 1
    for i, x in enumerate(xs):
        x = int(x)
        out[i] = [(x >> (64 * j)) & mask for j in range(4)]
    return out


def words_to_ints(w: np.ndarray):
    return [int(r[0]) | (int(r[1]) << 64) | (int(r[2]) << 128)
            | (int(r[3]) << 192) for r in w]


def encode_words(spec: FieldSpec, words: np.ndarray,
                 to_mont: bool = True) -> np.ndarray:
    """[n, 4] uint64 canonical values -> [n, nlimbs] device limbs."""
    lib = _lib()
    n = words.shape[0]
    words = np.ascontiguousarray(words, dtype=np.uint64)
    if lib is None:
        xs = words_to_ints(words)
        if to_mont:
            return np.stack([spec.to_mont_int(x)[:, 0] for x in xs])
        return np.stack([int_to_limbs(x, spec.nlimbs) for x in xs])
    out = np.empty((n, spec.nlimbs), dtype=np.uint32)
    ctx = _ctx(spec.p, spec.nlimbs, False)
    lib.ls_encode(
        ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, int(to_mont),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def decode_limbs(spec: FieldSpec, limbs: np.ndarray,
                 from_mont: bool = True) -> np.ndarray:
    """[n, nlimbs] device limbs -> [n, 4] uint64 canonical values."""
    lib = _lib()
    limbs = np.ascontiguousarray(limbs, dtype=np.uint32)
    n = limbs.shape[0]
    if lib is None:
        if from_mont:
            xs = [spec.from_mont_limbs(l) for l in limbs]
        else:
            xs = [limbs_to_int(l) % spec.p for l in limbs]
        return ints_to_words(xs)
    out = np.empty((n, 4), dtype=np.uint64)
    ctx = _ctx(spec.p, spec.nlimbs, True)
    lib.ls_decode(
        ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        limbs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n, int(from_mont),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def encode_ints(spec: FieldSpec, xs, to_mont: bool = True) -> np.ndarray:
    return encode_words(spec, ints_to_words([x % spec.p for x in xs]),
                        to_mont)


def decode_to_ints(spec: FieldSpec, limbs, from_mont: bool = True):
    return words_to_ints(decode_limbs(spec, np.asarray(limbs), from_mont))
