'''
ctypes loader for the native SEG-Y codec (native/segy_codec.cpp).

Compiles the shared library on first use (g++ -O3) and caches it next to
the source; falls back cleanly when no compiler is available. The numpy
implementations in ``zephyr_tpu.middleware.segy`` remain the reference
behaviour; the native path accelerates bulk trace decode (the data-loading
hot loop for production-size surveys).
'''

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native',
    'segy_codec.cpp')
_LIB = None
_TRIED = False


def _build(src, out):
    cmd = ['g++', '-O3', '-shared', '-fPIC', src, '-o', out]
    subprocess.run(cmd, check=True, capture_output=True)


def load():
    'Load (building if needed) the native codec; None if unavailable.'

    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True

    if not os.path.exists(_SRC):
        return None
    out = os.path.join(os.path.dirname(_SRC), 'libsegy_codec.so')
    try:
        if not os.path.exists(out) or \
                os.path.getmtime(out) < os.path.getmtime(_SRC):
            _build(_SRC, out)
        lib = ctypes.CDLL(out)
    except Exception:
        return None

    lib.ibm_to_f64.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int]
    lib.f64_to_ibm.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_int64, ctypes.c_int]
    lib.decode_traces.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_double)]
    lib.decode_traces.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def decode_traces(payload, ntr, ns, fmt, big_endian):
    '''
    Decode the full trace block of a SEG-Y payload (bytes starting at the
    first trace header) into an (ntr, ns) float64 array using the native
    codec. Returns None if the native library is unavailable.
    '''

    lib = load()
    if lib is None:
        return None
    buf = np.frombuffer(payload, dtype=np.uint8)
    out = np.empty((ntr, ns), dtype=np.float64)
    rc = lib.decode_traces(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(ntr), ctypes.c_int64(ns),
        ctypes.c_int(fmt), ctypes.c_int(1 if big_endian else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc != 0:
        return None
    return out
