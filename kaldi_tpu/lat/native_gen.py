"""ctypes bindings for the native lattice extractor (native/lattice_gen.cc).

(ref: decoder/lattice-faster-decoder.cc:109 GetRawLattice is C++ in the
 reference; this is the matching native runtime component. The numpy
 implementation in lat/generate.py is the semantic reference and the
 fallback when the toolchain is unavailable.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "lattice_gen.cc")
_SO = os.path.join(os.path.dirname(_SRC), "libkaldi_tpu_latgen.so")

_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_SO)
                or (os.path.exists(_SRC)
                    and os.path.getmtime(_SRC) > os.path.getmtime(_SO))):
            if not os.path.exists(_SRC):
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.latgen_extract.restype = ctypes.c_void_p
        lib.latgen_extract.argtypes = (
            [_i32p, _i32p, _i32p, _f32p, _i32p, _i32p,      # emitting CSR
             _i32p, _i32p, _f32p, _i32p,                    # eps CSR
             _f32p, ctypes.c_int32, ctypes.c_int32,         # final, S, start
             _i32p, _f32p, _i32p, _f32p,                    # records
             ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
             ctypes.c_int32,                                # R0, R, Tb, K
             _f32p, ctypes.c_int32, ctypes.c_float])        # ll, P, beam
        lib.latgen_num_arcs.restype = ctypes.c_int64
        lib.latgen_num_arcs.argtypes = [ctypes.c_void_p]
        lib.latgen_num_nodes.restype = ctypes.c_int32
        lib.latgen_num_nodes.argtypes = [ctypes.c_void_p]
        lib.latgen_num_finals.restype = ctypes.c_int64
        lib.latgen_num_finals.argtypes = [ctypes.c_void_p]
        lib.latgen_copy.argtypes = [
            ctypes.c_void_p, _i32p, _i32p, _i32p, _f32p, _f32p, _i32p,
            _i32p, _f32p]
        lib.latgen_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _p(arr, ctype):
    return arr.ctypes.data_as(ctype)


def extract_native(csr, raw: dict, b: int, Tb: int, lattice_beam: float):
    """-> (n_nodes, src, il, ol, gc, ac, dst, final_nodes, final_costs)
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    c = csr
    e = {name: np.ascontiguousarray(getattr(c, name))
         for name in ("estart", "e_tid", "e_ol", "e_cost", "e_nxt",
                      "e_pdf", "zstart", "z_ol", "z_cost", "z_nxt",
                      "final")}
    init_st = np.ascontiguousarray(raw["init_states"][b], np.int32)
    init_sc = np.ascontiguousarray(raw["init_scores"][b], np.float32)
    st = np.ascontiguousarray(raw["states"][b], np.int32)     # [T, R, K]
    sc = np.ascontiguousarray(raw["scores"][b], np.float32)
    ll = np.ascontiguousarray(raw["ll_scaled"][b], np.float32)
    R0, K = init_st.shape
    T, R, K2 = st.shape
    assert K == K2 or R0 == 0
    K = K2
    P = ll.shape[1]
    h = lib.latgen_extract(
        _p(e["estart"], _i32p), _p(e["e_tid"], _i32p),
        _p(e["e_ol"], _i32p), _p(e["e_cost"], _f32p),
        _p(e["e_nxt"], _i32p), _p(e["e_pdf"], _i32p),
        _p(e["zstart"], _i32p), _p(e["z_ol"], _i32p),
        _p(e["z_cost"], _f32p), _p(e["z_nxt"], _i32p),
        _p(e["final"], _f32p), np.int32(c.num_states),
        np.int32(c.start),
        _p(init_st, _i32p), _p(init_sc, _f32p),
        _p(st, _i32p), _p(sc, _f32p),
        np.int32(R0), np.int32(R), np.int32(Tb), np.int32(K),
        _p(ll, _f32p), np.int32(P), np.float32(lattice_beam))
    try:
        n_arcs = int(lib.latgen_num_arcs(h))
        n_nodes = int(lib.latgen_num_nodes(h))
        n_fin = int(lib.latgen_num_finals(h))
        src = np.empty(n_arcs, np.int32)
        il = np.empty(n_arcs, np.int32)
        ol = np.empty(n_arcs, np.int32)
        gc = np.empty(n_arcs, np.float32)
        ac = np.empty(n_arcs, np.float32)
        dst = np.empty(n_arcs, np.int32)
        fn = np.empty(n_fin, np.int32)
        fc = np.empty(n_fin, np.float32)
        lib.latgen_copy(h, _p(src, _i32p), _p(il, _i32p), _p(ol, _i32p),
                        _p(gc, _f32p), _p(ac, _f32p), _p(dst, _i32p),
                        _p(fn, _i32p), _p(fc, _f32p))
    finally:
        lib.latgen_free(h)
    return n_nodes, src, il, ol, gc, ac, dst, fn, fc
