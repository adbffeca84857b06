"""ctypes binding to the native C++ streaming engine (libsbtpu_edge.so).

Build: `make -C native/sbtpu_edge`. Used by edge/check_runtime.py and the
native conformance tests.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "sbtpu_edge",
                         "libsbtpu_edge.so")


def _load_lib():
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sbtpu_create.restype = ctypes.c_void_p
    lib.sbtpu_create.argtypes = [ctypes.c_char_p]
    lib.sbtpu_destroy.argtypes = [ctypes.c_void_p]
    fp = ctypes.POINTER(ctypes.c_float)
    lib.sbtpu_set_dis_embed.argtypes = [ctypes.c_void_p, fp, ctypes.c_int]
    lib.sbtpu_reset.argtypes = [ctypes.c_void_p]
    lib.sbtpu_step.argtypes = [ctypes.c_void_p, fp, fp]
    for name in ("sbtpu_chunk_size", "sbtpu_pad_size", "sbtpu_back_pad",
                 "sbtpu_num_ch", "sbtpu_num_src"):
        getattr(lib, name).restype = ctypes.c_int
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    return lib


class NativeEngine:
    def __init__(self, model_dir: str):
        self._lib = _load_lib()
        self._h = self._lib.sbtpu_create(str(model_dir).encode())
        if not self._h:
            raise OSError(f"sbtpu_create failed for {model_dir}")
        self.chunk = self._lib.sbtpu_chunk_size(self._h)
        # total streaming context = back_pad (history) + pad (lookahead)
        self.pad = (self._lib.sbtpu_pad_size(self._h)
                    + self._lib.sbtpu_back_pad(self._h))
        self.num_ch = self._lib.sbtpu_num_ch(self._h)
        self.num_src = self._lib.sbtpu_num_src(self._h)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.sbtpu_destroy(self._h)
            self._h = None

    def set_dis_embed(self, one_hot):
        arr = np.ascontiguousarray(one_hot, np.float32)
        self._lib.sbtpu_set_dis_embed(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            arr.size)

    def reset(self):
        self._lib.sbtpu_reset(self._h)

    def step_window(self, window: np.ndarray) -> np.ndarray:
        """One streaming step on a [num_ch, chunk+pad] window."""
        window = np.ascontiguousarray(window, np.float32)
        out = np.empty((self.num_src, self.chunk), np.float32)
        self._lib.sbtpu_step(
            self._h, window.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def step(self, mixture: np.ndarray, buffers=None) -> list:
        """check_runtime-compatible single step on the fixture window
        ([1, num_ch, chunk+pad]); resets state first (fixtures use zero
        state). Returns [filtered_output [1, num_src, chunk]]."""
        self.reset()
        out = self.step_window(np.asarray(mixture)[0])
        return [out[None]]

    def stream(self, x: np.ndarray, dis_embed=None) -> np.ndarray:
        """Whole-signal rolling-window streaming: x [num_ch, N] ->
        [num_src, n_chunks*chunk] (reference causal_infer loop)."""
        if dis_embed is not None:
            self.set_dis_embed(dis_embed)
        self.reset()
        n = x.shape[-1]
        n_chunks = (n - self.pad) // self.chunk
        window = np.zeros((self.num_ch, self.chunk + self.pad), np.float32)
        window[:, -self.pad:] = x[:, :self.pad]
        outs = []
        for t in range(n_chunks):
            window = np.roll(window, -self.chunk, axis=-1)
            start = self.pad + t * self.chunk
            window[:, -self.chunk:] = x[:, start:start + self.chunk]
            outs.append(self.step_window(window))
        return np.concatenate(outs, axis=-1)
