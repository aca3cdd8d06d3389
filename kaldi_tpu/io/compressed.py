"""Lossy compressed feature storage (the egs/feature archive format).

(ref: matrix/compressed-matrix.h:45,128-146 CompressedMatrix — global
 header (min, range) + per-column headers quantizing the 0th/25th/75th/
 100th percentiles to uint16, then each element to uint8 in a 3-segment
 piecewise-linear map [0,64]/[64,192]/[192,255] between those percentiles.
 We reproduce that scheme so compressed features round-trip with the same
 accuracy class as the reference; arrays decompress to float32 [T, D]
 ready for jnp.asarray.)
"""

from __future__ import annotations

import numpy as np


class CompressedMatrix:
    """Per-column percentile-quantized uint8 storage of a [T, D] matrix."""

    def __init__(self, global_min: float, global_range: float,
                 col_headers: np.ndarray, data: np.ndarray, shape):
        self.global_min = global_min
        self.global_range = global_range
        self.col_headers = col_headers    # [D, 4] uint16
        self.data = data                  # [D, T] uint8 (column-major)
        self.shape = shape

    @property
    def nbytes(self) -> int:
        return self.col_headers.nbytes + self.data.nbytes + 8

    @staticmethod
    def compress(mat: np.ndarray) -> "CompressedMatrix":
        mat = np.asarray(mat, np.float32)
        T, D = mat.shape
        gmin = float(mat.min()) if mat.size else 0.0
        grange = float(mat.max() - gmin) if mat.size else 1.0
        if grange <= 0:
            grange = 1.0

        def to_u16(v):
            f = (v - gmin) / grange * 65535.0
            return np.clip(f + 0.5, 0, 65535).astype(np.uint16)

        def from_u16(u):
            return gmin + u.astype(np.float64) * grange / 65535.0

        # per-column percentiles (ref: ComputeColHeader — uses sorted
        # quartiles with small safety gaps)
        srt = np.sort(mat, axis=0)
        q0 = srt[0]
        q25 = srt[max(0, T // 4 - 1)] if T > 1 else srt[0]
        q75 = srt[min(T - 1, (3 * T) // 4)] if T > 1 else srt[0]
        q100 = srt[-1]
        h = np.stack([to_u16(q0), to_u16(q25), to_u16(q75), to_u16(q100)],
                     axis=1)  # [D, 4]
        # enforce strictly increasing headers (avoid zero ranges)
        for k in range(1, 4):
            h[:, k] = np.maximum(h[:, k], h[:, k - 1] + 1)
        h = np.minimum(h, 65535 - (3 - np.arange(4))[None, :]).astype(np.uint16)
        p0, p25, p75, p100 = (from_u16(h[:, k]) for k in range(4))

        x = mat.T.astype(np.float64)  # [D, T]
        u8 = np.empty((D, T), np.uint8)
        lo = x <= p25[:, None]
        hi = x >= p75[:, None]
        mid = ~lo & ~hi
        with np.errstate(divide="ignore", invalid="ignore"):
            flo = (x - p0[:, None]) / (p25 - p0)[:, None] * 64.0
            fmid = 64.0 + (x - p25[:, None]) / (p75 - p25)[:, None] * 128.0
            fhi = 192.0 + (x - p75[:, None]) / (p100 - p75)[:, None] * 63.0
        f = np.where(lo, flo, np.where(mid, fmid, fhi))
        u8 = np.clip(np.nan_to_num(f) + 0.5, 0, 255).astype(np.uint8)
        return CompressedMatrix(gmin, grange, h, u8, (T, D))

    def decompress(self) -> np.ndarray:
        T, D = self.shape
        gmin, grange = self.global_min, self.global_range

        def from_u16(u):
            return gmin + u.astype(np.float64) * grange / 65535.0

        p0, p25, p75, p100 = (from_u16(self.col_headers[:, k])
                              for k in range(4))
        u = self.data.astype(np.float64)  # [D, T]
        lo = u <= 64
        hi = u >= 192
        mid = ~lo & ~hi
        x = np.where(
            lo, p0[:, None] + (p25 - p0)[:, None] * (u / 64.0),
            np.where(
                mid,
                p25[:, None] + (p75 - p25)[:, None] * ((u - 64.0) / 128.0),
                p75[:, None] + (p100 - p75)[:, None] * ((u - 192.0) / 63.0)))
        return x.T.astype(np.float32)
