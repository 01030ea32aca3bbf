"""Base32 geohash encoding (public-domain algorithm, Niemeyer 2008).

Complements the flat reference grid (``/root/reference/src/common/cell.go:5-13``)
and the quadtree ids in :mod:`.hiercell` with the interoperable string cell
key: bit i of the geohash stream halves the longitude (even i) or latitude
(odd i) interval, 5 bits per base32 character. The prefix property — the
first k characters ARE the precision-k geohash — makes it a drop-in
hierarchical bucketing key for groupbys.

Implementation notes:

- For ODD precision (the default 7 ≈ 150 m cells) the whole stream is one
  Morton interleave: ``V = morton(lx, ly)`` with ``lx`` on
  ``ceil(5P/2)`` bits and ``ly`` on ``floor(5P/2)`` bits (hiercell's
  bit-spreading kernels, vectorized end to end; characters come out of a
  single uint8 gather + a zero-copy ``S{P}`` view). Even precisions would
  swap the operand order; we only expose odd.
- :func:`geohash_sql` generates the DuckDB expression from the SAME bit
  layout (integer shifts + substr into the alphabet), so every precision
  has an exact SQL oracle by construction.
"""

from __future__ import annotations

import numpy as np

from .hiercell import _part1by1

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_BYTES = np.frombuffer(ALPHABET.encode("ascii"), dtype=np.uint8)


def _check_precision(precision: int) -> tuple[int, int]:
    if not (1 <= precision <= 12) or precision % 2 == 0:
        raise ValueError("precision must be odd, in [1, 12]")
    nbits = 5 * precision
    return (nbits + 1) // 2, nbits // 2  # lon_bits, lat_bits


def geohash_encode(
    lon: np.ndarray, lat: np.ndarray, precision: int = 7
) -> np.ndarray:
    """Vectorized geohash strings for point arrays (odd precision)."""
    lon_bits, lat_bits = _check_precision(precision)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lx = np.minimum(
        np.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)),
        float((1 << lon_bits) - 1),
    ).astype(np.int64)
    ly = np.minimum(
        np.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)),
        float((1 << lat_bits) - 1),
    ).astype(np.int64)
    v = (_part1by1(lx) | (_part1by1(ly) << np.uint64(1))).astype(np.uint64)
    shifts = np.arange(precision - 1, -1, -1, dtype=np.uint64) * np.uint64(5)
    idx = ((v[:, None] >> shifts[None, :]) & np.uint64(31)).astype(np.uint8)
    chars = np.ascontiguousarray(_ALPHA_BYTES[idx])
    return chars.view(f"S{precision}").ravel().astype(str)


def geohash_sql(lon_expr: str, lat_expr: str, precision: int = 7) -> str:
    """DuckDB expression computing the identical geohash string: the same
    float rounding (mirrored op-for-op) and the same bit layout, emitted as
    integer shift arithmetic per character."""
    lon_bits, lat_bits = _check_precision(precision)
    lx = (
        f"LEAST(CAST(FLOOR((({lon_expr}) + CAST(180.0 AS DOUBLE)) / CAST(360.0 AS DOUBLE) "
        f"* CAST({float(1 << lon_bits)!r} AS DOUBLE)) AS BIGINT), {(1 << lon_bits) - 1})"
    )
    ly = (
        f"LEAST(CAST(FLOOR((({lat_expr}) + CAST(90.0 AS DOUBLE)) / CAST(180.0 AS DOUBLE) "
        f"* CAST({float(1 << lat_bits)!r} AS DOUBLE)) AS BIGINT), {(1 << lat_bits) - 1})"
    )
    chars = []
    for k in range(precision):
        terms = []
        for j in range(5):
            i = 5 * k + j  # stream index, 0 = most significant
            w = 1 << (4 - j)
            if i % 2 == 0:
                terms.append(f"((__glx >> {lon_bits - 1 - i // 2}) & 1) * {w}")
            else:
                terms.append(f"((__gly >> {lat_bits - 1 - (i - 1) // 2}) & 1) * {w}")
        chars.append(f"substr('{ALPHABET}', ({' + '.join(terms)}) + 1, 1)")
    concat = " || ".join(chars)
    # inline the two integer helpers via a scalar subquery-free rewrite
    return f"(SELECT {concat} FROM (SELECT {lx} AS __glx, {ly} AS __gly) __gh)"
