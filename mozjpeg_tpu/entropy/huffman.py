"""Huffman table construction (host side).

- `gen_optimal_table`: JPEG Annex K.2 optimal code-length assignment with the
  reference's exact tie-breaking (larger symbol wins ties; pseudo-symbol 256
  reserves the all-ones code) — semantics of jpeg_gen_optimal_table
  (/root/reference/jchuff.c:947-1106), reimplemented.
- `derive_codes`: canonical code assignment (jpeg_make_c_derived_tbl
  /root/reference/jchuff.c:231-318) -> (ehufco[256] uint32, ehufsi[256] uint8).
- `derive_decode_table`: mincode/maxcode/valptr arrays for decoding.
"""
from __future__ import annotations

import numpy as np

MAX_CLEN = 32


class HuffTable:
    """bits[17] (index 1..16 used) + vals[] symbol list, like JHUFF_TBL."""

    __slots__ = ("bits", "vals")

    def __init__(self, bits, vals):
        self.bits = np.asarray(bits, dtype=np.uint8)
        self.vals = np.asarray(vals, dtype=np.uint8)

    def __eq__(self, other):
        return (isinstance(other, HuffTable)
                and np.array_equal(self.bits, other.bits)
                and np.array_equal(self.vals, other.vals))


def gen_optimal_table(freq: np.ndarray) -> HuffTable:
    """freq: int64[257] symbol counts (entry 256 is forced to 1)."""
    freq = freq.astype(np.int64).copy()
    assert freq.shape == (257,)
    freq[256] = 1

    nz_index = np.nonzero(freq)[0]
    f = freq[nz_index].copy()
    n = len(nz_index)
    codesize = np.zeros(n, dtype=np.int32)
    others = np.full(n, -1, dtype=np.int32)

    BIG = 1_000_000_000
    while True:
        # two smallest, ties -> larger index (scan ascending with <=)
        c1 = c2 = -1
        v = v2 = BIG
        for i in range(n):
            fi = f[i]
            if fi <= v2:
                if fi <= v:
                    c2, v2 = c1, v
                    c1, v = i, fi
                else:
                    c2, v2 = i, fi
        if c2 < 0:
            break
        f[c1] += f[c2]
        f[c2] = BIG + 1
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1

    bits = np.zeros(MAX_CLEN + 1, dtype=np.int32)
    for i in range(n):
        if codesize[i] > MAX_CLEN:
            raise ValueError("Huffman code length overflow")
        bits[codesize[i]] += 1

    bit_pos = np.zeros(MAX_CLEN + 1, dtype=np.int32)
    p = 0
    for i in range(1, MAX_CLEN + 1):
        bit_pos[i] = p
        p += bits[i]

    # limit code lengths to 16 bits (Annex K.2 adjustment)
    for i in range(MAX_CLEN, 16, -1):
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1

    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the pseudo-symbol 256

    out_bits = np.zeros(17, dtype=np.uint8)
    out_bits[1:17] = bits[1:17]

    # symbols sorted by original codesize; bit_pos gives stable placement
    total = int(out_bits.sum())
    vals = np.zeros(total, dtype=np.uint8)
    for i in range(n - 1):  # skip pseudo-symbol (it is last, largest length)
        vals[bit_pos[codesize[i]]] = nz_index[i]
        bit_pos[codesize[i]] += 1
    return HuffTable(out_bits, vals)


def derive_codes(tbl: HuffTable):
    """-> (ehufco uint32[256], ehufsi uint8[256]); canonical JPEG codes."""
    ehufco = np.zeros(256, dtype=np.uint32)
    ehufsi = np.zeros(256, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(int(tbl.bits[length])):
            sym = int(tbl.vals[k])
            if ehufsi[sym]:
                raise ValueError("duplicate Huffman symbol %d" % sym)
            ehufco[sym] = code
            ehufsi[sym] = length
            code += 1
            k += 1
        code <<= 1
    return ehufco, ehufsi


def derive_decode_table(tbl: HuffTable):
    """-> (mincode int32[17], maxcode int32[18], valptr int32[17], vals).

    maxcode[l] = largest code of length l (-1 if none); spec F.2.2.3 decode.
    """
    mincode = np.zeros(17, dtype=np.int32)
    maxcode = np.full(18, -1, dtype=np.int64)
    valptr = np.zeros(17, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        nb = int(tbl.bits[length])
        valptr[length] = k
        mincode[length] = code
        if nb:
            code += nb
            k += nb
            maxcode[length] = code - 1
        else:
            maxcode[length] = -1
        code <<= 1
    maxcode[17] = 0xFFFFF
    return mincode, maxcode.astype(np.int64), valptr, tbl.vals


def table_cost_lut(tbl: HuffTable) -> np.ndarray:
    """uint8[256] code sizes (0 = absent) — rate table for trellis/scan-opt."""
    _, ehufsi = derive_codes(tbl)
    return ehufsi
