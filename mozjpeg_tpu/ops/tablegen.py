"""Device-side optimal Huffman table generation (JPEG Annex K.2).

Reimplements the reference's jpeg_gen_optimal_table semantics
(/root/reference/jchuff.c:947-1106) — including its exact tie-breaking
(later symbol wins frequency ties), the reserved all-ones code via
pseudo-symbol 256, the 16-bit length limiting, and the value ordering by
(pre-adjustment code size, ascending symbol) — as batched array programs,
so trellis rate tables and per-candidate-scan optimal tables can be built
*inside* one jitted device program instead of round-tripping histograms to
the host (each host sync costs ~50 ms on a remote-attached TPU; the
default mozjpeg profile needs ~70 tables per image).

The linked-list `others` chain walk of the C algorithm (codesize increment
along merge trees) becomes a masked vector add over group-membership: when
the two least-frequent roots merge, every symbol whose group id matches
either root gets codesize += 1 and the groups union.  Identical results,
no pointers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.int32(1 << 30)           # absent/merged sentinel (> any real count)


def _gen_one(freq):
    """freq: (257,) int32 symbol counts with freq[256] already set to 1.
    -> (bits (17,) i32, vals (256,) i32, codesize (257,) i32, ok bool).

    ok is False when fewer than 2 symbols are present (no table — the
    reference's callers never invoke gen_optimal_table on an empty
    histogram) or when a code length exceeds MAX_CLEN=32."""
    idx = jnp.arange(257, dtype=jnp.int32)
    present = freq > 0
    fw = jnp.where(present, freq, BIG)
    group = idx
    codesize = jnp.zeros(257, jnp.int32)

    def cond(carry):
        fw, group, codesize, it = carry
        return (it < 256) & (jnp.sum((fw < BIG).astype(jnp.int32)) >= 2)

    def body(carry):
        fw, group, codesize, it = carry
        v1 = jnp.min(fw)
        # last index with fw == v1 (the reference's ascending <= scan
        # leaves c1 at the LAST minimal entry)
        c1 = jnp.max(jnp.where(fw == v1, idx, -1))
        fw2 = jnp.where(idx == c1, BIG, fw)
        v2 = jnp.min(fw2)
        c2 = jnp.max(jnp.where(fw2 == v2, idx, -1))
        g1 = group[c1]
        g2 = group[c2]
        member = (group == g1) | (group == g2)
        codesize = codesize + member.astype(jnp.int32)
        fw = fw.at[c1].set(v1 + v2)
        fw = fw.at[c2].set(BIG)
        group = jnp.where(group == g2, g1, group)
        return fw, group, codesize, it + 1

    fw, group, codesize, _ = jax.lax.while_loop(
        cond, body, (fw, group, codesize, jnp.int32(0)))

    n = jnp.sum(present.astype(jnp.int32))
    ok = (n >= 2) & jnp.all(jnp.where(present, codesize, 0) <= 32)

    # bits histogram over present symbols (lengths 1..32)
    bits33 = jnp.zeros(33, jnp.int32).at[
        jnp.where(present, jnp.clip(codesize, 0, 32), 0)
    ].add(present.astype(jnp.int32))
    bits33 = bits33.at[0].set(0)

    # value ordering: stable bucket sort by PRE-adjustment code size in
    # ascending-symbol order, pseudo-symbol 256's slot left unwritten
    # (jchuff.c:1080-1091: bit_pos computed before the length limiting)
    key = jnp.where(present, codesize * 512 + idx, jnp.int32(1 << 24))
    order = jnp.argsort(key)                       # (257,) symbol indices
    ranked = order[:256]
    vals = jnp.where(ranked == 256, 0, ranked)     # hole where 256 lands

    # length limiting (Annex K.3 / jchuff.c:1053-1069)
    def outer(k, bits):
        i = 32 - k                                 # 32 down to 17

        def inner(_, bits):
            do = bits[i] > 0
            lvl = jnp.arange(33, dtype=jnp.int32)
            j = jnp.max(jnp.where((lvl <= i - 2) & (bits > 0), lvl, -1))
            j = jnp.maximum(j, 0)                  # unreachable when do
            upd = (jnp.zeros(33, jnp.int32)
                   .at[i].add(-2).at[i - 1].add(1)
                   .at[j + 1].add(2).at[j].add(-1))
            return jnp.where(do, bits + upd, bits)

        return jax.lax.fori_loop(0, 129, inner, bits)

    bits33 = jax.lax.fori_loop(0, 16, outer, bits33)
    # remove the count for the pseudo-symbol: largest l <= 16 with bits > 0
    lvl = jnp.arange(33, dtype=jnp.int32)
    last = jnp.max(jnp.where((lvl <= 16) & (bits33 > 0), lvl, 0))
    bits33 = bits33.at[last].add(jnp.where(ok, -1, 0))
    return bits33[:17], vals, codesize, ok


@jax.jit
def gen_optimal_tables_t(freqs):
    """freqs: (T, 257) int32 (freq[:, 256] need not be set; forced to 1).
    -> (bits (T, 17) i32, vals (T, 256) i32, ok (T,) bool)."""
    freqs = freqs.astype(jnp.int32).at[:, 256].set(1)
    bits, vals, _, ok = jax.vmap(_gen_one)(freqs)
    return bits, vals, ok


def derive_codes_t(bits, vals):
    """Canonical code assignment (jpeg_make_c_derived_tbl semantics).
    bits (T, 17) i32, vals (T, 256) i32 ->
    (ehufco (T, 256) uint32, ehufsi (T, 256) i32), both indexed by symbol."""
    T = bits.shape[0]
    nb = bits[:, 1:17]                              # (T, 16) lengths 1..16
    cs = jnp.cumsum(nb, axis=1)                     # count with len <= l
    start = cs - nb                                 # first rank of length l
    p = jnp.arange(256, dtype=jnp.int32)[None, :]
    # length of the value at rank p: smallest l with cs[l] > p
    len_p = jnp.sum((p[:, None, :] >= cs[:, :, None]).astype(jnp.int32),
                    axis=1) + 1                     # (T, 256)
    # base code per length: code = (base[l-1] + bits[l-1]) << 1
    def step(carry, nbl):
        base = carry
        return (base + nbl) << 1, base
    _, bases = jax.lax.scan(step, jnp.zeros(T, jnp.int32),
                            jnp.swapaxes(nb, 0, 1))
    bases = jnp.swapaxes(bases, 0, 1)               # (T, 16) base per length
    code_p = jnp.take_along_axis(bases, jnp.clip(len_p - 1, 0, 15), axis=1) \
        + (p - jnp.take_along_axis(start, jnp.clip(len_p - 1, 0, 15),
                                   axis=1))
    nsym = cs[:, -1]                                # total values
    valid = p < nsym[:, None]
    sym = jnp.clip(vals, 0, 255)
    rows = jnp.broadcast_to(jnp.arange(T)[:, None], (T, 256))
    ehufco = jnp.zeros((T, 256), jnp.uint32).at[
        rows.reshape(-1), sym.reshape(-1)
    ].add(jnp.where(valid, code_p, 0).astype(jnp.uint32).reshape(-1))
    ehufsi = jnp.zeros((T, 256), jnp.int32).at[
        rows.reshape(-1), sym.reshape(-1)
    ].add(jnp.where(valid, len_p, 0).reshape(-1))
    return ehufco, ehufsi


TRELLIS_PRIME = None


def _trellis_prime():
    """+1 priming of every (run, size<12) symbol incl. size 0 — the rate
    smoothing the trellis stats pass applies before table generation
    (codec/trellis.py trellis_tables_from_hist)."""
    global TRELLIS_PRIME
    if TRELLIS_PRIME is None:
        p = np.zeros(257, np.int32)
        for run in range(16):
            for size in range(12):
                p[16 * run + size] += 1
        TRELLIS_PRIME = p
    return TRELLIS_PRIME


@jax.jit
def trellis_rate_tables_t(achists):
    """achists (T, 256) i32 AC-first histograms -> ehufsi (T, 256) i32 code
    sizes for the trellis DP (device analog of trellis_tables_from_hist
    with optimize_coding=True)."""
    T = achists.shape[0]
    # fresh numpy per trace -> inline literal, never a captured device
    # constant (see codec/trellis.py _ltbl_lookup)
    prime = jnp.asarray(_trellis_prime().copy())
    f = jnp.zeros((T, 257), jnp.int32)
    f = f.at[:, :256].set(achists.astype(jnp.int32))
    f = f + prime[None, :]
    bits, vals, _ = gen_optimal_tables_t(f)
    _, ehufsi = derive_codes_t(bits, vals)
    return ehufsi
