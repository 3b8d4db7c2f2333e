"""Rank-and-Select Quotient Filter — vectorized numpy kernel.

Semantics ported from the reference (/root/reference/src/rsqf.cpp,
src/abstract_bqf.cpp; structure described in SURVEY.md §1.1): a 64-bit-word
quotient filter where an element's ``hash_bits``-bit hash splits into a
``q``-bit quotient (low bits, /root/reference/src/rsqf.cpp:442-444) and an
``r = hash_bits − q``-bit remainder (high bits, :446-448); elements of the
same quotient form a run of slots holding remainders in ascending order
(invariant /root/reference/src/headers/rsqf.hpp:67-69); ``occupieds`` and
``runends`` bitvectors + rank/select give run boundaries; a per-slot
``count_size``-bit "backpack" counter extends it to the BQF
(/root/reference/src/abstract_bqf.cpp:112).  Because the full hash is
stored and the token hash can be an invertible bijection, enumeration is
lossless and s-mer-level queries have no false positives beyond hash
collisions (README.md:54 analog: FP ≤ 2^-r when hash_bits models an
infinite hash).

Engine-specific design (Ray-Data-first, NOT a translation — deviations are
deliberate and observable-behavior-preserving):

- **Bulk vectorized construction** replaces per-element shift insertion
  (reference C1/C2/C17/C18).  Because counter updates commute
  (/root/reference/src/bqf_ec.cpp:120-133), the final filter state is
  insert-order-independent; we exploit that by buffering updates and
  rebuilding the slot layout with O(n) vectorized scans (cumsum +
  running-max placement) instead of porting ~520 LoC of circular bit-shift
  machinery.  Property tests (tests/test_bqf.py) verify dict-oracle
  equality exactly as the reference's unit tests do
  (/root/reference/unitary_tests/cqf_test.cpp:336-437).
- **Non-circular layout with overflow slack**: the reference's array is
  toroidal (runs wrap past slot 2^q−1 to 0, /root/reference/src/rsqf.cpp:
  609-612).  We allocate `2^q + slack` physical slots so runs spill right
  instead of wrapping; rank/select then index globally, which keeps every
  batch operation a flat vectorized scan.  Slot occupancy and run contents
  are identical up to that rotation.
- **In-memory slots are one uint64 each** (vectorized access); the
  *serialized* form bit-packs slots to ``r + count_size`` bits (that is
  what travels through the object store / checkpoints, preserving the
  ~(r+c+2.125) bits/element wire size that motivates the structure).
- **Resize** re-derives quotients from stored hashes at q+n — the
  observable contract of the reference's streaming in-place resize
  (/root/reference/src/abstract_bqf.cpp:302-479) at the same O(n) cost,
  vectorized.  Triggered at the same 95% load factor
  (/root/reference/src/rsqf.cpp:19).
"""

from __future__ import annotations

import numpy as np

from bqf_ray.sketches.base import MergeableSketch

U64 = np.uint64
_WORD = 64


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy<2 has no bit_count ufunc)."""
    x = x - ((x >> U64(1)) & U64(0x5555555555555555))
    x = (x & U64(0x3333333333333333)) + ((x >> U64(2)) & U64(0x3333333333333333))
    x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    return (x * U64(0x0101010101010101)) >> U64(56)


def _set_bits(bitvec: np.ndarray, positions: np.ndarray) -> None:
    np.bitwise_or.at(bitvec, positions >> 6, U64(1) << (positions.astype(np.uint64) & U64(63)))


def _test_bits(bitvec: np.ndarray, positions: np.ndarray) -> np.ndarray:
    return (bitvec[positions >> 6] >> (positions.astype(np.uint64) & U64(63))) & U64(1) != 0


def _bit_positions(bitvec: np.ndarray, limit: int) -> np.ndarray:
    """Sorted positions of set bits below ``limit`` (vectorized select table)."""
    bits = np.unpackbits(bitvec.view(np.uint8), bitorder="little")
    return np.flatnonzero(bits[:limit]).astype(np.int64)


def pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """Bit-pack uint64 values to ``width`` bits each → uint64 word array."""
    n = len(values)
    total_bits = n * width
    words = np.zeros((total_bits + 63) // 64 + 1, dtype=np.uint64)
    if n == 0:
        return words[:0]
    v = values.astype(np.uint64) & ((U64(1) << U64(width)) - U64(1) if width < 64 else U64(0xFFFFFFFFFFFFFFFF))
    off = np.arange(n, dtype=np.int64) * width
    widx = off >> 6
    shift = (off & 63).astype(np.uint64)
    np.bitwise_or.at(words, widx, v << shift)
    spill = shift != 0
    hi = np.zeros(n, dtype=np.uint64)
    hi[spill] = v[spill] >> (U64(64) - shift[spill])
    np.bitwise_or.at(words, widx + 1, hi)
    return words[: (total_bits + 63) // 64]


def unpack_bits(words: np.ndarray, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    w = np.concatenate([words.astype(np.uint64), np.zeros(1, dtype=np.uint64)])
    off = np.arange(n, dtype=np.int64) * width
    widx = off >> 6
    shift = (off & 63).astype(np.uint64)
    lo = w[widx] >> shift
    hi = np.zeros(n, dtype=np.uint64)
    spill = shift != 0
    hi[spill] = w[widx[spill] + 1] << (U64(64) - shift[spill])
    mask = (U64(1) << U64(width)) - U64(1) if width < 64 else U64(0xFFFFFFFFFFFFFFFF)
    return (lo | hi) & mask


class _QuotientFilterKernel(MergeableSketch):
    """Shared kernel for Rsqf (c=0) and the counting BQF variants.

    Counting semantics are pluggable via three hooks mirroring the
    reference's pure-virtual surface
    (/root/reference/src/headers/abstract_bqf.hpp:154-170):
    ``_insert_process_count`` (stream count → stored count),
    ``_combine_counts`` (merge stored counts for the same key — the
    order-invariant generalization of ``add_to_counter``), and
    ``_query_process_count`` (stored count → reported count).
    """

    config_fields = ("hash_bits", "count_size")
    MAX_LOAD = 0.95          # /root/reference/src/rsqf.cpp:19
    _SLACK = 256

    def __init__(self, q: int = 10, hash_bits: int = 64, count_size: int = 0,
                 auto_resize: bool = True):
        assert 1 <= q < hash_bits <= 64
        # one-uint64-per-slot layout: remainder + counter must fit a word.
        # (q only grows capacity, so raising it is semantically safe.)
        min_q = hash_bits + count_size - 64
        if q < min_q:
            if not auto_resize:
                raise ValueError(
                    f"slot width {hash_bits - q + count_size} > 64 bits: "
                    f"need q >= {min_q} for hash_bits={hash_bits}, "
                    f"count_size={count_size}")
            q = min_q
        self.q = int(q)
        self.hash_bits = int(hash_bits)
        self.count_size = int(count_size)
        self.auto_resize = auto_resize
        self.elements_inside = 0
        self._pend_keys: list[np.ndarray] = []
        self._pend_counts: list[np.ndarray] = []
        self._pend_n = 0
        self._neg_keys: list[np.ndarray] = []          # pending removals
        self._neg_counts: list[np.ndarray] = []
        self._alloc_empty()

    # --- codec hooks (overridden by subclasses; reference hook surface
    #     /root/reference/src/headers/abstract_bqf.hpp:154-170) -------------
    #
    # stored-domain = what sits in the slot's low count_size bits;
    # raw-domain   = stream occurrence counts.
    # _combine = "sum": per-key raw totals add (saturating encode) — ec, cf.
    # _combine = "max": per-key stored values max-combine — oom (the
    #   order-invariant replacement for the reference's first-wins no-op
    #   add, /root/reference/src/bqf_oom.cpp:112-114).

    _combine = "sum"

    def _to_raw(self, stored: np.ndarray) -> np.ndarray:
        """stored slot count → raw-equivalent count (ec: identity)."""
        return stored.astype(np.int64)

    def _from_raw(self, raw: np.ndarray) -> np.ndarray:
        """raw count → stored slot count (ec: saturate at 2^c−1,
        /root/reference/src/bqf_ec.cpp:148-150)."""
        return np.minimum(raw, np.int64(self._count_cap())).astype(np.uint64)

    def _report(self, stored: np.ndarray, found: np.ndarray) -> np.ndarray:
        """(stored slot count, presence mask) → reported count (ec: identity
        for present keys, /root/reference/src/bqf_ec.cpp:152-154).  Presence
        is passed separately because some codecs legitimately store 0 for
        present keys (oom exponent 0, cf seen-once bit)."""
        if self.count_size == 0:
            return found.astype(np.uint64)
        return np.where(found, stored, U64(0))

    def _count_cap(self) -> np.uint64:
        c = self.count_size
        return U64((1 << c) - 1) if c else U64(1)

    # --- geometry ----------------------------------------------------------

    @property
    def remainder_bits(self) -> int:
        return self.hash_bits - self.q

    @property
    def slot_width(self) -> int:
        return self.remainder_bits + self.count_size

    @property
    def size_limit(self) -> int:
        return int((1 << self.q) * self.MAX_LOAD)

    def _alloc_empty(self) -> None:
        nq = 1 << self.q
        cap = nq + self._SLACK
        self._slots = np.zeros(cap, dtype=np.uint64)
        self._occupieds = np.zeros((nq + 63) // 64, dtype=np.uint64)
        self._runends = np.zeros((cap + 63) // 64, dtype=np.uint64)
        self._extent = 0                     # slots in use are < _extent
        self._built_q = self.q               # q the current layout was built at
        self._occ_quots = np.empty(0, dtype=np.int64)     # select cache
        self._runend_pos = np.empty(0, dtype=np.int64)    # select cache
        self._occ_prefix = np.zeros(len(self._occupieds), dtype=np.int64)

    @classmethod
    def find_quotient_given_memory(cls, max_bytes: int, hash_bits: int = 64,
                                   count_size: int = 0) -> int:
        """Sizing helper (semantics of /root/reference/src/rsqf.cpp:153-172):
        largest q whose serialized filter fits the byte budget."""
        for q in range(30, 6, -1):
            bits = (1 << q) * (hash_bits - q + count_size + 2) + (1 << q)
            if bits // 8 <= max_bytes:
                return q
        return 7

    # --- updates -----------------------------------------------------------

    def insert(self, key: int, count: int = 1) -> None:
        self.update_batch(np.array([key], dtype=np.uint64),
                          np.array([count], dtype=np.uint64))

    def update_batch(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        if self.hash_bits < 64:
            keys = keys & ((U64(1) << U64(self.hash_bits)) - U64(1))
        if counts is None:
            counts = np.ones(len(keys), dtype=np.uint64)
        else:
            counts = np.asarray(counts, dtype=np.uint64)
        self._pend_keys.append(keys)
        self._pend_counts.append(counts)
        self._pend_n += len(keys)
        # amortized compaction: rebuild when pending rivals filter size
        if self._pend_n >= max(4096, self.elements_inside):
            self._compact()

    def remove(self, key: int, count: int = 1) -> None:
        """Decrement-or-delete (semantics of /root/reference/src/rsqf.cpp:
        294-377 and src/bqf_ec.cpp:26-115): removing ≥ stored count deletes
        the slot."""
        self.remove_batch(np.array([key], dtype=np.uint64),
                          np.array([count], dtype=np.uint64))

    def remove_batch(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        keys = np.asarray(keys, dtype=np.uint64)
        if len(keys) == 0:
            return
        if self.hash_bits < 64:
            keys = keys & ((U64(1) << U64(self.hash_bits)) - U64(1))
        if counts is None:
            counts = np.ones(len(keys), dtype=np.uint64)
        self._neg_keys.append(keys)
        self._neg_counts.append(np.asarray(counts, dtype=np.uint64))

    # --- compaction (bulk build) -------------------------------------------

    def _dirty(self) -> bool:
        return bool(self._pend_keys or self._neg_keys)

    def _compact(self) -> None:
        if not self._dirty():
            return
        keys0, stored0 = self._enumerate_built()
        pend_k, pend_c = self._pend_keys, self._pend_counts
        neg_k, neg_c = self._neg_keys, self._neg_counts
        self._pend_keys, self._pend_counts, self._pend_n = [], [], 0
        self._neg_keys, self._neg_counts = [], []

        if self._combine == "sum":
            parts_k = [keys0] + pend_k + neg_k
            parts_c = ([self._to_raw(stored0)] +
                       [c.astype(np.int64) for c in pend_c] +
                       [-c.astype(np.int64) for c in neg_c])
            keys = np.concatenate(parts_k)
            deltas = np.concatenate(parts_c)
            if len(keys) == 0:
                self._alloc_empty()
                self.elements_inside = 0
                return
            uniq, inv = np.unique(keys, return_inverse=True)
            raw = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(raw, inv, deltas)
            alive = raw > 0
            uniq, raw = uniq[alive], raw[alive]
            stored = self._from_raw(raw)
        else:  # "max" combine (oom)
            ins_k = np.concatenate([keys0] + pend_k) if (len(keys0) or pend_k) \
                else np.empty(0, dtype=np.uint64)
            ins_s = np.concatenate(
                [stored0.astype(np.int64)] +
                [self._from_raw(c.astype(np.int64)).astype(np.int64) for c in pend_c]) \
                if (len(keys0) or pend_c) else np.empty(0, dtype=np.int64)
            if len(ins_k) == 0 and not neg_k:
                self._alloc_empty()
                self.elements_inside = 0
                return
            uniq, inv = np.unique(ins_k, return_inverse=True)
            smax = np.full(len(uniq), -1, dtype=np.int64)
            np.maximum.at(smax, inv, ins_s)
            if neg_k:
                decoded = self._to_raw(smax.astype(np.uint64))
                nk = np.concatenate(neg_k)
                nc = np.concatenate([c.astype(np.int64) for c in neg_c])
                pos = np.searchsorted(uniq, nk)
                hit = (pos < len(uniq))
                pos_c = np.minimum(pos, len(uniq) - 1)
                hit &= uniq[pos_c] == nk
                np.subtract.at(decoded, pos_c[hit], nc[hit])
                alive = decoded > 0
                uniq = uniq[alive]
                stored = self._from_raw(decoded[alive])
            else:
                alive = smax >= 0
                uniq, stored = uniq[alive], smax[alive].astype(np.uint64)
        # grow q until under load cap (reference resize(1) loop,
        # /root/reference/src/abstract_bqf.cpp:102-107)
        while self.auto_resize and len(uniq) > int((1 << self.q) * self.MAX_LOAD) \
                and self.q + 1 < self.hash_bits:
            self.q += 1
        self._build(uniq, stored)

    def _build(self, ukeys: np.ndarray, counts: np.ndarray) -> None:
        """Vectorized layout construction from unique keys (any order)."""
        q = self.q
        nq = 1 << q
        n = len(ukeys)
        self.elements_inside = n
        if n == 0:
            self._alloc_empty()
            return
        quot = (ukeys & U64(nq - 1)).astype(np.int64)
        rem = (ukeys >> U64(q)).astype(np.uint64)
        order = np.lexsort((rem, quot))
        quot, rem, counts = quot[order], rem[order], counts.astype(np.uint64)[order]
        uq, run_idx, run_counts = np.unique(quot, return_index=True, return_counts=True)
        D = np.cumsum(run_counts)
        prev_d = np.concatenate([[0], D[:-1]])
        g = np.maximum.accumulate(uq - 1 - prev_d)
        ends = g + D
        starts = ends - run_counts + 1
        pos = np.repeat(starts, run_counts) + (np.arange(n) - np.repeat(prev_d, run_counts))
        self._built_q = q
        extent = int(ends[-1]) + 1
        cap = max(nq + self._SLACK, extent + 64)
        self._slots = np.zeros(cap, dtype=np.uint64)
        c = U64(self.count_size)
        self._slots[pos] = (rem << c) | counts if self.count_size else rem
        self._occupieds = np.zeros((nq + 63) // 64, dtype=np.uint64)
        _set_bits(self._occupieds, uq)
        self._runends = np.zeros((cap + 63) // 64, dtype=np.uint64)
        _set_bits(self._runends, ends)
        self._extent = extent
        # rank/select caches
        self._occ_quots = uq
        self._runend_pos = ends
        pc = _popcount64(self._occupieds).astype(np.int64)
        self._occ_prefix = np.concatenate([[0], np.cumsum(pc)[:-1]])

    def resize(self, n: int = 1, chunk_runs: int = 1 << 14) -> None:
        """Grow quotient by ``n`` bits — STREAMING (contract of
        /root/reference/src/rsqf.cpp:418-437 / abstract_bqf.cpp:302-479,
        memory profile included).

        Key identity: splitting ``key = rem·2^q + quot`` at ``q+n``
        gives ``quot' = (rem mod 2^n)·2^q + quot`` and
        ``rem' = rem >> n`` — so the new layout is exactly the old
        elements filtered by ``rem mod 2^n = j`` for j = 0..2^n−1, in
        old run order, concatenated in j order.  The resize therefore
        streams the old runs ``2^n`` times in ``chunk_runs``-run
        chunks, emitting elements in final sorted order and growing
        the new layout incrementally (greedy run placement with a
        carried fill position, split-run continuation handled by
        re-opening the previous run).

        Allocations: the new layout arrays once (O(2^q_new) words +
        element-bounded select caches) and O(chunk) scratch — NOT the
        old path's full enumerate (16 B/elem) + lexsort (~40 B/elem)
        scratch, which is what let an actor near its memory ceiling
        grow the way the reference's in-place pass does (tested with a
        tracemalloc peak assertion)."""
        self._compact()
        assert self.q + n < self.hash_bits
        old_q = self._built_q
        q2 = self.q + n
        if self.elements_inside == 0:
            self.q = q2
            self._alloc_empty()
            return
        c = U64(self.count_size)
        cmask = (U64(1) << c) - U64(1)
        low_mask = U64((1 << n) - 1)
        nq2 = 1 << q2
        cap2 = nq2 + self._SLACK
        slots2 = np.zeros(cap2, dtype=np.uint64)
        occ2 = np.zeros((nq2 + 63) // 64, dtype=np.uint64)
        run2 = np.zeros((cap2 + 63) // 64, dtype=np.uint64)
        uq_buf = np.empty(self.elements_inside, dtype=np.int64)
        end_buf = np.empty(self.elements_inside, dtype=np.int64)
        k = 0
        last_end = np.int64(-1)
        last_quot = np.int64(-2)
        old_uq = self._occ_quots
        old_ends = self._runend_pos
        old_starts = np.maximum(
            old_uq, np.concatenate([[-1], old_ends[:-1]]) + 1)
        old_lens = old_ends - old_starts + 1
        for j in range(1 << n):
            jq = np.int64(j) << np.int64(old_q)
            for r0 in range(0, len(old_uq), int(chunk_runs)):
                sl = slice(r0, r0 + int(chunk_runs))
                st, ln = old_starts[sl], old_lens[sl]
                m = int(ln.sum())
                off = np.concatenate([[0], np.cumsum(ln)[:-1]])
                pos = np.repeat(st, ln) + \
                    (np.arange(m) - np.repeat(off, ln))
                vals = self._slots[pos]
                rem = (vals >> c) if self.count_size else vals
                sel = (rem & low_mask) == U64(j)
                if not sel.any():
                    continue
                quots = np.repeat(old_uq[sl], ln)[sel] + jq
                rems2 = rem[sel] >> U64(n)
                cnts = (vals[sel] & cmask) if self.count_size else None
                uq2, rc2 = np.unique(quots, return_counts=True)
                D = np.cumsum(rc2)
                prev_d = np.concatenate([[0], D[:-1]])
                arr = uq2 - 1 - prev_d
                cont = k > 0 and uq2[0] == last_quot
                arr[0] = max(arr[0], last_end)
                g = np.maximum.accumulate(arr)
                ends2 = g + D
                starts2 = ends2 - rc2 + 1
                if ends2[-1] >= cap2:       # adversarial skew fallback
                    cap2 = int(ends2[-1]) + 64 + self._SLACK
                    grown = np.zeros(cap2, dtype=np.uint64)
                    grown[:len(slots2)] = slots2
                    slots2 = grown
                    grown_r = np.zeros((cap2 + 63) // 64,
                                       dtype=np.uint64)
                    grown_r[:len(run2)] = run2
                    run2 = grown_r
                pos2 = np.repeat(starts2, rc2) + \
                    (np.arange(len(quots)) - np.repeat(prev_d, rc2))
                slots2[pos2] = ((rems2 << c) | cnts) if self.count_size \
                    else rems2
                _set_bits(occ2, uq2)
                if cont:                    # re-open the split run
                    e = int(end_buf[k - 1])
                    run2[e >> 6] &= ~(U64(1) << U64(e & 63))
                    k -= 1
                _set_bits(run2, ends2)
                uq_buf[k:k + len(uq2)] = uq2
                end_buf[k:k + len(uq2)] = ends2
                k += len(uq2)
                last_quot = uq2[-1]
                last_end = ends2[-1]
        self.q = q2
        self._built_q = q2
        self._slots = slots2
        self._occupieds = occ2
        self._runends = run2
        self._extent = int(last_end) + 1
        self._occ_quots = uq_buf[:k].copy()
        self._runend_pos = end_buf[:k].copy()
        pc = _popcount64(occ2).astype(np.int64)
        self._occ_prefix = np.concatenate([[0], np.cumsum(pc)[:-1]])

    # --- queries -----------------------------------------------------------

    def query(self, key: int) -> int:
        return int(self.query_batch(np.array([key], dtype=np.uint64))[0])

    def query_batch(self, keys: np.ndarray) -> np.ndarray:
        """Reported count per key (0 = absent) — vectorized C4/C5."""
        self._compact()
        keys = np.asarray(keys, dtype=np.uint64)
        n = len(keys)
        if n == 0 or self.elements_inside == 0:
            return np.zeros(n, dtype=np.uint64)
        if self.hash_bits < 64:
            keys = keys & ((U64(1) << U64(self.hash_bits)) - U64(1))
        q = self.q
        quot = (keys & U64((1 << q) - 1)).astype(np.int64)
        rem = keys >> U64(q)
        out = np.zeros(n, dtype=np.uint64)
        occ = _test_bits(self._occupieds, quot)
        if not occ.any():
            return out
        qo = quot[occ]
        word = self._occupieds[qo >> 6]
        below = word & ((U64(1) << (qo.astype(np.uint64) & U64(63))) - U64(1))
        rank = self._occ_prefix[qo >> 6] + _popcount64(below).astype(np.int64)  # 0-based
        ends = self._runend_pos[rank]
        prev_end = np.where(rank > 0, self._runend_pos[np.maximum(rank - 1, 0)], -1)
        starts = np.maximum(qo, prev_end + 1)
        stored_o, found_o = self._run_lookup(starts, ends, rem[occ])
        found = np.zeros(n, dtype=bool)
        found[occ] = found_o
        out[occ] = stored_o
        return self._report(out, found)

    def _run_lookup(self, starts, ends, rems) -> tuple[np.ndarray, np.ndarray]:
        """Find each remainder in its (sorted) run → (stored count, found)."""
        m = len(starts)
        res = np.zeros(m, dtype=np.uint64)
        lens = ends - starts + 1
        c = U64(self.count_size)
        cmask = (U64(1) << c) - U64(1)
        maxlen = int(lens.max())
        chunk = maxlen if maxlen <= 64 else 64
        # gather matrix over the first `chunk` slots; rare longer runs loop
        idx = starts[:, None] + np.arange(chunk)
        valid = np.arange(chunk)[None, :] < lens[:, None]
        vals = self._slots[np.minimum(idx, len(self._slots) - 1)]
        srems = (vals >> c) if self.count_size else vals
        hit = valid & (srems == rems[:, None])
        found = hit.any(axis=1)
        first = np.argmax(hit, axis=1)
        if self.count_size:
            res[found] = vals[found, first[found]] & cmask
        long = lens > chunk
        if long.any():
            for i in np.flatnonzero(long & ~found):
                seg = self._slots[starts[i] + chunk: ends[i] + 1]
                sr = (seg >> c) if self.count_size else seg
                j = np.searchsorted(sr, rems[i])
                if j < len(sr) and sr[j] == rems[i]:
                    res[i] = (seg[j] & cmask) if self.count_size else U64(0)
                    found[i] = True
        return res, found

    # --- enumeration (C8) --------------------------------------------------

    def _enumerate_built(self) -> tuple[np.ndarray, np.ndarray]:
        """(keys, stored_counts) of the built (compacted) portion."""
        if self.elements_inside == 0:
            return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64))
        uq = self._occ_quots
        ends = self._runend_pos
        starts = np.maximum(uq, np.concatenate([[-1], ends[:-1]]) + 1)
        lens = ends - starts + 1
        n = int(lens.sum())
        pos = np.repeat(starts, lens) + \
            (np.arange(n) - np.repeat(np.concatenate([[0], np.cumsum(lens)[:-1]]), lens))
        vals = self._slots[pos]
        c = U64(self.count_size)
        if self.count_size:
            rem = vals >> c
            counts = vals & ((U64(1) << c) - U64(1))
        else:
            rem = vals
            counts = np.ones(n, dtype=np.uint64)
        keys = (rem << U64(self._built_q)) | np.repeat(uq, lens).astype(np.uint64)
        return keys, counts

    def enumerate(self) -> tuple[np.ndarray, np.ndarray]:
        """All (key, reported_count) pairs — the lossless enumeration that
        makes the filter mergeable (reference C8)."""
        self._compact()
        keys, stored = self._enumerate_built()
        return keys, self._report(stored, np.ones(len(stored), dtype=bool))

    # --- merge (engine-defined; absent in reference, SURVEY.md §2.4) -------

    def merge(self, other: "_QuotientFilterKernel") -> "_QuotientFilterKernel":
        return self.merge_many([other])

    def merge_many(self, others) -> "_QuotientFilterKernel":
        """Batched merge: buffer every input's enumeration and rebuild the
        layout ONCE (pairwise merging would rebuild per input)."""
        for other in others:
            self.check_mergeable(other)
            other._compact()
            keys, stored = other._enumerate_built()
            # raw-domain counts re-combine under the codec's order-invariant rule
            self._pend_keys.append(keys)
            self._pend_counts.append(self._to_raw(stored).astype(np.uint64))
            self._pend_n += len(keys)
            self.q = max(self.q, other.q)
        self._compact()
        return self

    # --- serde -------------------------------------------------------------
    # Wire format mirrors the reference's on-disk layout idea
    # (/root/reference/src/abstract_bqf.cpp:512-529): geometry header +
    # metadata bitvectors + bit-packed slots; the quotient is implicit in
    # slot position, so each element costs ~(r + c + 2.125) bits.

    def _state_arrays(self) -> dict[str, np.ndarray]:
        self._compact()
        extent = self._extent
        return {"occupieds": self._occupieds,
                "runends": self._runends[: (extent + 63) // 64],
                "slots": pack_bits(self._slots[:extent], self.slot_width),
                "extent": np.array([extent], dtype=np.int64)}

    def _config(self) -> dict:
        return {"q": self.q, "hash_bits": self.hash_bits,
                "count_size": self.count_size,
                "auto_resize": int(self.auto_resize)}

    @classmethod
    def _construct(cls, config) -> "_QuotientFilterKernel":
        """Build an empty instance from config; subclasses with narrower
        __init__ signatures override."""
        return cls(q=int(config["q"]), hash_bits=int(config["hash_bits"]),
                   count_size=int(config["count_size"]),
                   auto_resize=bool(config["auto_resize"]))

    @classmethod
    def _from_state(cls, config, arrays):
        s = cls._construct(config)
        nq = 1 << s.q
        extent = int(arrays["extent"][0])
        cap = max(nq + s._SLACK, extent + 64)
        s._slots = np.zeros(cap, dtype=np.uint64)
        s._slots[:extent] = unpack_bits(arrays["slots"], s.slot_width, extent)
        s._occupieds = arrays["occupieds"].astype(np.uint64)
        s._runends = np.zeros((cap + 63) // 64, dtype=np.uint64)
        re_words = arrays["runends"].astype(np.uint64)
        s._runends[: len(re_words)] = re_words
        s._extent = extent
        s._built_q = s.q
        s._occ_quots = _bit_positions(s._occupieds, nq)
        s._runend_pos = _bit_positions(s._runends, extent)
        pc = _popcount64(s._occupieds).astype(np.int64)
        s._occ_prefix = np.concatenate([[0], np.cumsum(pc)[:-1]])
        if len(s._occ_quots):
            starts = np.maximum(s._occ_quots,
                                np.concatenate([[-1], s._runend_pos[:-1]]) + 1)
            s.elements_inside = int((s._runend_pos - starts + 1).sum())
        else:
            s.elements_inside = 0
        return s

    def serialized_bits_per_element(self) -> float:
        self._compact()
        if self.elements_inside == 0:
            return 0.0
        return len(self.to_bytes()) * 8.0 / self.elements_inside

    def debug_dump(self, max_slots: int = 128) -> str:
        """Readable slot-layout render (C19 ``block2string`` analog,
        /root/reference/src/rsqf.cpp:46-137): per-slot occupied/runend flags
        + remainder/count values, for tests and interactive debugging."""
        self._compact()
        lines = [f"<{type(self).__name__} q={self.q} hash_bits={self.hash_bits}"
                 f" c={self.count_size} elements={self.elements_inside}"
                 f" extent={self._extent}>"]
        cmask = (U64(1) << U64(self.count_size)) - U64(1)
        lim = min(self._extent, max_slots)
        occ = set(self._occ_quots.tolist())
        ends = set(self._runend_pos.tolist())
        for i in range(lim):
            val = self._slots[i]
            rem = val >> U64(self.count_size) if self.count_size else val
            cnt = int(val & cmask) if self.count_size else ""
            flags = (("occ" if i < (1 << self.q) and i in occ else "   ") +
                     (" run" if i in ends else "    "))
            lines.append(f"  slot {i:6d} [{flags}] rem={int(rem):>20d}"
                         + (f" count={cnt}" if self.count_size else ""))
        if self._extent > lim:
            lines.append(f"  ... {self._extent - lim} more slots")
        return "\n".join(lines)
