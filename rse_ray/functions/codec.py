"""Posting-list codec: delta + varint compressed docID/TF/DL blocks with
block-max metadata (north-star format; the reference keeps postings as
Postgres rows, init_db.sql:10-16 — here they become compact byte runs
that the merge shuffle moves instead of raw rows).

Layout of one encoded posting *run* (one term within one doc-partition):

    varint n                  # number of postings
    varint len(doc_bytes)
    varint len(tf_bytes)
    varint len(dl_bytes)
    doc_bytes                 # varint deltas of sorted doc_ids
                              # (first value = delta from 0, i.e. absolute)
    tf_bytes                  # varint term frequencies
    dl_bytes                  # varint doc lengths (carried per posting so
                              # BM25 scoring needs no docmap lookup)

Separate streams keep decode fully vectorized (numpy), ~50-100x faster
than a per-byte Python loop. Block-max metadata is a parallel structure
(one entry per BLOCK_SIZE postings): (last_doc, max_tf, min_dl), enough
to compute an exact BM25 upper bound per block for WAND-style skipping
(idf and avgdl are global query-time constants):

    ub(block) = idf * (k1+1)*max_tf / (max_tf + k1*(1 - b + b*min_dl/avgdl))

Runs over disjoint, ordered docID ranges concatenate into a globally
sorted posting list without re-encoding the deltas? No — the first doc
of each run is absolute, so runs are merged by decoding (vectorized) and
re-encoding once in the groupby(term) merge stage (pipelines/build.py).
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK_SIZE = 128

_U64_1 = np.uint64(1)
_SHIFTS = [np.uint64(7 * j) for j in range(10)]


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints. Scalar loop for
    short arrays (the numpy kernel's fixed setup costs ~40us, which
    dominates on the tail-term runs that are ~90% of encode calls);
    vectorized above that."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    if n <= 32:
        out = bytearray()
        for x in v.tolist():
            while True:
                b = x & 0x7F
                x >>= 7
                if x:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)
    # bytes needed per value: 1 + number of 7-bit groups above the first
    nbytes = np.ones(n, dtype=np.int64)
    for j in range(1, 10):
        nbytes += (v >= (_U64_1 << _SHIFTS[j])).astype(np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        vals = (v[sel] >> _SHIFTS[j]) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > j).astype(np.uint64) << np.uint64(7)
        out[offsets[sel] + j] = (vals | cont).astype(np.uint8)
    return out.tobytes()


def _varint_emit(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized LEB128 emission: uint64 values -> (uint8 byte stream,
    per-value byte counts). The kernel behind varint_encode's >32 path,
    factored out so encode_runs can run it ONCE over every run's values
    concatenated instead of once per run."""
    n = len(v)
    nbytes = np.ones(n, dtype=np.int64)
    for j in range(1, 10):
        nbytes += (v >= (_U64_1 << _SHIFTS[j])).astype(np.int64)
    offsets = np.zeros(n, dtype=np.int64)
    if n:
        np.cumsum(nbytes[:-1], out=offsets[1:])
    total = int(offsets[-1] + nbytes[-1]) if n else 0
    out = np.zeros(total, dtype=np.uint8)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        vals = (v[sel] >> _SHIFTS[j]) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1 > j).astype(np.uint64) << np.uint64(7)
        out[offsets[sel] + j] = (vals | cont).astype(np.uint8)
    return out, nbytes


def encode_runs(ids_list, tfs_list, dls_list):
    """Batch-encode MANY posting runs with one vectorized varint pass
    per stream (deltas / tfs / dls / headers) instead of ~4 Python-level
    varint calls per term. Byte-identical to ``encode_run`` applied per
    run (property-tested); the per-bucket segment writer's encode cost
    drops ~4x because tail terms (df 1-3, ~90% of the vocabulary) stop
    paying per-call scalar-loop overhead.

    Inputs are parallel sequences (python lists or arrays) of each
    run's doc_ids (strictly increasing), tfs, dls. Returns
    ``(payload: np.uint8 array, offsets: int64 array of len T+1)`` —
    run i's encoded bytes are ``payload[offsets[i]:offsets[i+1]]``.
    Empty runs are not supported (the segment writer never emits one).
    """
    from itertools import chain

    T = len(ids_list)
    if T == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    lens = np.fromiter((len(x) for x in ids_list), dtype=np.int64, count=T)
    if (lens == 0).any():
        raise ValueError("encode_runs: empty run")
    total = int(lens.sum())
    starts = np.zeros(T, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])

    all_ids = np.fromiter(chain.from_iterable(ids_list), dtype=np.int64,
                          count=total)
    # global diff, then overwrite each run's first slot with its
    # absolute head; validate increasing WITHIN runs only
    deltas = np.empty(total, dtype=np.int64)
    deltas[0] = all_ids[0]
    np.subtract(all_ids[1:], all_ids[:-1], out=deltas[1:])
    boundary = np.zeros(total, dtype=bool)
    boundary[starts] = True
    if (deltas[~boundary] <= 0).any():
        raise ValueError("doc_ids must be strictly increasing")
    deltas[starts] = all_ids[starts]

    doc_b, doc_nb = _varint_emit(deltas.astype(np.uint64))
    tf_b, tf_nb = _varint_emit(np.fromiter(
        chain.from_iterable(tfs_list), dtype=np.uint64, count=total))
    dl_b, dl_nb = _varint_emit(np.fromiter(
        chain.from_iterable(dls_list), dtype=np.uint64, count=total))

    ld = np.add.reduceat(doc_nb, starts)
    lt = np.add.reduceat(tf_nb, starts)
    ll = np.add.reduceat(dl_nb, starts)

    hdr_vals = np.empty(4 * T, dtype=np.uint64)
    hdr_vals[0::4] = lens
    hdr_vals[1::4] = ld
    hdr_vals[2::4] = lt
    hdr_vals[3::4] = ll
    hdr_b, hdr_nb = _varint_emit(hdr_vals)
    lh = np.add.reduceat(hdr_nb, np.arange(0, 4 * T, 4))

    run_bytes = lh + ld + lt + ll
    out_off = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(run_bytes, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)

    def scatter(stream: np.ndarray, seg_lens: np.ndarray,
                dst_starts: np.ndarray) -> None:
        # place each run's contiguous slice of `stream` at its
        # destination: dst index = src index + per-run shift
        src_starts = np.zeros(T, dtype=np.int64)
        np.cumsum(seg_lens[:-1], out=src_starts[1:])
        shift = np.repeat(dst_starts - src_starts, seg_lens)
        out[np.arange(len(stream), dtype=np.int64) + shift] = stream

    scatter(hdr_b, lh, out_off[:-1])
    scatter(doc_b, ld, out_off[:-1] + lh)
    scatter(tf_b, lt, out_off[:-1] + lh + ld)
    scatter(dl_b, ll, out_off[:-1] + lh + ld + lt)
    return out, out_off


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode exactly ``count`` LEB128 varints from ``buf`` (which must
    contain exactly those varints), vectorized."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    if count <= 32:  # scalar fast path, mirrors the encoder's
        out = np.empty(count, dtype=np.uint64)
        mv = memoryview(buf)
        at = 0
        for i in range(count):
            val, at = _read_varint(mv, at)
            out[i] = val
        if at != len(mv):
            raise ValueError("varint stream longer than expected")
        return out
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == count and not (b & 0x80).any():
        # all-single-byte stream: the dominant case for dense docID
        # deltas (head terms), tfs and dls — one masked cast, no
        # boundary bookkeeping. The continuation-bit check keeps
        # malformed streams (a multi-byte varint in a count-sized
        # buffer) on the validating path below, which raises.
        return b.astype(np.uint64)
    # length-grouped assembly: one pass over the BYTES finds value ends,
    # then each extra byte-position pass touches only the values long
    # enough to have one — a stream that is 99% single-byte (the normal
    # posting shape: dense deltas with one absolute run-head varint per
    # salt chunk) costs ~one gather, not a per-byte scatter over the
    # whole stream (the previous kernel; 401 ms -> ~10 ms on a 1.4M-
    # posting head term)
    ends = np.flatnonzero((b & 0x80) == 0)
    if len(ends) != count:
        raise ValueError(
            f"varint stream has {len(ends)} values, expected {count}"
        )
    if ends[-1] != len(b) - 1:
        raise ValueError("varint stream ends mid-value")
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    # gather-then-mask on the n first bytes (NOT a full-stream uint64
    # payload cast — that copy was the next-largest decode cost); the
    # continuation-bit mask is an identity on final bytes, so masking
    # unconditionally is exact
    out = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
    for j in range(1, int(lengths.max())):
        has = np.flatnonzero(lengths > j)
        out[has] += ((b[starts[has] + j] & np.uint8(0x7F))
                     .astype(np.uint64) << _SHIFTS[j])
    return out


def _varint_one(v: int) -> bytes:
    """Scalar LEB128 — the vectorized encoder's numpy setup costs ~90us
    even for one value; this is ~100x faster for the single-varint
    restitching done per run in splice_runs."""
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: memoryview, at: int) -> tuple[int, int]:
    val = 0
    shift = 0
    while True:
        byte = buf[at]
        at += 1
        val |= (byte & 0x7F) << shift
        if byte < 0x80:
            return val, at
        shift += 7


def encode_run(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Encode one posting run. ``doc_ids`` must be strictly increasing."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = len(doc_ids)
    if n == 0:
        return varint_encode(np.array([0, 0, 0, 0]))
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = np.uint64(doc_ids[0])
    if n > 1:
        d = np.diff(doc_ids)
        if (d <= 0).any():
            raise ValueError("doc_ids must be strictly increasing")
        deltas[1:] = d.astype(np.uint64)
    doc_bytes = varint_encode(deltas)
    tf_bytes = varint_encode(np.asarray(tfs, dtype=np.uint64))
    dl_bytes = varint_encode(np.asarray(dls, dtype=np.uint64))
    header = varint_encode(
        np.array([n, len(doc_bytes), len(tf_bytes), len(dl_bytes)], dtype=np.uint64)
    )
    return b"".join((header, doc_bytes, tf_bytes, dl_bytes))


def decode_run(buf: bytes | memoryview) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one run -> (doc_ids int64 ascending, tfs int32, dls int32)."""
    mv = memoryview(buf)
    n, at = _read_varint(mv, 0)
    ld, at = _read_varint(mv, at)
    lt, at = _read_varint(mv, at)
    ll, at = _read_varint(mv, at)
    if n == 0:
        return (
            np.zeros(0, dtype=np.int64),
            np.zeros(0, dtype=np.int32),
            np.zeros(0, dtype=np.int32),
        )
    deltas = varint_decode(mv[at : at + ld], n)
    tfs = varint_decode(mv[at + ld : at + ld + lt], n)
    dls = varint_decode(mv[at + ld + lt : at + ld + lt + ll], n)
    doc_ids = np.cumsum(deltas.astype(np.int64))
    return doc_ids, tfs.astype(np.int32), dls.astype(np.int32)


def splice_runs(payloads: list[bytes], min_docs, max_docs) -> bytes:
    """Concatenate doc-range-disjoint, ascending posting runs WITHOUT
    decoding: within-run deltas are unchanged by a merge, so the only
    bytes that differ from a full re-encode are each subsequent run's
    FIRST doc varint (absolute docID -> delta from the previous run's
    max_doc, both known from segment metadata). tf/dl streams
    concatenate verbatim. decode_run(splice_runs(...)) is element-exact
    with decoding the runs separately and concatenating (tests/
    test_codec.py); the merge shuffle's reducer cost drops from
    decode+re-encode of every posting to O(#runs) header arithmetic."""
    doc_parts: list = []
    tf_parts: list = []
    dl_parts: list = []
    n_tot = 0
    prev_max = 0
    first = True
    for i, buf in enumerate(payloads):
        mv = memoryview(buf)
        # inlined varint header reads with a 1-byte fast path (headers
        # are almost always 1-2 bytes; the function-call version spent
        # most of its time on call overhead in the merge hot loop)
        vals = []
        at = 0
        for _ in range(4):
            b0 = mv[at]
            if b0 < 0x80:
                vals.append(b0)
                at += 1
            else:
                v, at = _read_varint(mv, at)
                vals.append(v)
        n, ld, lt, ll = vals
        if n == 0:
            continue
        doc_b = mv[at : at + ld]
        tf_parts.append(mv[at + ld : at + ld + lt])
        dl_parts.append(mv[at + ld + lt : at + ld + lt + ll])
        if first:
            doc_parts.append(doc_b)
            first = False
        else:
            _, fe = _read_varint(doc_b, 0)  # skip the absolute first docID
            delta = int(min_docs[i]) - prev_max
            doc_parts.append(_varint_one(delta))
            doc_parts.append(doc_b[fe:])
        prev_max = int(max_docs[i])
        n_tot += n
    # bytes.join accepts memoryviews: one copy per stream total
    doc_bytes = b"".join(doc_parts)
    tf_bytes = b"".join(tf_parts)
    dl_bytes = b"".join(dl_parts)
    header = b"".join(
        _varint_one(v)
        for v in (n_tot, len(doc_bytes), len(tf_bytes), len(dl_bytes))
    )
    return header + doc_bytes + tf_bytes + dl_bytes


def decode_runs_joint(payloads: list[bytes]):
    """Decode doc-range-disjoint ascending runs (pre-sorted by min_doc)
    into concatenated (ids, tfs, dls) using ONE vectorized varint
    decode per stream instead of three per run — the per-call numpy
    setup dominates when a term is split into many salt chunks.

    Correctness of the joint doc decode: each run's first varint is its
    absolute min docID, so the joint cumsum is wrong from run 2 on by
    exactly the cumsum value just before that run's start — subtracting
    that per-run base (vectorized via repeat) restores the per-run
    cumsum. Element-exact with decoding runs separately (tests)."""
    doc_parts, tf_parts, dl_parts, ns = [], [], [], []
    for buf in payloads:
        mv = memoryview(buf)
        n, at = _read_varint(mv, 0)
        ld, at = _read_varint(mv, at)
        lt, at = _read_varint(mv, at)
        ll, at = _read_varint(mv, at)
        if n == 0:
            continue
        doc_parts.append(bytes(mv[at : at + ld]))
        tf_parts.append(bytes(mv[at + ld : at + ld + lt]))
        dl_parts.append(bytes(mv[at + ld + lt : at + ld + lt + ll]))
        ns.append(n)
    if not ns:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32),
                np.zeros(0, dtype=np.int32))
    n_tot = int(sum(ns))
    deltas = varint_decode(b"".join(doc_parts), n_tot).astype(np.int64)
    c = np.cumsum(deltas)
    if len(ns) > 1:
        ns_a = np.asarray(ns, dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(ns_a)[:-1]))
        run_base = np.concatenate(([0], c[starts[1:] - 1]))
        ids = c - np.repeat(run_base, ns_a)
    else:
        ids = c
    tfs = varint_decode(b"".join(tf_parts), n_tot).astype(np.int32)
    dls = varint_decode(b"".join(dl_parts), n_tot).astype(np.int32)
    return ids, tfs, dls


# --- block-max metadata ----------------------------------------------------

_BLOCK_HDR = struct.Struct("<i")


def block_meta(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    """Per-BLOCK_SIZE-postings metadata: (last_doc:i64, max_tf:i32,
    min_dl:i32), serialized as packed little-endian arrays."""
    n = len(doc_ids)
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    last_doc = np.empty(nblocks, dtype=np.int64)
    max_tf = np.empty(nblocks, dtype=np.int32)
    min_dl = np.empty(nblocks, dtype=np.int32)
    for i in range(nblocks):
        lo, hi = i * BLOCK_SIZE, min(n, (i + 1) * BLOCK_SIZE)
        last_doc[i] = doc_ids[hi - 1]
        max_tf[i] = tfs[lo:hi].max()
        min_dl[i] = dls[lo:hi].min()
    return _BLOCK_HDR.pack(nblocks) + last_doc.tobytes() + max_tf.tobytes() + min_dl.tobytes()


def splice_block_meta(metas: list[bytes]) -> bytes:
    """Concatenate per-run block metadata. Blocks keep describing
    exactly their postings (each run's last block is just shorter than
    BLOCK_SIZE); the query side only consumes (last_doc, max_tf,
    min_dl) per block and never assumes uniform block width, so spliced
    metadata is exact for WAND bounds."""
    n_tot = 0
    lasts, maxs, mins = [], [], []
    hdr = _BLOCK_HDR.size
    for m in metas:
        (nb,) = _BLOCK_HDR.unpack_from(m, 0)
        n_tot += nb
        mv = memoryview(m)
        at = hdr
        lasts.append(mv[at:at + 8 * nb])
        at += 8 * nb
        maxs.append(mv[at:at + 4 * nb])
        at += 4 * nb
        mins.append(mv[at:at + 4 * nb])
    # the sections are already packed little-endian arrays — splice is
    # pure byte concatenation, no numpy decode/re-encode round trip
    return (
        _BLOCK_HDR.pack(n_tot)
        + b"".join(lasts)
        + b"".join(maxs)
        + b"".join(mins)
    )


def decode_block_meta(buf: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    (nblocks,) = _BLOCK_HDR.unpack_from(buf, 0)
    at = _BLOCK_HDR.size
    last_doc = np.frombuffer(buf, dtype=np.int64, count=nblocks, offset=at)
    at += 8 * nblocks
    max_tf = np.frombuffer(buf, dtype=np.int32, count=nblocks, offset=at)
    at += 4 * nblocks
    min_dl = np.frombuffer(buf, dtype=np.int32, count=nblocks, offset=at)
    return last_doc, max_tf, min_dl


# --- positional payloads ----------------------------------------------------
# Term positions for phrase/proximity queries (the positional-index
# capability of a fulltext engine, e.g. Lucene's .pos files). Layout
# per term run: ONE LEB128 stream of all positions in doc order, each
# doc's first position absolute and the rest delta-coded — no header:
# the doc boundaries are fully determined by the run's tf values, which
# the main payload already carries. Because every doc's sub-stream is
# self-contained, salt-chunk runs splice by PURE BYTE CONCATENATION in
# min_doc order (cheaper than the main payload, which must re-code the
# head varint), and a spliced stream decodes with the concatenated tfs.


def encode_pos_runs(pos_lists, tfs_list):
    """Batch-encode every term's positions with one vectorized varint
    pass. ``pos_lists[i]`` is term i's positions flat-concatenated in
    ascending-doc order; ``tfs_list[i]`` its per-doc tfs (so
    sum(tfs_list[i]) == len(pos_lists[i])). Returns ``(payload uint8
    array, offsets int64 array of len T+1)`` like encode_runs."""
    from itertools import chain

    T = len(pos_lists)
    if T == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(1, dtype=np.int64)
    lens = np.fromiter((len(p) for p in pos_lists), dtype=np.int64,
                       count=T)
    total = int(lens.sum())
    term_starts = np.zeros(T, dtype=np.int64)
    np.cumsum(lens[:-1], out=term_starts[1:])

    all_pos = np.fromiter(chain.from_iterable(pos_lists), dtype=np.int64,
                          count=total)
    # first-position-of-doc boundaries: term start + exclusive cumsum
    # of that term's tfs
    bound_idx = np.concatenate([
        term_starts[i] + np.concatenate(
            ([0], np.cumsum(np.asarray(tfs_list[i], dtype=np.int64)[:-1])))
        for i in range(T) if lens[i]
    ]) if total else np.zeros(0, dtype=np.int64)
    deltas = np.empty(total, dtype=np.int64)
    if total:
        deltas[0] = all_pos[0]
        np.subtract(all_pos[1:], all_pos[:-1], out=deltas[1:])
        boundary = np.zeros(total, dtype=bool)
        boundary[bound_idx] = True
        if (deltas[~boundary] <= 0).any():
            raise ValueError("positions must be strictly increasing per doc")
        deltas[bound_idx] = all_pos[bound_idx]

    buf, nbytes = _varint_emit(deltas.astype(np.uint64))
    out_off = np.zeros(T + 1, dtype=np.int64)
    if total:
        # cumsum-at-starts rather than reduceat: reduceat would fold a
        # zero-length term's (empty) span into its neighbor
        csum = np.concatenate(([0], np.cumsum(nbytes)))
        out_off[1:] = csum[np.append(term_starts[1:], total)]
    return buf, out_off


def decode_pos_run(buf: bytes | memoryview, tfs: np.ndarray) -> np.ndarray:
    """Decode one term's (possibly spliced) position stream back to
    absolute positions, vectorized: a grouped cumsum where each doc's
    first position is absolute. ``tfs`` are the per-doc tfs in the same
    doc order the stream was encoded in."""
    tfs = np.asarray(tfs, dtype=np.int64)
    total = int(tfs.sum())
    vals = varint_decode(bytes(buf), total).astype(np.int64)
    if total == 0:
        return vals
    c = np.cumsum(vals)
    doc_starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
    base = c[doc_starts] - vals[doc_starts]  # cumsum just before each doc
    return c - np.repeat(base, tfs)


def decode_pos_runs_joint(payloads: list[bytes], tfs: np.ndarray) -> np.ndarray:
    """Decode doc-range-disjoint position runs (pre-sorted by min_doc,
    matching decode_runs_joint's concatenated tfs) in one pass: runs
    are independent byte streams, so their concatenation IS a valid
    stream for the concatenated tfs."""
    return decode_pos_run(b"".join(bytes(p) for p in payloads), tfs)


# --------------------------------------------------------------------------
# FOR-bitpacked block codec (second wire format)
# --------------------------------------------------------------------------

def for_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference bitpacking (the PForDelta family without the
    patch list): per BLOCK_SIZE block store varint base (=min), one
    width byte w = bit_length(max - base), then all (v - base) packed
    w bits each, little-endian bit order, byte-aligned per block.
    Constant-width blocks decode with pure shifts (no data-dependent
    byte walk like varint), the classic trade: slightly larger tails,
    faster scans. Layout: varint n, then blocks."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out = bytearray(_varint_one(len(v)))
    for s in range(0, len(v), BLOCK_SIZE):
        blk = v[s:s + BLOCK_SIZE]
        base = int(blk.min())
        d = blk - np.uint64(base)
        w = int(d.max()).bit_length()
        out += _varint_one(base)
        out.append(w)
        if w:
            bitidx = np.arange(len(d), dtype=np.int64) * w
            packed = np.zeros((len(d) * w + 7) // 8, dtype=np.uint8)
            for j in range(w):
                gi = bitidx + j
                bits = ((d >> np.uint64(j)) & np.uint64(1)).astype(np.uint8)
                np.bitwise_or.at(
                    packed, gi >> 3,
                    bits << (gi & 7).astype(np.uint8))
            out += packed.tobytes()
    return bytes(out)


def for_decode(buf: bytes | memoryview) -> np.ndarray:
    """Inverse of for_encode; returns uint64 values."""
    mv = memoryview(buf)
    n, at = _read_varint(mv, 0)
    out = np.empty(n, dtype=np.uint64)
    got = 0
    while got < n:
        cnt = min(BLOCK_SIZE, n - got)
        base, at = _read_varint(mv, at)
        w = mv[at]
        at += 1
        if w == 0:
            out[got:got + cnt] = base
        else:
            nbytes = (cnt * w + 7) // 8
            packed = np.frombuffer(mv[at:at + nbytes], dtype=np.uint8)
            at += nbytes
            d = np.zeros(cnt, dtype=np.uint64)
            bitidx = np.arange(cnt, dtype=np.int64) * w
            for j in range(w):
                gi = bitidx + j
                bits = (packed[gi >> 3] >> (gi & 7).astype(np.uint8)) \
                    & np.uint8(1)
                d |= bits.astype(np.uint64) << np.uint64(j)
            out[got:got + cnt] = d + np.uint64(base)
        got += cnt
    return out
