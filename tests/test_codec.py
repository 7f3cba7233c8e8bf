"""Codec round-trip + property tests (SURVEY §5.3)."""

import numpy as np
import pytest

from rse_ray.functions.codec import (
    BLOCK_SIZE,
    block_meta,
    decode_block_meta,
    decode_run,
    encode_run,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**40, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    buf = varint_encode(vals)
    out = varint_decode(buf, len(vals))
    assert (out == vals).all()


def test_varint_empty():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"", 0)) == 0


def test_varint_malformed_streams_rejected():
    # a stream ending mid-value (trailing continuation byte) and a
    # count mismatch must both raise, on the scalar AND vector paths
    vals = np.arange(100, dtype=np.uint64) + 120  # mix of 1- and 2-byte
    buf = varint_encode(vals)
    with pytest.raises(ValueError):
        varint_decode(buf + b"\x80", len(vals))  # vector path, mid-value
    with pytest.raises(ValueError):
        varint_decode(buf, len(vals) + 7)        # vector path, bad count
    with pytest.raises((ValueError, IndexError)):
        varint_decode(b"\x01\x02\x80", 3)        # scalar path, mid-value


def test_varint_sizes():
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"


def test_varint_random_roundtrip():
    rng = np.random.default_rng(42)
    for scale in (100, 10**6, 10**12):
        vals = rng.integers(0, scale, size=10000).astype(np.uint64)
        assert (varint_decode(varint_encode(vals), len(vals)) == vals).all()


def test_run_roundtrip():
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(10**7, size=5000, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 50, size=5000).astype(np.int32)
    dls = rng.integers(20, 400, size=5000).astype(np.int32)
    buf = encode_run(doc_ids, tfs, dls)
    d, t, l = decode_run(buf)
    assert (d == doc_ids).all()
    assert (t == tfs).all()
    assert (l == dls).all()
    # delta+varint should beat raw int64 docids comfortably on dense lists
    assert len(buf) < doc_ids.nbytes


def test_run_single_and_empty():
    d, t, l = decode_run(encode_run(np.array([42]), np.array([3]), np.array([100])))
    assert d.tolist() == [42] and t.tolist() == [3] and l.tolist() == [100]
    d, t, l = decode_run(encode_run(np.array([], dtype=np.int64), np.array([]), np.array([])))
    assert len(d) == 0


def test_run_bucketed_ids_roundtrip():
    # doc ids with the (bucket << 40 | rank) layout used by the build
    ids = np.array([(b << 40) | r for b in (0, 3, 17) for r in range(100)], dtype=np.int64)
    ids.sort()
    tfs = np.ones(len(ids), dtype=np.int32)
    dls = np.full(len(ids), 30, dtype=np.int32)
    d, t, l = decode_run(encode_run(ids, tfs, dls))
    assert (d == ids).all()


def test_run_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_run(np.array([5, 5]), np.array([1, 1]), np.array([1, 1]))
    with pytest.raises(ValueError):
        encode_run(np.array([5, 3]), np.array([1, 1]), np.array([1, 1]))


def test_block_meta_invariants():
    rng = np.random.default_rng(3)
    n = 1000
    doc_ids = np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 90, size=n).astype(np.int32)
    dls = rng.integers(10, 500, size=n).astype(np.int32)
    last_doc, max_tf, min_dl = decode_block_meta(block_meta(doc_ids, tfs, dls))
    nblocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert len(last_doc) == nblocks
    for i in range(nblocks):
        lo, hi = i * BLOCK_SIZE, min(n, (i + 1) * BLOCK_SIZE)
        assert last_doc[i] == doc_ids[hi - 1]
        assert max_tf[i] == tfs[lo:hi].max()   # block-max invariant (§5.3)
        assert min_dl[i] == dls[lo:hi].min()


def test_splice_runs_equals_decode_concat():
    """splice_runs must be element-exact with decode-each-and-concat,
    for random numbers of disjoint ascending runs (the merge contract)."""
    from rse_ray.functions.codec import splice_block_meta, splice_runs

    rng = np.random.default_rng(11)
    for trial in range(20):
        n_runs = int(rng.integers(2, 6))
        payloads, metas, min_docs, max_docs = [], [], [], []
        all_ids, all_tfs, all_dls = [], [], []
        base = 0
        for r in range(n_runs):
            n = int(rng.integers(1, 400))
            ids = base + np.sort(
                rng.choice(10**5, size=n, replace=False)
            ).astype(np.int64)
            base = int(ids[-1]) + int(rng.integers(1, 1000))
            tfs = rng.integers(1, 50, size=n).astype(np.int32)
            dls = rng.integers(5, 300, size=n).astype(np.int32)
            payloads.append(encode_run(ids, tfs, dls))
            metas.append(block_meta(ids, tfs, dls))
            min_docs.append(int(ids[0]))
            max_docs.append(int(ids[-1]))
            all_ids.append(ids)
            all_tfs.append(tfs)
            all_dls.append(dls)
        spliced = splice_runs(
            payloads, np.array(min_docs), np.array(max_docs)
        )
        d, t, l = decode_run(spliced)
        assert (d == np.concatenate(all_ids)).all()
        assert (t == np.concatenate(all_tfs)).all()
        assert (l == np.concatenate(all_dls)).all()
        # spliced block meta == concat of per-run metas, and every block
        # still satisfies the block-max invariant over its own postings
        ld, mt, md = decode_block_meta(splice_block_meta(metas))
        parts = [decode_block_meta(m) for m in metas]
        assert (ld == np.concatenate([p[0] for p in parts])).all()
        assert (mt == np.concatenate([p[1] for p in parts])).all()
        assert (md == np.concatenate([p[2] for p in parts])).all()
        assert (np.diff(ld) > 0).all()  # ascending across run joints


def test_decode_runs_joint_exact():
    from rse_ray.functions.codec import decode_runs_joint

    rng = np.random.default_rng(23)
    for trial in range(15):
        n_runs = int(rng.integers(1, 7))
        payloads, all_ids, all_tfs, all_dls = [], [], [], []
        base = 0
        for _ in range(n_runs):
            n = int(rng.integers(1, 300))
            ids = base + np.sort(
                rng.choice(10**6, size=n, replace=False)
            ).astype(np.int64)
            base = int(ids[-1]) + int(rng.integers(1, 50))
            tfs = rng.integers(1, 40, size=n).astype(np.int32)
            dls = rng.integers(5, 200, size=n).astype(np.int32)
            payloads.append(encode_run(ids, tfs, dls))
            all_ids.append(ids)
            all_tfs.append(tfs)
            all_dls.append(dls)
        d, t, l = decode_runs_joint(payloads)
        assert (d == np.concatenate(all_ids)).all()
        assert (t == np.concatenate(all_tfs)).all()
        assert (l == np.concatenate(all_dls)).all()


def test_encode_runs_batched_identical_to_per_run():
    """encode_runs (one vectorized varint pass over every run) must be
    byte-identical to encode_run applied per run, across the df mix a
    real vocabulary has (singleton tail terms through multi-block head
    terms), and round-trip through decode_run."""
    import numpy as np

    from rse_ray.functions.codec import decode_run, encode_run, encode_runs

    rng = np.random.default_rng(23)
    runs = []
    for n in [1, 1, 2, 3, 5, 31, 32, 33, 40, 200, 1000]:
        ids = np.cumsum(rng.integers(1, 100_000, n)).astype(np.int64)
        tfs = rng.integers(1, 300, n).astype(np.int32)
        dls = rng.integers(1, 5000, n).astype(np.int32)
        runs.append((ids, tfs, dls))
    ref = [encode_run(*r) for r in runs]
    payload, off = encode_runs([r[0] for r in runs], [r[1] for r in runs],
                               [r[2] for r in runs])
    got = [payload[off[i]:off[i + 1]].tobytes() for i in range(len(runs))]
    assert got == ref
    for i, (ids, tfs, dls) in enumerate(runs):
        d, t, l = decode_run(got[i])
        assert (d == ids).all() and (t == tfs).all() and (l == dls).all()

    # python-list inputs (the segment writer's shape) hit the same bytes
    p2, o2 = encode_runs([list(r[0]) for r in runs],
                         [list(r[1]) for r in runs],
                         [list(r[2]) for r in runs])
    assert (p2 == payload).all() and (o2 == off).all()

    import pytest

    with pytest.raises(ValueError):
        encode_runs([[3, 2]], [[1, 1]], [[1, 1]])
    with pytest.raises(ValueError):
        encode_runs([[]], [[]], [[]])


# --- positional payloads ----------------------------------------------------

def test_pos_runs_roundtrip_random():
    """encode_pos_runs / decode_pos_run round-trip against randomized
    per-doc position sets, and joint decode of spliced runs equals the
    concatenation (the merge-stage contract: splice = byte concat)."""
    import numpy as np

    from rse_ray.functions.codec import (
        decode_pos_run,
        decode_pos_runs_joint,
        encode_pos_runs,
    )

    rng = np.random.default_rng(7)
    terms = []
    for _ in range(40):
        docs = rng.integers(1, 6)
        flat, tfs = [], []
        for _ in range(docs):
            tf = int(rng.integers(1, 8))
            pos = np.sort(rng.choice(2000, size=tf, replace=False))
            flat.extend(int(x) for x in pos)
            tfs.append(tf)
        terms.append((flat, tfs))

    buf, off = encode_pos_runs([t[0] for t in terms],
                               [t[1] for t in terms])
    for i, (flat, tfs) in enumerate(terms):
        got = decode_pos_run(bytes(buf[off[i]:off[i + 1]]), tfs)
        assert got.tolist() == flat

    # splice two runs (doc-range disjoint by construction here): joint
    # decode of concatenated bytes with concatenated tfs
    (f0, t0), (f1, t1) = terms[0], terms[1]
    p0 = bytes(buf[off[0]:off[1]])
    p1 = bytes(buf[off[1]:off[2]])
    got = decode_pos_runs_joint([p0, p1], np.array(t0 + t1))
    assert got.tolist() == f0 + f1


def test_pos_runs_edge_cases():
    import numpy as np
    import pytest

    from rse_ray.functions.codec import decode_pos_run, encode_pos_runs

    # position 0 encodes/decodes; single-doc single-pos terms
    buf, off = encode_pos_runs([[0], [5, 0]], [[1], [1, 1]])
    assert decode_pos_run(bytes(buf[off[0]:off[1]]), [1]).tolist() == [0]
    assert decode_pos_run(bytes(buf[off[1]:off[2]]),
                          [1, 1]).tolist() == [5, 0]
    # empty input
    buf, off = encode_pos_runs([], [])
    assert len(buf) == 0 and off.tolist() == [0]
    # non-increasing positions within a doc rejected
    with pytest.raises(ValueError):
        encode_pos_runs([[3, 3]], [[2]])


def test_for_codec_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rse_ray.functions.codec import for_decode, for_encode

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                    max_size=400))
    def rt(vals):
        a = np.array(vals, dtype=np.uint64)
        assert for_decode(for_encode(a)).tolist() == vals

    rt()


def test_for_codec_edges_and_density():
    import numpy as np

    from rse_ray.functions.codec import for_decode, for_encode

    # all-equal block packs to width 0 (header-only)
    a = np.full(300, 7, dtype=np.uint64)
    enc = for_encode(a)
    assert len(enc) < 20
    assert for_decode(enc).tolist() == a.tolist()
    # dense deltas beat varint's 1-byte/value floor
    from rse_ray.functions.codec import varint_encode

    dense = np.ones(1024, dtype=np.uint64)
    assert len(for_encode(dense)) < len(varint_encode(dense))
