"""Streaming archive merge vs full-rebuild oracle (differential fuzz).

The streaming two-pass merge (_StreamingDayMerge, parity target
memstore/merge.go:333) must produce byte-identical archive VPs to the
round-1 full-rebuild path (expand base + concat + lexsort + compress) on
every input: mixed dtypes, signed/float/bool/2-lane sort columns, nulls,
duplicate keys across base and patch.
"""

import numpy as np
import pytest

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.memstore.archiving import (
    _StreamingDayMerge,
    _merge_positions,
    _orderable_bytes,
    _sort_and_compress,
    _sort_key_matrix,
)


class _FakeBatch:
    """Minimal stand-in for ArchiveBatch over pre-built VPs."""

    def __init__(self, vps, size):
        self.vps = vps
        self.size = size

    def request_column(self, cid):
        return self.vps.get(cid)


class _FakeColumn:
    def __init__(self, data_type, default=None):
        self.data_type = data_type
        self.default_value = default
        self.deleted = False


class _FakeTable:
    def __init__(self, columns):
        self.columns = columns


class _FakeSchema:
    def __init__(self, columns):
        self.table = _FakeTable(columns)


def _rand_col(rng, dt, n, null_frac=0.2):
    npdt = mdt.numpy_dtype(dt)
    lanes = mdt.lanes(dt)
    if npdt == np.bool_:
        v = rng.randint(0, 2, n).astype(bool)
    elif npdt.kind == "f":
        shape = (n, 2) if lanes == 2 else (n,)
        v = (rng.randn(*shape) * 10).astype(npdt)
    else:
        info = np.iinfo(npdt)
        lo = max(info.min, -50)
        hi = min(info.max, 50)
        shape = (n, 2) if lanes == 2 else (n,)
        v = rng.randint(lo, hi + 1, shape).astype(npdt)
    b = rng.rand(n) >= null_frac
    if lanes == 1:
        v = v * b.astype(v.dtype) if npdt != np.bool_ else v
    return v, b


def _oracle(base_cols, patch_cols, n_base, n_patch, sort_cols, dtypes):
    merged = {}
    for cid in dtypes:
        bv, bb = base_cols.get(cid, (None, None))
        pv, pb = patch_cols[cid]
        if n_base:
            merged[cid] = (np.concatenate([bv, pv]),
                           np.concatenate([bb, pb]))
        else:
            merged[cid] = (pv, pb)
    return _sort_and_compress(merged, sort_cols, n_base + n_patch, dtypes)


def _run_case(rng, col_types, sort_cols, n_base, n_patch, null_frac=0.2):
    dtypes = dict(enumerate(col_types))
    columns = [_FakeColumn(dt) for dt in col_types]
    schema = _FakeSchema(columns)
    all_cols = list(dtypes)

    base_raw = {cid: _rand_col(rng, dtypes[cid], n_base, null_frac)
                for cid in all_cols}
    patch = {cid: _rand_col(rng, dtypes[cid], n_patch, null_frac)
             for cid in all_cols}

    # base must arrive sorted+compressed, as a real archive batch would
    base_vps = _sort_and_compress(dict(base_raw), sort_cols, n_base, dtypes)
    base_batch = _FakeBatch(base_vps, n_base) if n_base else None
    # the oracle needs the SORTED base expansion for concat
    base_sorted = {
        cid: (np.asarray(vp.expanded().values), np.asarray(vp.expanded().validity))
        for cid, vp in base_vps.items()} if n_base else {}

    got = _StreamingDayMerge(base_batch, patch, n_patch, sort_cols,
                             schema, dtypes)
    want = _oracle(base_sorted, patch, n_base, n_patch, sort_cols, dtypes)

    for cid in all_cols:
        g = got.merged_column(cid)
        w = want[cid]
        np.testing.assert_array_equal(
            np.asarray(g.values), np.asarray(w.values),
            err_msg=f"values col {cid}")
        np.testing.assert_array_equal(
            np.asarray(g.validity), np.asarray(w.validity),
            err_msg=f"validity col {cid}")
        gc = getattr(g, "counts", None)
        wc = getattr(w, "counts", None)
        if wc is None:
            assert gc is None
        else:
            np.testing.assert_array_equal(np.asarray(gc), np.asarray(wc),
                                          err_msg=f"counts col {cid}")


CASES = [
    # (col_types, sort_cols, n_base, n_patch)
    ([mdt.Uint32, mdt.Uint16, mdt.Float32], [1], 500, 80),
    ([mdt.Uint32, mdt.Uint16, mdt.SmallEnum, mdt.Float32], [1, 2], 1000, 200),
    ([mdt.Uint32, mdt.Int16, mdt.Bool, mdt.Float32], [1, 2, 0], 700, 150),
    ([mdt.Uint32, mdt.Float32, mdt.Int8], [1], 300, 300),     # float sort
    ([mdt.Uint32, mdt.Int32, mdt.Uint8], [1, 2], 0, 250),     # no base
    ([mdt.Uint32, mdt.Uint16], [1], 400, 1),                  # single-row patch
    ([mdt.Uint32, mdt.Uint16, mdt.Float32], [], 200, 100),    # no sort cols
    ([mdt.Uint32, mdt.UUID, mdt.Uint16], [2, 1], 300, 90),    # 2-lane col
    ([mdt.Uint32, mdt.Int64, mdt.Float32], [1], 400, 120),    # 8-byte signed
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_streaming_merge_matches_rebuild(case):
    col_types, sort_cols, n_base, n_patch = CASES[case]
    rng = np.random.RandomState(case * 7 + 1)
    _run_case(rng, col_types, sort_cols, n_base, n_patch)


def test_streaming_merge_heavy_duplicates():
    # tiny key domain → long runs, many base/patch key collisions
    rng = np.random.RandomState(99)
    _run_case(rng, [mdt.Uint32, mdt.Uint8, mdt.Bool], [1, 2], 2000, 500,
              null_frac=0.4)


def test_streaming_merge_repeated_passes():
    """Archive → archive → archive accumulates correctly (base grows)."""
    rng = np.random.RandomState(5)
    dtypes = {0: mdt.Uint32, 1: mdt.Uint16, 2: mdt.Float32}
    sort_cols = [1]
    schema = _FakeSchema([_FakeColumn(dt) for dt in dtypes.values()])

    acc_raw = {cid: (np.empty(0, mdt.numpy_dtype(dt)), np.empty(0, bool))
               for cid, dt in dtypes.items()}
    base_vps, n_base = {}, 0
    for it in range(4):
        n_patch = 150 + it * 37
        patch = {cid: _rand_col(rng, dtypes[cid], n_patch)
                 for cid in dtypes}
        base_batch = _FakeBatch(base_vps, n_base) if n_base else None
        m = _StreamingDayMerge(base_batch, patch, n_patch, sort_cols,
                               schema, dtypes)
        base_vps = {cid: m.merged_column(cid) for cid in dtypes}
        n_base = m.n_total
        for cid in dtypes:
            acc_raw[cid] = (
                np.concatenate([acc_raw[cid][0], patch[cid][0]]),
                np.concatenate([acc_raw[cid][1], patch[cid][1]]))
    want = _sort_and_compress(dict(acc_raw), sort_cols, n_base, dtypes)
    for cid in dtypes:
        np.testing.assert_array_equal(
            np.asarray(base_vps[cid].values), np.asarray(want[cid].values))
        np.testing.assert_array_equal(
            np.asarray(base_vps[cid].validity),
            np.asarray(want[cid].validity))


# -- key encoding units ------------------------------------------------------

def test_orderable_bytes_orders_like_values():
    rng = np.random.RandomState(0)
    for arr in [
        rng.randint(-1000, 1000, 500).astype(np.int32),
        rng.randint(0, 1 << 16, 500).astype(np.uint16),
        (rng.randn(500) * 100).astype(np.float32),
        rng.randint(-7, 8, 500).astype(np.int8),
        rng.randint(0, 2, 500).astype(bool),
        rng.randint(-10**12, 10**12, 500).astype(np.int64),
    ]:
        validity = np.ones(len(arr), bool)
        enc = _orderable_bytes(arr, validity)
        void = enc.view(np.dtype((np.void, enc.shape[1]))).ravel()
        order_enc = np.argsort(void, kind="stable")
        order_val = np.argsort(arr, kind="stable")
        np.testing.assert_array_equal(arr[order_enc], arr[order_val])


def test_merge_positions_ties_base_first():
    base = np.array([[1], [2], [2], [5]], np.uint8)
    patch = np.array([[2], [3]], np.uint8)
    bp, pp = _merge_positions(base, patch)
    # merged: 1(b) 2(b) 2(b) 2(p) 3(p) 5(b)
    np.testing.assert_array_equal(bp, [0, 1, 2, 5])
    np.testing.assert_array_equal(pp, [3, 4])
    assert len(set(bp) | set(pp)) == 6


def test_streaming_merge_resorts_legacy_order_base():
    """A base day batch written under the OLD key encoding (value before
    validity: nulls sorted among values) must not corrupt the merge — the
    streaming merge detects the non-ascending base and re-sorts it once
    (null-first), instead of searchsorted-ing an unsorted run."""
    from aresdb_tpu.memstore.vector_party import ArchiveVectorParty

    schema = _FakeSchema([_FakeColumn(mdt.Uint32), _FakeColumn(mdt.Int32)])
    dtypes = {0: mdt.Uint32, 1: mdt.Int32}
    # legacy order for an Int32 sort column: -5, null(0), 3 (null between)
    base = _FakeBatch({
        0: ArchiveVectorParty(mdt.Uint32,
                              values=np.array([10, 11, 12], np.uint32),
                              validity=np.ones(3, bool)),
        1: ArchiveVectorParty(mdt.Int32,
                              values=np.array([-5, 0, 3], np.int32),
                              validity=np.array([True, False, True])),
    }, 3)
    patch = {0: (np.array([13], np.uint32), np.ones(1, bool)),
             1: (np.array([-7], np.int32), np.ones(1, bool))}
    m = _StreamingDayMerge(base, patch, 1, [1], schema, dtypes)
    assert m.base_reorder is not None
    v1 = m.merged_column(1)
    reps = np.diff(v1.counts.astype(np.int64))
    ev = np.repeat(np.asarray(v1.values), reps)
    eb = np.repeat(np.asarray(v1.validity), reps)
    # null-first, then -7, -5, 3
    assert list(eb) == [False, True, True, True]
    assert list(ev[1:]) == [-7, -5, 3]
    # and the time column follows the same placement
    v0 = m.merged_column(0)
    assert list(np.asarray(v0.values)) == [11, 13, 10, 12]


def test_streaming_merge_nan_float_sort_column():
    """Regression: np.lexsort orders all NaN last while the memcmp key
    matrix splits NaN by sign bit — a float sort column containing NaN
    produced a non-memcmp-sorted patch and corrupted merge placement.
    Both paths now order by the IEEE total-order representation."""
    from aresdb_tpu.memstore.vector_party import ArchiveVectorParty

    schema = _FakeSchema([_FakeColumn(mdt.Uint32), _FakeColumn(mdt.Float32)])
    dtypes = {0: mdt.Uint32, 1: mdt.Float32}
    nan = np.float32(np.nan)
    neg_nan = np.frombuffer(np.uint32(0xFFC00000).tobytes(),
                            np.float32)[0]  # -NaN bit pattern
    pvals = np.array([3.0, nan, -1.0, neg_nan, 2.0], np.float32)
    patch = {0: (np.arange(5, dtype=np.uint32), np.ones(5, bool)),
             1: (pvals, np.ones(5, bool))}

    # oracle: direct sort+compress of the same rows
    expected = _sort_and_compress(dict(patch), [1], 5, dtypes)

    m = _StreamingDayMerge(None, patch, 5, [1], schema, dtypes)
    got = {cid: m.merged_column(cid) for cid in (0, 1)}
    for cid in (0, 1):
        g, e = got[cid], expected[cid]
        np.testing.assert_array_equal(
            np.asarray(g.values).view(np.uint32),
            np.asarray(e.values).view(np.uint32), err_msg=f"col {cid}")
        if e.counts is not None:
            np.testing.assert_array_equal(g.counts, e.counts)

    # and with a base: 2 NaN-keyed base rows + the patch must interleave
    # without corrupting placement (total rows preserved, keys sorted)
    base_cols = _sort_and_compress(
        {0: (np.array([10, 11], np.uint32), np.ones(2, bool)),
         1: (np.array([nan, 0.5], np.float32), np.ones(2, bool))},
        [1], 2, dtypes)
    base = _FakeBatch(base_cols, 2)
    m2 = _StreamingDayMerge(base, patch, 5, [1], schema, dtypes)
    v0 = m2.merged_column(0)
    assert v0.num_rows == 7
    assert sorted(np.asarray(v0.values).tolist()) == [0, 1, 2, 3, 4, 10, 11]
