"""Unit tests for the sorted-contiguity reduction primitives.

sorted_starts / sorted_segment_sum replace the factored-MXU / scatter
segment reductions downstream of the group-key sort (reference:
query/sort_reduce.cu ReduceByKey); these tests pin them against numpy
oracles, including the adversarial tiny-group-among-huge-values case the
block decomposition exists for, and pin the u32 narrow-key packing against
the canonical u64 key space.
"""

import numpy as np
import pytest

from aresdb_tpu.utils import jax_env

jax_env.ensure()

import jax.numpy as jnp

from aresdb_tpu.query import kernels as K


@pytest.mark.parametrize("seed,n,num", [
    (0, 4096, 64), (1, 4096, 4097), (2, 1000, 17), (3, 512 * 9, 300),
    (4, 300, 8), (5, 512 * 8, 1 << 15),
])
def test_sorted_starts_matches_searchsorted(seed, n, num):
    rng = np.random.RandomState(seed)
    seg = np.sort(rng.randint(0, num, n)).astype(np.int32)
    got = np.asarray(K.sorted_starts(jnp.asarray(seg), num))
    want = np.searchsorted(seg, np.arange(num)).astype(np.int32)
    assert np.array_equal(got, want)


def _spans_from_seg(seg, num, n):
    starts = np.searchsorted(seg, np.arange(num)).astype(np.int32)
    ends = np.concatenate([starts[1:], [n]]).astype(np.int32)
    return starts, ends


@pytest.mark.parametrize("seed,n,num", [
    (0, 4096, 65), (1, 512 * 9, 129), (2, 777, 33), (3, 512 * 16, 1025),
])
def test_sorted_segment_sum_matches_oracle(seed, n, num):
    rng = np.random.RandomState(100 + seed)
    seg = np.sort(rng.randint(0, num, n)).astype(np.int32)
    vals = (rng.rand(n, 2).astype(np.float32) - 0.3) * 100
    starts, ends = _spans_from_seg(seg, num, n)
    got = np.asarray(K.sorted_segment_sum(
        jnp.asarray(vals), num, jnp.asarray(starts), jnp.asarray(ends)))
    want = np.zeros((num, 2))
    np.add.at(want, seg, vals.astype(np.float64))
    assert got == pytest.approx(want, rel=1e-5, abs=1e-3)


def test_sorted_segment_sum_tiny_group_among_huge_values():
    """Error must stay relative to each group's own magnitude: a 1-row
    group of 1e-3 surrounded by 1e6-scale values in the same 512-row block
    must come out exact-ish (the prefix-difference formulation fails this;
    the block decomposition is why)."""
    n, num = 2048, 5
    seg = np.zeros(n, np.int32)
    seg[1000] = 1          # not monotone yet — rebuild properly
    seg = np.sort(np.concatenate([
        np.zeros(1000, np.int32), [1], np.full(n - 1001, 2, np.int32)]))
    vals = np.full((n, 1), 1e6, np.float32)
    vals[1000] = 1e-3
    starts, ends = _spans_from_seg(seg, num, n)
    got = np.asarray(K.sorted_segment_sum(
        jnp.asarray(vals), num, jnp.asarray(starts), jnp.asarray(ends)))
    assert got[1, 0] == pytest.approx(1e-3, rel=1e-6)
    assert got[0, 0] == pytest.approx(1e9, rel=1e-6)
    assert got[3, 0] == 0 and got[4, 0] == 0


def test_sorted_segment_sum_counts_exact():
    rng = np.random.RandomState(7)
    n, num = 512 * 20, 97
    seg = np.sort(rng.randint(0, num, n)).astype(np.int32)
    ones = np.ones((n, 1), np.float32)
    starts, ends = _spans_from_seg(seg, num, n)
    got = np.asarray(K.sorted_segment_sum(
        jnp.asarray(ones), num, jnp.asarray(starts), jnp.asarray(ends)))
    want = np.bincount(seg, minlength=num).astype(np.float64)[:, None]
    assert np.array_equal(got, want)


@pytest.mark.parametrize("agg", ["sum", "count", "min", "max", "avg"])
def test_reduce_by_key_prefix_vs_scatter(agg, monkeypatch):
    """ARES_PREFIX=0 (factored/scatter) and the default prefix path must
    produce identical group tables."""
    rng = np.random.RandomState(11)
    n, kg = 3000, 64
    keys = rng.randint(0, 40, n).astype(np.uint64)
    keys[rng.rand(n) < 0.1] = K.SENTINEL64  # filtered rows
    mval = (rng.rand(n).astype(np.float32) - 0.4) * 10
    mvalid = rng.rand(n) > 0.15

    outs = []
    for flag in ("0", "1"):
        monkeypatch.setenv("ARES_PREFIX", flag)
        out = K.reduce_by_key(jnp.asarray(keys), jnp.asarray(mval),
                              jnp.asarray(mvalid), agg, True, kg)
        outs.append([np.asarray(x) for x in out[:5]])
    (k0, u0, a0, c0, g0), (k1, u1, a1, c1, g1) = outs
    assert np.array_equal(k0, k1) and np.array_equal(u0, u1)
    assert int(g0) == int(g1)
    assert np.array_equal(c0, c1)                      # counts exact
    assert a0 == pytest.approx(a1, rel=1e-5, abs=1e-4)


def test_u32_narrow_keys_match_u64_packing():
    """pack_dim_keys emits u32 for narrow dims; reduce_by_key must widen
    group keys back to the exact u64 packing so cross-batch merges agree."""
    rng = np.random.RandomState(3)
    n = 2000
    v1 = rng.randint(0, 200, n).astype(np.int32)       # SmallEnum: 16 bits
    v2 = rng.randint(0, 2, n).astype(bool)             # Bool: 1 bit
    b1 = rng.rand(n) > 0.1
    b2 = rng.rand(n) > 0.1
    mask = rng.rand(n) > 0.2
    from aresdb_tpu.common import data_types as mdt

    dim_vals = [K._Val(jnp.asarray(v1), jnp.asarray(b1)),
                K._Val(jnp.asarray(v2), jnp.asarray(b2))]
    types = [mdt.SmallEnum, mdt.Bool]
    keys32 = K.pack_dim_keys(dim_vals, types, jnp.asarray(mask))
    assert keys32.dtype == jnp.uint32

    out32 = K.reduce_by_key(keys32, jnp.asarray(np.ones(n, np.float32)),
                            jnp.asarray(np.ones(n, bool)), "sum", True, 128)
    out64 = K.reduce_by_key(keys32.astype(jnp.uint64) |
                            jnp.where(keys32 == K.SENTINEL32,
                                      jnp.uint64(K.SENTINEL64), jnp.uint64(0)),
                            jnp.asarray(np.ones(n, np.float32)),
                            jnp.asarray(np.ones(n, bool)), "sum", True, 128)
    assert out32[0].dtype == jnp.uint64
    assert np.array_equal(np.asarray(out32[0]), np.asarray(out64[0]))
    assert np.array_equal(np.asarray(out32[3]), np.asarray(out64[3]))
    # u64(narrow key) must equal the wide packing bit-for-bit
    # (round-4 layout: per dim the 1 VALID bit sits BELOW the value bits —
    # SmallEnum packs 1 valid + 8 value bits, Bool packs 1 + 1)
    wide = np.asarray(keys32.astype(jnp.uint64))
    # the u32 sentinel widens to 0xFFFFFFFF; reduce_by_key re-sentinels
    # group keys on output, so only in-mask keys must match bit-for-bit
    wide = np.where(wide == np.uint64(K.SENTINEL32), K.SENTINEL64, wide)
    lo = (np.asarray(v1).astype(np.uint64) & np.uint64(0xFF))
    expect = np.uint64(1) * b1  # dim-1 valid bit at bit 0
    expect = expect | (np.where(b1, lo, 0) << np.uint64(1))
    expect = expect | (np.uint64(1) << np.uint64(9)) * b2
    expect = expect | ((np.asarray(v2).astype(np.uint64) & np.uint64(1))
                       * b2 << np.uint64(10))
    expect = np.where(mask, expect, K.SENTINEL64)
    # null dims zero their value bits
    assert np.array_equal(wide, expect)


@pytest.mark.parametrize("agg", ["sum", "count", "avg"])
def test_runtime_dense_matches_sort_path(agg, monkeypatch):
    """The adaptive runtime-dense branch (small live key ranges -> factored
    MXU reduction) must produce the same group table as the sort pipeline."""
    from aresdb_tpu.common import data_types as mdt

    rng = np.random.RandomState(5)
    n, kg = 20000, 256
    # two dims: Uint32 time bucket with a huge base (static pack 50 bits,
    # runtime range tiny) + Uint16 city
    tbucket = (1_600_000_000 + rng.randint(0, 20, n) * 3600).astype(np.uint64)
    city = rng.randint(0, 50, n).astype(np.uint64)
    tvalid = rng.rand(n) > 0.05
    cvalid = rng.rand(n) > 0.05
    key = jnp.zeros(n, jnp.uint64)
    key = key | jnp.asarray(np.where(tvalid, tbucket, 0))
    key = key | (jnp.asarray(tvalid).astype(jnp.uint64) << jnp.uint64(32))
    key = key | (jnp.asarray(np.where(cvalid, city, 0)) << jnp.uint64(33))
    key = key | (jnp.asarray(cvalid).astype(jnp.uint64) << jnp.uint64(49))
    keys = np.asarray(key).copy()
    keys[rng.rand(n) < 0.1] = K.SENTINEL64
    mval = rng.rand(n).astype(np.float32) * 10
    mvalid = rng.rand(n) > 0.15

    class _V:
        def __init__(self, value, valid):
            self.value = value
            self.valid = valid

    dim_vals = [
        _V(jnp.asarray(np.where(tvalid, tbucket, 0).astype(np.uint32)),
           jnp.asarray(tvalid)),
        _V(jnp.asarray(np.where(cvalid, city, 0).astype(np.uint32)),
           jnp.asarray(cvalid)),
    ]
    dim_types = [mdt.Uint32, mdt.Uint16]

    outs = []
    for flag in ("1", "0"):
        monkeypatch.setenv("ARES_RTDENSE", flag)
        out = K.reduce_by_key(jnp.asarray(keys), jnp.asarray(mval),
                              jnp.asarray(mvalid), agg, True, kg,
                              dim_vals, dim_types=dim_types, sortpack=True)
        outs.append(out)
    (k1, u1, a1, c1, g1, dv1, db1), (k0, u0, a0, c0, g0, dv0, db0) = outs
    assert np.array_equal(np.asarray(k0), np.asarray(k1))
    assert np.array_equal(np.asarray(u0), np.asarray(u1))
    assert int(g0) == int(g1)
    assert np.array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1),
                               rtol=3e-4, atol=1e-3)
    for a, b in zip(dv0, dv1):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(db0, db1):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_runtime_dense_falls_back_on_wide_ranges(monkeypatch):
    """id-like keys (full 32-bit range) must take the sort branch and agree
    with ARES_RTDENSE=0."""
    from aresdb_tpu.common import data_types as mdt

    rng = np.random.RandomState(9)
    n, kg = 8192, 8192
    ids = rng.randint(0, 1 << 31, n).astype(np.uint64)
    key = jnp.asarray(ids) | (jnp.uint64(1) << jnp.uint64(32))
    keys = np.asarray(key)
    mval = rng.rand(n).astype(np.float32)
    mvalid = np.ones(n, bool)

    class _V:
        def __init__(self, value, valid):
            self.value = value
            self.valid = valid

    dim_vals = [_V(jnp.asarray(ids.astype(np.uint32)),
                   jnp.ones(n, bool))]
    outs = []
    for flag in ("1", "0"):
        monkeypatch.setenv("ARES_RTDENSE", flag)
        out = K.reduce_by_key(jnp.asarray(keys), jnp.asarray(mval),
                              jnp.asarray(mvalid), "sum", True, kg,
                              dim_vals, dim_types=[mdt.Uint32],
                              sortpack=True)
        outs.append(out)
    for a, b in zip(outs[0][:5], outs[1][:5]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_packed_sort_nan_measure_semantics():
    """The widened 1-op packed sort carries measure validity IN the
    measure lane: invalid rows canonicalize to the reserved quiet -NaN
    0xFFFFFFFF, and a VALID measure with exactly those bits remaps to
    another quiet -NaN — the group sum must still be NaN (poisoning kept)
    and the count must still include the row."""
    n = 4096
    rng = np.random.RandomState(5)
    keys = jnp.asarray(rng.randint(0, 7, n).astype(np.uint64))
    mval_np = rng.rand(n).astype(np.float32)
    # group 3: one valid reserved-payload NaN; group 5: one invalid row
    g3 = int(np.nonzero(np.asarray(keys) == 3)[0][0])
    mval_np[g3] = np.uint32(0xFFFFFFFF).view(np.float32)
    mvalid_np = np.ones(n, bool)
    g5 = np.nonzero(np.asarray(keys) == 5)[0][:4]
    mvalid_np[g5] = False
    out = K._reduce_by_key_sorted(
        keys, jnp.asarray(mval_np), jnp.asarray(mvalid_np),
        "sum", True, 16, sortpack=True)
    gkeys, slot_used, aggv, cnt = (np.asarray(x) for x in out[:4])
    n_groups = int(out[4])
    assert n_groups == 7
    per_key = {int(gkeys[i]): i for i in range(7)}
    # group 3: NaN poisons the sum, count includes the NaN row
    assert np.isnan(aggv[per_key[3]])
    assert cnt[per_key[3]] == (np.asarray(keys) == 3).sum()
    # group 5: invalid rows dropped from count and sum
    k5 = np.asarray(keys) == 5
    assert cnt[per_key[5]] == k5.sum() - 4
    expect5 = mval_np[k5 & mvalid_np].astype(np.float64).sum()
    assert abs(aggv[per_key[5]] - expect5) < 1e-3
    # every other group sums exactly (within f32) and counts exactly
    for k in (0, 1, 2, 4, 6):
        kk = np.asarray(keys) == k
        ok = kk & mvalid_np
        ok[g3] = False  # only relevant for group 3
        expect = mval_np[kk & mvalid_np]
        if k != 3:
            assert abs(aggv[per_key[k]]
                       - expect.astype(np.float64).sum()) < 1e-3
        assert cnt[per_key[k]] == (kk & mvalid_np).sum()
