"""Primary-key index parity (memstore/cuckoo_index_test.go), run against
BOTH the native C++ cuckoo index and the python fallback."""

import struct

import pytest

from aresdb_tpu.memstore.common import RecordID
from aresdb_tpu.memstore.primary_key import PrimaryKey


def _impls():
    impls = [("python", lambda kb, et: PrimaryKey(kb, has_event_time=et))]
    try:
        from aresdb_tpu import native
        from aresdb_tpu.memstore.native_primary_key import NativePrimaryKey
        if native.available():
            impls.append(
                ("native", lambda kb, et: NativePrimaryKey(kb,
                                                           has_event_time=et)))
            impls.append(
                ("native2", lambda kb, et: NativePrimaryKey(
                    kb, has_event_time=et, parts=2)))
    except Exception:
        pass
    return impls


@pytest.fixture(params=_impls(), ids=lambda p: p[0])
def make_pk(request):
    return request.param[1]


def _key(i):
    return struct.pack("<I", i)


def test_insert_with_future_ttl_found(make_pk):
    pk = make_pk(4, True)
    pk.update_event_time_cutoff(0)
    rec = RecordID(1, 1)
    pk.find_or_insert(b"abcd", rec, 1)
    found, v = pk.find_or_insert(b"abcd", rec, 1)
    assert found and v == rec


def test_insert_with_ttl_in_past_errors(make_pk):
    """Inserting an event time below the cutoff is an error — the row
    belongs to backfill (cuckoo_index_test.go:44)."""
    pk = make_pk(4, True)
    pk.update_event_time_cutoff(1)
    with pytest.raises(ValueError):
        pk.find_or_insert(b"abcd", RecordID(1, 1), 0)


def test_existing_key_returns_original_record(make_pk):
    pk = make_pk(4, True)
    r1, r2 = RecordID(1, 1), RecordID(2, 2)
    found, v = pk.find_or_insert(b"abcd", r1, 1)
    assert not found and v == r1
    found, v = pk.find_or_insert(b"abcd", r2, 1)
    assert found and v == r1


def test_delete_makes_key_missing(make_pk):
    pk = make_pk(4, True)
    pk.find_or_insert(b"abcd", RecordID(1, 1), 1)
    pk.delete(b"abcd")
    assert pk.find(b"abcd") is None
    found, _ = pk.find_or_insert(b"abcd", RecordID(3, 3), 1)
    assert not found


def test_grows_past_initial_capacity(make_pk):
    pk = make_pk(4, True)
    n = 2000
    for i in range(n):
        found, _ = pk.find_or_insert(_key(i), RecordID(0, i), 1)
        assert not found
    assert len(pk) == n
    for i in range(n):
        found, v = pk.find_or_insert(_key(i), RecordID(9, 9), 1)
        assert found and v == RecordID(0, i)


def test_insert_expire_insert_delete_find(make_pk):
    """The full reference cycle (cuckoo_index_test.go:174)."""
    pk = make_pk(4, True)
    n = 2000
    for i in range(n // 2):
        found, _ = pk.find_or_insert(_key(i), RecordID(0, i), 1)
        assert not found
    assert len(pk) == n // 2

    pk.update_event_time_cutoff(2)  # expire the first half

    for i in range(n // 2, n):
        found, _ = pk.find_or_insert(_key(i), RecordID(0, i), 2)
        assert not found
    # first half expired: re-inserting reports NOT found
    for i in range(n // 2):
        found, _ = pk.find_or_insert(_key(i), RecordID(0, i), 2)
        assert not found
    # second half still found with original records
    for i in range(n // 2, n):
        found, v = pk.find_or_insert(_key(i), RecordID(0, i), 2)
        assert found and v == RecordID(0, i)

    for i in range(n):
        pk.delete(_key(i))
    for i in range(n):
        found, _ = pk.find_or_insert(_key(i), RecordID(0, 0), 2)
        assert not found


def test_update_existing_and_missing(make_pk):
    pk = make_pk(4, True)
    pk.find_or_insert(b"abcd", RecordID(1, 1), 1)
    assert pk.update(b"abcd", RecordID(5, 5))
    assert pk.find(b"abcd") == RecordID(5, 5)
    assert not pk.update(b"zzzz", RecordID(6, 6))


def test_uuid_sized_keys(make_pk):
    """16-byte (UUID) primary keys (cuckoo_index_test.go:376)."""
    pk = make_pk(16, False)
    keys = [struct.pack("<QQ", i, i * 7 + 1) for i in range(500)]
    for i, k in enumerate(keys):
        found, _ = pk.find_or_insert(k, RecordID(0, i), 0)
        assert not found
    for i, k in enumerate(keys):
        assert pk.find(k) == RecordID(0, i)
