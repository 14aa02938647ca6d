"""Binary HLL wire format: golden parity vs the reference test data plus
serializer/parser round trips.

Reference goldens: /root/reference/testing/data/query/hll* (written by
query/hll_test.go, parsed by query/common/hll_test.go:105-180). Read at test
time from the read-only reference checkout; skipped when absent.
"""

import os

import numpy as np
import pytest

from aresdb_tpu.common import data_types as mdt
from aresdb_tpu.query import hll_wire as W

GOLDEN_DIR = "/root/reference/testing/data/query"

needs_goldens = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not available")


def _golden(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# golden parity
# ---------------------------------------------------------------------------

@needs_goldens
def test_parse_golden_hll_block():
    """Parse the raw HLLData golden block (query/common/hll_test.go:105)."""
    data = _golden("hll")
    res = W.parse_hll_block(data)
    assert set(res.keys()) == {"NULL", "1", "4294967295"}
    leaf = res["NULL"]["NULL"]["NULL"]
    assert isinstance(leaf, W.HLL)
    assert leaf.non_zero_registers == 3
    assert leaf.sparse_data == [(1, 255), (2, 254), (3, 253)]
    dense = res["1"]["c"]["2"]
    assert dense.dense_data is not None
    assert dense.non_zero_registers == 2
    sparse = res["4294967295"]["d"]["514"]
    assert sparse.sparse_data == [(255, 1), (254, 2), (253, 3), (252, 4)]


@needs_goldens
def test_parse_golden_query_results():
    """hll_query_results = one result + one error (hll_test.go:238-271)."""
    data = _golden("hll_query_results")
    results, errors = W.parse_hll_query_results(data)
    assert len(results) == 2 and len(errors) == 2
    assert errors[0] is None and errors[1] == "test"
    assert results[1] is None
    assert set(results[0].keys()) == {"NULL", "1", "4294967295"}


@needs_goldens
def test_parse_golden_empty_results():
    data = _golden("hll_empty_results")
    results, errors = W.parse_hll_query_results(data)
    assert results == [{}] and errors == [None]


@needs_goldens
def test_reserialize_golden_framing():
    """Re-framing the golden block through HLLQueryResults reproduces the
    hll_query_results golden byte-for-byte."""
    block = _golden("hll")
    out = W.HLLQueryResults()
    out.write_result(block)
    out.write_error("test")
    assert out.get_bytes() == _golden("hll_query_results")


@needs_goldens
def test_empty_results_bytes():
    out = W.HLLQueryResults()
    out.write_result(b"")
    assert out.get_bytes() == _golden("hll_empty_results")


@needs_goldens
def test_golden_block_roundtrip_through_own_serializer():
    """Parse the golden, re-serialize with our writer, re-parse: identical
    logical content (byte layout may differ only in enum-dict coverage —
    production writes one entry per dim; the golden has a single entry)."""
    data = _golden("hll")
    res = W.parse_hll_block(data)
    specs = [
        W.HLLDimensionSpec(data_type=mdt.Uint32),
        W.HLLDimensionSpec(data_type=mdt.Uint8,
                           enum_dict=["a", "b", "c", "d"]),
        W.HLLDimensionSpec(data_type=mdt.Int16),
    ]
    rows = []
    for k0, v0 in res.items():
        for k1, v1 in v0.items():
            for k2, hll in v1.items():
                dims = []
                valids = []
                for key, dt in ((k0, mdt.Uint32), (k1, mdt.Uint8),
                                (k2, mdt.Int16)):
                    if key == "NULL":
                        dims.append(0)
                        valids.append(False)
                    elif key == "c":
                        dims.append(2)
                        valids.append(True)
                    elif key == "d":
                        dims.append(3)
                        valids.append(True)
                    else:
                        dims.append(int(key))
                        valids.append(True)
                rows.append((dims, valids, hll))
    block = W.serialize_hll_block(rows, specs)
    res2 = W.parse_hll_block(block)
    assert res2 == res  # HLL.__eq__ compares registers


# ---------------------------------------------------------------------------
# round trips
# ---------------------------------------------------------------------------

def test_roundtrip_sparse_dense_mixed():
    regs_sparse = np.zeros(16384, np.uint8)
    regs_sparse[[5, 77, 16383]] = [3, 9, 51]
    regs_dense = (np.arange(16384) % 7).astype(np.uint8)  # >4096 non-zero
    specs = [W.HLLDimensionSpec(data_type=mdt.Uint32, is_time=True),
             W.HLLDimensionSpec(data_type=mdt.SmallEnum,
                                enum_dict=["x", "y"])]
    rows = [
        ([1600000000, 0], [True, True], W.HLL.from_registers(regs_sparse)),
        ([1600003600, 1], [True, True], W.HLL.from_registers(regs_dense)),
        ([0, 0], [False, False], W.HLL.from_registers(regs_sparse)),
    ]
    block = W.serialize_hll_block(rows, specs)
    assert len(block) % 8 == 0
    res = W.parse_hll_block(block)
    assert res["1600000000"]["x"] == W.HLL.from_registers(regs_sparse)
    assert res["1600003600"]["y"] == W.HLL.from_registers(regs_dense)
    assert res["NULL"]["NULL"] == W.HLL.from_registers(regs_sparse)


def test_roundtrip_all_widths():
    """One dim of every width: UUID(16) Int64(8) Uint32(4) Uint16(2)
    Uint8(1)."""
    specs = [W.HLLDimensionSpec(data_type=mdt.Uint8),
             W.HLLDimensionSpec(data_type=mdt.UUID),
             W.HLLDimensionSpec(data_type=mdt.Uint16),
             W.HLLDimensionSpec(data_type=mdt.Int64),
             W.HLLDimensionSpec(data_type=mdt.Float32)]
    assert W.dimension_vector_index(specs) == [4, 0, 3, 1, 2]
    regs = np.zeros(16384, np.uint8)
    regs[42] = 7
    hll = W.HLL.from_registers(regs)
    rows = [([7, np.array([0x1122334455667788, 0x99aabbccddeeff00],
                          np.uint64), 300, -12345, 1.5],
             [True] * 5, hll)]
    res = W.parse_hll_block(W.serialize_hll_block(rows, specs))
    node = res["7"]
    (k1, node2), = node.items()
    assert k1 == mdt.uuid_to_string(0x1122334455667788, 0x99aabbccddeeff00)
    assert node2["300"]["-12345"]["1.5"] == hll


def test_error_framing_roundtrip():
    out = W.HLLQueryResults()
    out.write_error("boom!!!!")  # len 8 → triggers the 8-byte padding quirk
    out.write_error("x")
    out.write_result(b"")
    results, errors = W.parse_hll_query_results(out.get_bytes())
    assert errors == ["boom!!!!", "x", None]
    assert results == [None, None, {}]


def test_merge_and_compute():
    a = np.zeros(16384, np.uint8)
    b = np.zeros(16384, np.uint8)
    a[:100] = 5
    b[50:150] = 7
    ha, hb = W.HLL.from_registers(a), W.HLL.from_registers(b)
    merged = ha.merge(hb)
    assert merged.registers()[0] == 5
    assert merged.registers()[60] == 7
    assert merged.non_zero_registers == 150
    tree_a = {"k": {"x": ha}}
    tree_b = {"k": {"x": hb, "y": hb}}
    W.merge_hll_trees(tree_a, tree_b)
    assert tree_a["k"]["x"] == merged
    est = W.compute_hll_result(tree_a)
    from aresdb_tpu.query import hll as H
    assert est["k"]["x"] == H.compute_estimate(merged.registers())
    assert est["k"]["y"] == H.compute_estimate(b)


def test_old_magic_parse():
    """V1 header layout differs (parseOldTimeseriesHLLResult)."""
    import struct
    # build a minimal V1 block by hand: one uint32 dim, one row, one sparse
    block = bytearray()
    block += bytes([1, 0, 0, 0])        # four/two/one-byte counts, 0 enums
    block += struct.pack("<II", 1, 8)   # result_size, padded dim len
    block += b"\x00" * 4                # v1 skip
    block += bytes([0]) + b"\x00" * 7   # dim indexes + pad
    block += struct.pack("<I", mdt.Uint32) + b"\x00" * 4
    block += struct.pack("<I", 77) + bytes([1]) + b"\x00" * 3  # dim vector
    block += struct.pack("<H", 1) + b"\x00" * 6  # count vector
    block += struct.pack("<I", (9 << 16) | 123) + b"\x00" * 4
    out = bytearray(struct.pack("<I4x", W.HLL_MAGIC_V1))
    out += struct.pack("<IB3x", len(block), 0)
    out += block
    results, errors = W.parse_hll_query_results(bytes(out))
    assert errors == [None]
    assert results[0]["77"].sparse_data == [(123, 9)]
