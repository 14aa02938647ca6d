"""Broker result-merge lattice — behavioral parity with
/root/reference/broker/result_merge_test.go (sum/count/min/max over
same-shape and different-shape nested dim trees, avg rejected at the
merge layer because the broker decomposes it into SUM+COUNT upstream)."""

import pytest

from aresdb_tpu.broker.executor import BrokerError, merge_results

CASES = [
    # (agg, lhs, rhs, expected) — result_merge_test.go:27-373
    ("sum", {"1234": {"foo": 123, "bar": 2}},
     {"1234": {"foo": 1, "bar": 1}},
     {"1234": {"foo": 124, "bar": 3}}),
    ("sum", {}, {}, {}),
    ("sum", {"1234": {"foo": 123}},
     {"1234": {"foo": 1, "bar": 1}},
     {"1234": {"foo": 124, "bar": 1}}),
    ("sum", {}, {"1234": {"foo": 1, "bar": 1}},
     {"1234": {"foo": 1, "bar": 1}}),
    ("sum", {"1234": {"foo": 123}}, {},
     {"1234": {"foo": 123}}),
    ("count", {"1234": {"foo": 2, "bar": 3}},
     {"1234": {"foo": 5, "bar": 7}},
     {"1234": {"foo": 7, "bar": 10}}),
    ("count", {"1234": {"foo": 2}},
     {"5678": {"foo": 5}},
     {"1234": {"foo": 2}, "5678": {"foo": 5}}),
    ("max", {"1234": {"foo": 123, "bar": 2}},
     {"1234": {"foo": 1, "bar": 7}},
     {"1234": {"foo": 123, "bar": 7}}),
    ("max", {"1234": {"foo": 123}},
     {"1234": {"bar": 7}},
     {"1234": {"foo": 123, "bar": 7}}),
    ("min", {"1234": {"foo": 123, "bar": 2}},
     {"1234": {"foo": 1, "bar": 7}},
     {"1234": {"foo": 1, "bar": 2}}),
    ("min", {}, {"1234": {"foo": 1}},
     {"1234": {"foo": 1}}),
    # deeper nesting (two dim levels)
    ("sum", {"a": {"x": {"": 1.5}}},
     {"a": {"x": {"": 2.5}, "y": {"": 1.0}}, "b": {"x": {"": 3.0}}},
     {"a": {"x": {"": 4.0}, "y": {"": 1.0}}, "b": {"x": {"": 3.0}}}),
]


@pytest.mark.parametrize("agg,lhs,rhs,expected", CASES)
def test_merge_lattice(agg, lhs, rhs, expected):
    assert merge_results(agg, [lhs, rhs]) == expected
    # merging is associative with more partials
    assert merge_results(agg, [lhs, {}, rhs]) == expected


def test_avg_rejected_at_merge_layer():
    """result_merge_test.go:407 'avg should error different shape' — the
    reference errors because AVG partials cannot merge; our broker
    decomposes AVG into SUM+COUNT before the scatter, so the merge layer
    rejects avg outright."""
    with pytest.raises(BrokerError):
        merge_results("avg", [{"a": 1.0}, {"a": 2.0}])
