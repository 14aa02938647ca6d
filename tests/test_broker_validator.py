"""Broker fail-fast validation parity (broker/query_compiler_test.go).

Behavioral cases from the reference's broker compiler suite: unknown
main/join tables, the single-measure rule, measure parse failures,
non-aggregate measures, aggregate arity, and the application/hll
measure-function requirement — all rejected BEFORE scatter. Capability
deltas (IN handled natively, int64 transforms allowed on TPU lanes) are
documented in broker/validator.py.
"""

import pytest

from aresdb_tpu.broker.validator import (BrokerValidationError,
                                         validate_query)

TABLES = {"table1": {"name": "table1"}, "cities": {"name": "cities"}}


def _q(**kw):
    q = {"table": "table1",
         "measures": [{"sqlExpression": "count(*)"}],
         "dimensions": [{"sqlExpression": "c1"}]}
    q.update(kw)
    return q


def test_happy_path():
    validate_query(_q(), TABLES)


def test_unknown_main_table():
    # query_compiler_test.go:172 "should fail invalid table names"
    with pytest.raises(BrokerValidationError, match="unknown table"):
        validate_query(_q(table="tableNonExist"), TABLES)


def test_unknown_join_table():
    with pytest.raises(BrokerValidationError, match="unknown table"):
        validate_query(_q(joins=[{"table": "foreignTableNonExist"}]), TABLES)


def test_known_join_table_ok():
    validate_query(_q(joins=[{"table": "cities", "alias": "c"}]), TABLES)


def test_no_schema_view_skips_table_checks():
    # without a controller-synced view the datanode compiler still rejects
    validate_query(_q(table="whatever"), None)


def test_more_than_one_measure():
    # query_compiler_test.go:246 "should fail more than 1 measure"
    with pytest.raises(BrokerValidationError, match="exactly 1 measure"):
        validate_query(_q(measures=[{"sqlExpression": "count(*)"},
                                    {"sqlExpression": "sum(fare)"}]), TABLES)


def test_no_measures():
    with pytest.raises(BrokerValidationError, match="exactly 1 measure"):
        validate_query(_q(measures=[]), TABLES)


def test_measure_parse_failure():
    # query_compiler_test.go:274 "Failed to parse measure"
    with pytest.raises(BrokerValidationError, match="Failed to parse"):
        validate_query(_q(measures=[{"sqlExpression": "foo("}]), TABLES)


def test_non_aggregate_measure_rejected():
    # "expect aggregate function" for a comparison measure
    with pytest.raises(BrokerValidationError, match="expect aggregate"):
        validate_query(_q(measures=[{"sqlExpression": "1 = 2"}]), TABLES)
    with pytest.raises(BrokerValidationError, match="expect aggregate"):
        validate_query(_q(measures=[{"sqlExpression": "foo"}]), TABLES)


def test_non_agg_numeric_literal_measure_ok():
    # non-aggregation queries use measure "1"
    validate_query(_q(measures=[{"sqlExpression": "1"}]), TABLES)


def test_aggregate_arity():
    # "expect 1 argument"
    with pytest.raises(BrokerValidationError, match="expect 1 argument"):
        validate_query(_q(measures=[{"sqlExpression": "sum(f1, f2)"}]),
                       TABLES)


def test_hll_binary_requires_hll_measure():
    # "expect hll aggregate function" when Accept: application/hll
    with pytest.raises(BrokerValidationError, match="expect hll aggregate"):
        validate_query(_q(), TABLES, hll_binary=True)
    validate_query(_q(measures=[{"sqlExpression": "countdistincthll(id)"}]),
                   TABLES, hll_binary=True)
    validate_query(_q(measures=[{"sqlExpression": "hll(id_hll)"}]),
                   TABLES, hll_binary=True)


def test_broker_server_rejects_before_scatter():
    """End-to-end: a BrokerServer with a schema view rejects an unknown
    table locally (no datanodes exist to answer, so reaching the scatter
    path would produce a different 'no available host' error)."""
    import requests

    from aresdb_tpu.broker.server import BrokerServer
    from aresdb_tpu.cluster.topology import StaticTopology

    class View:
        def tables(self):
            return TABLES

    topo = StaticTopology([])
    srv = BrokerServer(topo, schema_view=View())
    port = srv.start_background()
    try:
        r = requests.post(f"http://localhost:{port}/query/aql",
                          json={"queries": [dict(_q(table="nope"))]})
        body = r.json()
        assert body["errors"] and "unknown table" in body["errors"][0]
    finally:
        srv.stop()
