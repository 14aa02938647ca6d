"""Expression parser tests (parity: query/expr/parser_test.go behaviors)."""

import pytest

from aresdb_tpu.query import expr as E


def test_literals():
    e = E.parse("42")
    assert isinstance(e, E.NumberLiteral) and e.int_val == 42
    e = E.parse("3.5")
    assert isinstance(e, E.NumberLiteral) and e.val == 3.5 and e.type == E.FLOAT
    e = E.parse("'hello'")
    assert isinstance(e, E.StringLiteral) and e.val == "hello"
    e = E.parse("''")
    assert isinstance(e, E.StringLiteral) and e.val == ""
    e = E.parse("'it''s'")
    assert e.val == "it's"
    assert isinstance(E.parse("true"), E.BooleanLiteral)
    assert isinstance(E.parse("NULL"), E.NullLiteral)


def test_precedence():
    e = E.parse("1 + 2 * 3")
    assert isinstance(e, E.BinaryExpr) and e.op == "+"
    assert isinstance(e.rhs, E.BinaryExpr) and e.rhs.op == "*"

    e = E.parse("a = 1 AND b = 2 OR c = 3")
    assert e.op == "OR"
    assert e.lhs.op == "AND"


def test_comparison_and_logical():
    e = E.parse("status='completed'")
    assert e.op == "=" and isinstance(e.lhs, E.VarRef)
    assert isinstance(e.rhs, E.StringLiteral)

    e = E.parse("fare >= 2.5 AND NOT cancelled")
    assert e.op == "AND"
    assert isinstance(e.rhs, E.UnaryExpr) and e.rhs.op == "NOT"


def test_qualified_column():
    e = E.parse("c.name = 'SF'")
    assert e.lhs.val == "c.name"


def test_calls():
    e = E.parse("count(*)")
    assert isinstance(e, E.Call) and e.name == "count"
    assert isinstance(e.args[0], E.VarRef) and e.args[0].val == "*"

    e = E.parse("sum(fare)")
    assert e.name == "sum" and e.args[0].val == "fare"

    e = E.parse("countDistinctHLL(driver_uuid)")
    assert e.name == "countdistincthll"


def test_in_list():
    e = E.parse("city_id IN (1, 2, 3)")
    assert e.op == "IN"
    assert [a.int_val for a in e.rhs.args] == [1, 2, 3]

    e = E.parse("city_id NOT IN (4)")
    assert e.op == "NOT IN"


def test_is_null():
    e = E.parse("fare IS NULL")
    assert isinstance(e, E.UnaryExpr) and e.op == "IS_NULL"
    e = E.parse("fare IS NOT NULL")
    assert e.op == "IS_NOT_NULL"


def test_unary_minus_and_paren():
    e = E.parse("-(1 + 2)")
    assert isinstance(e, E.UnaryExpr) and e.op == "-"
    assert isinstance(e.expr, E.ParenExpr)


def test_case_when():
    e = E.parse("CASE WHEN fare > 10 THEN 1 ELSE 0 END")
    assert isinstance(e, E.Case)
    assert len(e.when_thens) == 1
    assert e.else_expr.int_val == 0


def test_array_subscript():
    e = E.parse("tags[0]")
    assert isinstance(e, E.Call) and e.name == E.ELEMENT_AT


def test_parse_errors():
    with pytest.raises(E.ExprParseError):
        E.parse("1 +")
    with pytest.raises(E.ExprParseError):
        E.parse("(1")
    with pytest.raises(E.ExprParseError):
        E.parse("a b c")
