"""Schema validator parity tests (reference metastore/validator_test.go
behaviors over metastore/validator.go:27)."""

import copy

import pytest

from aresdb_tpu.common.schema import Table
from aresdb_tpu.metastore.validator import validate_table

BASE = {
    "name": "trips",
    "columns": [
        {"name": "request_at", "type": "Uint32"},
        {"name": "id", "type": "Uint32"},
        {"name": "city", "type": "Uint16"},
        {"name": "fare", "type": "Float32"},
    ],
    "primaryKeyColumns": [1],
    "isFactTable": True,
    "archivingSortColumns": [2],
    "config": {"batchSize": 64},
}


def tbl(**mut):
    d = copy.deepcopy(BASE)
    d.update(mut)
    return Table.from_json(d)


def col(name, type_, **extra):
    return {"name": name, "type": type_, **extra}


def err(match, **mut):
    with pytest.raises(ValueError, match=match):
        validate_table(tbl(**mut))


# -- individual schema -------------------------------------------------------

def test_valid_base():
    validate_table(tbl())


def test_empty_name():
    err("name", name="")


def test_no_columns():
    err("column", columns=[], primaryKeyColumns=[])


def test_duplicate_column_name_even_deleted():
    err("duplicate column name", columns=[
        col("request_at", "Uint32"),
        col("id", "Uint32", deleted=True),
        col("id", "Uint32")], primaryKeyColumns=[2])


def test_bad_data_type():
    err("Uint31", columns=[col("request_at", "Uint32"), col("x", "Uint31")])


def test_fact_time_column_must_be_uint32():
    err("Uint32 event time", columns=[
        col("request_at", "Int64"), col("id", "Uint32")])


def test_time_column_no_default():
    err("time column does not allow default", columns=[
        col("request_at", "Uint32", defaultValue="0"),
        col("id", "Uint32")])


def test_time_column_no_hll():
    err("time column does not allow hll", columns=[
        col("request_at", "Uint32", hllConfig={"isHLLColumn": True}),
        col("id", "Uint32")])


def test_hll_column_type_restricted():
    err("not allowed for fast hll", columns=[
        col("request_at", "Uint32"),
        col("id", "Uint32"),
        col("x", "Uint16", hllConfig={"isHLLColumn": True})])
    # allowed types pass
    for t in ("Uint32", "Int32", "Int64", "UUID"):
        validate_table(tbl(columns=[
            col("request_at", "Uint32"), col("id", "Uint32"),
            col("x", t, hllConfig={"isHLLColumn": True})],
            archivingSortColumns=[]))


def test_hll_column_no_default():
    err("hll column does not allow default", columns=[
        col("request_at", "Uint32"), col("id", "Uint32"),
        col("x", "Uint32", hllConfig={"isHLLColumn": True},
            defaultValue="1")])


def test_bad_default_value():
    err("invalid default value", columns=[
        col("request_at", "Uint32"), col("id", "Uint32"),
        col("x", "Int16", defaultValue="banana")])


def test_enum_default_value_ok():
    validate_table(tbl(columns=[
        col("request_at", "Uint32"), col("id", "Uint32"),
        col("status", "SmallEnum", defaultValue="unknown")],
        archivingSortColumns=[]))


def test_all_columns_deleted():
    err("deleted", columns=[
        col("request_at", "Uint32", deleted=True)], primaryKeyColumns=[],
        isFactTable=False, archivingSortColumns=[])


def test_missing_primary_key():
    err("primary key", primaryKeyColumns=[])


def test_pk_out_of_range():
    err("out of range", primaryKeyColumns=[9])


def test_pk_deleted_column():
    err("deleted", columns=[
        col("request_at", "Uint32"),
        col("id", "Uint32", deleted=True)], primaryKeyColumns=[1])


def test_pk_duplicate():
    err("duplicate primary key", primaryKeyColumns=[1, 1])


def test_pk_array_type():
    err("array column cannot be primary key", columns=[
        col("request_at", "Uint32"), col("tags", "SmallEnum[]")],
        primaryKeyColumns=[1])


def test_sort_column_out_of_range():
    err("sort column id 9 out of range", archivingSortColumns=[9])


def test_sort_column_duplicate():
    err("duplicate sort column", archivingSortColumns=[2, 2])


def test_sort_column_array():
    err("array column cannot be a sort column", columns=[
        col("request_at", "Uint32"), col("id", "Uint32"),
        col("tags", "SmallEnum[]")], archivingSortColumns=[2])


def test_dimension_table_no_sort_columns():
    err("dimension tables have no archiving sort",
        isFactTable=False,
        columns=[col("id", "Uint32"), col("name", "BigEnum")],
        primaryKeyColumns=[0], archivingSortColumns=[1])


def test_batch_size_positive():
    err("batchSize", config={"batchSize": 0})


# -- schema evolution --------------------------------------------------------

def up_err(match, **mut):
    with pytest.raises(ValueError, match=match):
        validate_table(tbl(**mut), old=tbl())


def test_update_same_schema_ok():
    validate_table(tbl(), old=tbl())


def test_update_add_column_ok():
    new = copy.deepcopy(BASE)
    new["columns"].append(col("tip", "Float32"))
    validate_table(Table.from_json(new), old=tbl())


def test_update_append_sort_column_ok():
    new = copy.deepcopy(BASE)
    new["archivingSortColumns"] = [2, 3]
    validate_table(Table.from_json(new), old=tbl())


def test_update_cannot_change_type():
    up_err("cannot change table type", isFactTable=False,
           archivingSortColumns=[])


def test_update_cannot_remove_columns():
    up_err("cannot remove columns", columns=[
        col("request_at", "Uint32"), col("id", "Uint32")],
        archivingSortColumns=[])


def test_update_cannot_mutate_column_type():
    up_err("cannot mutate column", columns=[
        col("request_at", "Uint32"), col("id", "Uint32"),
        col("city", "Uint32"), col("fare", "Float32")])


def test_update_cannot_rename_column():
    up_err("cannot mutate column", columns=[
        col("request_at", "Uint32"), col("id", "Uint32"),
        col("town", "Uint16"), col("fare", "Float32")])


def test_update_cannot_change_case_insensitivity():
    new = copy.deepcopy(BASE)
    new["columns"][2]["caseInsensitive"] = True
    up_err("cannot mutate column", columns=new["columns"])


def test_update_cannot_undelete():
    old = copy.deepcopy(BASE)
    old["columns"][3]["deleted"] = True
    old["archivingSortColumns"] = [2]
    with pytest.raises(ValueError, match="reuse deleted column"):
        validate_table(tbl(), old=Table.from_json(old))


def test_update_delete_column_ok():
    new = copy.deepcopy(BASE)
    new["columns"][3]["deleted"] = True
    validate_table(Table.from_json(new), old=tbl())


def test_update_cannot_change_pk():
    up_err("cannot change primary key", primaryKeyColumns=[2])


def test_update_sort_columns_prefix_only():
    up_err("appended", archivingSortColumns=[3])
    up_err("appended", archivingSortColumns=[])


def test_update_allow_missing_event_time_oneway():
    old = copy.deepcopy(BASE)
    old["config"]["allowMissingEventTime"] = True
    with pytest.raises(ValueError, match="allowMissingEventTime"):
        validate_table(tbl(), old=Table.from_json(old))
    # false -> true is fine
    new = copy.deepcopy(BASE)
    new["config"]["allowMissingEventTime"] = True
    validate_table(Table.from_json(new), old=tbl())
