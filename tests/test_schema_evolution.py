"""Schema evolution across parquet generations (SURVEY §1.3).

Generation 1 and generation 2 of a table differ by an added and a
dropped column; a mergeSchema read must expose the union schema with
nulls where a generation lacks the column, and a plain single-generation
read must stay unaffected.
"""

from __future__ import annotations

import pytest

from parquet_demo_spark.io import read_table, read_table_evolved, write_table


def test_merge_schema_add_and_drop_column(spark, tmp_path):
    gen1 = str(tmp_path / "gen1")
    gen2 = str(tmp_path / "gen2")
    # gen1 has `legacy`, gen2 drops it and adds `added`
    write_table(
        spark,
        gen1,
        "id bigint, name string, legacy double",
        [
            {"id": 1, "name": "a", "legacy": 1.5},
            {"id": 2, "name": "b", "legacy": 2.5},
        ],
    )
    write_table(
        spark,
        gen2,
        "id bigint, name string, added bigint",
        [
            {"id": 3, "name": "c", "added": 30},
            {"id": 4, "name": "d", "added": 40},
        ],
    )

    df = read_table_evolved(spark, gen1, gen2)
    assert set(df.columns) == {"id", "name", "legacy", "added"}
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 4
    # old generation: added column null; new generation: dropped col null
    assert rows[1].legacy == 1.5 and rows[1].added is None
    assert rows[3].added == 30 and rows[3].legacy is None


def test_merge_schema_rejects_type_conflicts(spark, tmp_path):
    """Type changes are NOT silently widened: INT32 vs INT64 for the
    same column must fail loudly (explicit re-type migrations only)."""
    gen1 = str(tmp_path / "gen1")
    gen2 = str(tmp_path / "gen2")
    write_table(spark, gen1, "id int, v int", [{"id": 1, "v": 10}])
    write_table(spark, gen2, "id bigint, v bigint", [{"id": 2, "v": 20}])
    with pytest.raises(Exception, match="(?i)merg"):
        read_table_evolved(spark, gen1, gen2)
    # the explicit-schema escape hatch reads both generations widened
    df = spark.read.schema("id bigint, v bigint").parquet(gen1, gen2)
    assert sorted(r.v for r in df.collect()) == [10, 20]


def test_single_generation_read_unchanged(spark, tmp_path):
    gen1 = str(tmp_path / "gen1")
    write_table(spark, gen1, "id bigint, name string", [{"id": 1, "name": "a"}])
    assert read_table(spark, gen1).columns == ["id", "name"]
