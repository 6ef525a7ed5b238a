"""Catalog lifecycle: governed cache sizing + in-place-rewrite invalidation."""

from __future__ import annotations

import os
import shutil

from cdc_example_spark.sources.catalog import _dataset_mb, invalidate_tables, load_table


def test_dataset_mb_handles_directory_datasets(tmp_path):
    # Spark/Hive-written tables are DIRECTORIES; os.path.getsize on one
    # returns the ~4KB dirent, which must not classify a big table as
    # cacheable. _dataset_mb walks, and early-exits past the ceiling.
    d = tmp_path / "t.parquet" / "part=a"
    d.mkdir(parents=True)
    (d / "f1.bin").write_bytes(b"\0" * (1 << 20))
    (d / "f2.bin").write_bytes(b"\0" * (1 << 20))
    assert _dataset_mb(str(tmp_path / "t.parquet"), stop_after_mb=100) == 2
    # early exit still reports "over the ceiling"
    assert _dataset_mb(str(tmp_path / "t.parquet"), stop_after_mb=0) >= 1
    # plain file path still works
    f = tmp_path / "plain.parquet"
    f.write_bytes(b"\0" * (3 << 20))
    assert _dataset_mb(str(f), stop_after_mb=100) == 3


def test_invalidate_tables_sees_in_place_rewrite(spark, sf_dir, tmp_path):
    # Without invalidation, the persisted handle + snapshotted file
    # listing keep serving old rows after the file changes on disk.
    src = os.path.join(sf_dir, "region.parquet")
    work = str(tmp_path / "data")
    os.makedirs(work)
    shutil.copy(src, os.path.join(work, "region.parquet"))

    before = load_table(spark, work, "region")
    n_before = before.count()
    assert n_before > 0

    # rewrite in place: keep only one row
    one = spark.read.parquet(src).limit(1).toPandas()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(one), os.path.join(work, "region.parquet"))

    invalidate_tables(spark, work)
    after = load_table(spark, work, "region")
    assert after.count() == 1


def test_time_columns_load_as_timestamp_ltz(spark, sf_dir):
    # The driver's parquet carries NAIVE timestamp[us] columns, which
    # Spark 4 would infer as TIMESTAMP_NTZ — a type unix_micros/window/
    # watermark all reject. load_table pins inferTimestampNTZ off (at
    # the SESSION CONF level so the driver's vanilla session gets it
    # too); under the UTC session the scan then yields TimestampType
    # wall-clock-identical to DuckDB's naive read.
    for table, col in (("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        dt = dict(load_table(spark, sf_dir, table).dtypes)[col]
        assert dt == "timestamp", (table, col, dt)
