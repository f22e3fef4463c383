"""File/catalog sinks — the write-side complement of sources
(the reference only materializes in-memory via export; at 100 TB the
output of a pipeline is a partitioned columnar table, so these are
first-class here).

All sinks take the VISIBLE columns with display names (same frame
``export`` would produce) and return the input table so they compose in
a pipe: ``t >> write_parquet(path, partition_by=["dt"]) >> ...``.
"""

from __future__ import annotations

from ..operators.pipeable import verb
from ..table import Table

__all__ = ["write_parquet", "write_csv", "write_json", "write_orc",
           "save_as_table", "write_time_partitioned", "write_sorted"]


def _writer(table: Table, mode: str, partition_by, **options):
    w = table.to_spark().write.mode(mode).options(**options)
    if partition_by:
        if not isinstance(partition_by, (list, tuple)):
            partition_by = [partition_by]
        # accept Col/ColName/str like every other verb
        names = [
            table._cols[table._resolve_uuid(c)].name for c in partition_by
        ]
        w = w.partitionBy(*names)
    return w


@verb
def write_parquet(table: Table, path: str, *, mode: str = "error",
                  partition_by=None, **options) -> Table:
    """Columnar sink of choice: partition columns become directory keys
    (partition pruning on re-read), stats in footers drive predicate
    pushdown."""
    _writer(table, mode, partition_by, **options).parquet(path)
    return table


@verb
def write_csv(table: Table, path: str, *, mode: str = "error",
              partition_by=None, header: bool = True, **options) -> Table:
    _writer(table, mode, partition_by, header=header, **options).csv(path)
    return table


@verb
def write_json(table: Table, path: str, *, mode: str = "error",
               partition_by=None, **options) -> Table:
    _writer(table, mode, partition_by, **options).json(path)
    return table


@verb
def write_orc(table: Table, path: str, *, mode: str = "error",
              partition_by=None, **options) -> Table:
    _writer(table, mode, partition_by, **options).orc(path)
    return table


@verb
def save_as_table(table: Table, name: str, *, mode: str = "error",
                  partition_by=None, format: str | None = None,
                  bucket_by: tuple[int, list] | None = None,
                  sort_by=None, **options) -> Table:
    """Catalog sink (hive metastore / in-session catalog / iceberg when
    the catalog provides it).

    ``bucket_by=(n, cols)`` hash-buckets the table on write — two tables
    bucketed identically on their join key co-locate, so the join reads
    both WITHOUT a shuffle (the 100-TB fact-fact join strategy; see
    tests/test_bucketed_join.py for the plan proof).  ``sort_by`` sorts
    within each bucket, letting a sort-merge join skip its sort too.
    Bucketing requires a catalog table (Spark restriction), hence only
    here and not on the path-based sinks."""
    w = _writer(table, mode, partition_by, **options)
    if format:
        w = w.format(format)
    if bucket_by is not None:
        n, cols = bucket_by
        if not isinstance(cols, (list, tuple)):
            cols = [cols]
        names = [table._cols[table._resolve_uuid(c)].name for c in cols]
        w = w.bucketBy(n, *names)
        if sort_by is not None:
            if not isinstance(sort_by, (list, tuple)):
                sort_by = [sort_by]
            snames = [
                table._cols[table._resolve_uuid(c)].name for c in sort_by
            ]
            w = w.sortBy(*snames)
    w.saveAsTable(name)
    return table


@verb
def write_time_partitioned(table: Table, path: str, ts_col, *,
                           granularity: str = "day",
                           partition_col: str = "dt",
                           mode: str = "overwrite") -> Table:
    """Time-partitioned parquet sink: derives a coarse time key (day /
    month / hour) from ``ts_col`` and writes it as the partition column,
    so any date-bounded re-read prunes whole directories at the scan
    (PartitionFilters — metadata only, zero I/O for other days).  The
    100-TB layout for event/document corpora; plan proof in
    tests/test_time_partitioned.py."""
    from ..extras.events import write_time_partitioned as _wtp

    name = table._cols[table._resolve_uuid(ts_col)].name
    _wtp(table.to_spark(), path, ts_col=name, granularity=granularity,
         partition_col=partition_col, mode=mode)
    return table


@verb
def write_sorted(table: Table, path: str, sort_by, *,
                 mode: str = "overwrite", num_files: int | None = None,
                 descending: bool = False, **options) -> Table:
    """Globally range-sorted parquet sink: ONE range shuffle
    (repartitionByRange samples the key distribution so output files get
    balanced, non-overlapping key ranges) + an in-partition sort, then
    plain file writes.  The result is a total order across files: file
    i's key range ends before file i+1's begins, and parquet min/max
    footer stats per file are TIGHT, so any key-range predicate on
    re-read skips whole files (row-group stats pruning) — the cheap
    alternative to a partitioned directory layout when the sort key is
    continuous (timestamps, ids) rather than low-cardinality.
    Layout proof: tests/test_write_sorted.py asserts disjoint,
    ordered per-file ranges."""
    if not isinstance(sort_by, (list, tuple)):
        sort_by = [sort_by]
    names = [table._cols[table._resolve_uuid(c)].name for c in sort_by]
    from pyspark.sql import functions as F

    df = table.to_spark()
    cols = [F.col(n).desc() if descending else F.col(n).asc()
            for n in names]
    if num_files is not None:
        ranged = df.repartitionByRange(num_files, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    (
        ranged.sortWithinPartitions(*cols)
        .write.mode(mode).options(**options).parquet(path)
    )
    return table
