#!/usr/bin/env python3
"""Shared splittable-parquet writer for perf fixtures (VERDICT r13 lead 2).

The trap this guards: Spark assigns a task the ROW GROUPS whose byte
midpoint falls inside its split, so a single-row-group parquet file is
UNSPLITTABLE no matter what `maxPartitionBytes` says — a fixture written
that way serializes every map-only stage onto one task and the sweep
measures single-thread scaling (this silently skewed every scan-bound
exponent until round 13 caught it on gen_scale_docs).

Every fixture generator writes through `write_split`, which (a) forces a
bounded row-group size and (b) ASSERTS post-write that the produced
layout is actually splittable: multiple row groups whenever the rows
allow it, and mean row-group bytes under the session's 16 MB
`maxPartitionBytes` whenever the file is big enough for splitting to
matter.
"""
import os

import pyarrow.parquet as pq

MAX_PARTITION_BYTES = 16 * 1024 * 1024  # keep in sync with GraftSession


def write_split(table, path, row_group_size=8192):
    pq.write_table(table, path, row_group_size=row_group_size)
    f = pq.ParquetFile(path)
    n_rgs = f.num_row_groups
    expect = (table.num_rows + row_group_size - 1) // row_group_size
    assert n_rgs >= min(expect, 2), (
        f"{path}: {n_rgs} row groups for {table.num_rows} rows at "
        f"row_group_size={row_group_size} — writer ignored the setting; "
        f"the file is unsplittable for Spark")
    fbytes = os.path.getsize(path)
    if fbytes > 2 * MAX_PARTITION_BYTES:
        assert fbytes / n_rgs <= MAX_PARTITION_BYTES, (
            f"{path}: mean row group {fbytes / n_rgs / 1e6:.1f} MB exceeds "
            f"maxPartitionBytes={MAX_PARTITION_BYTES} — shrink "
            f"row_group_size or the scan will under-parallelize")
    return n_rgs
