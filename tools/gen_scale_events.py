#!/usr/bin/env python3
"""Deterministic big event/orders fixtures for the salted-dispatch 2×2
(VERDICT r13 lead 2). The round-13 2×2 that set the `spark.graft.events
.salted=auto` policy used ad-hoc 10M-event fixtures that were not
committed, so neither their row-group layout nor their distributions
were auditable. This generator reproduces them reproducibly, writing
through the shared `write_split` helper so the files are guaranteed
splittable (single-row-group parquet serializes the scan onto one task
— see pq_write.py).

Two modes, identical except for the user distribution:
  skewed  — one hot user holds 30 % of events; 100k cold users share the
            rest uniformly (the "30 % hot user" cell of the 2×2)
  uniform — 100k users, uniform (max share ~1e-5)

Schemas mirror the driver's sf tables exactly (events: event_id, ts
timestamp[us], user_id, event_type, value, props; orders: o_orderkey,
o_custkey, o_orderstatus, o_totalprice, o_orderdate timestamp[us],
o_orderpriority), so every registered q_b* query runs unchanged. Orders
users follow the same distribution as events (a hot user is hot on both
sides of the as-of join). Seed fixed; byte-identical re-runs.

Usage: gen_scale_events.py <outdir> <skewed|uniform> [n_events=10000000]
Other tables should be symlinked from sf0.1 if needed.
"""
import os
import sys

import numpy as np
import pyarrow as pa

from pq_write import write_split

SEED = 7042
N_USERS = 100_000
HOT_SHARE = 0.30
SPAN_US = 30 * 24 * 3600 * 1_000_000  # 30 days
T0_US = 1_700_000_000_000_000


def user_ids(rng, n, mode):
    # both modes consume IDENTICAL rng draws so every other column
    # (ts, types, values) is byte-identical between the two fixtures —
    # the "identical except user distribution" claim is literal
    cold = rng.integers(2, 2 + N_USERS, size=n, dtype=np.int64)
    hot = rng.random(n) < HOT_SHARE
    if mode == "uniform":
        return cold
    return np.where(hot, np.int64(1), cold)


def gen_events(rng, n, mode):
    ts = T0_US + rng.integers(0, SPAN_US, size=n, dtype=np.int64)
    types = np.array(["click", "view", "scroll", "purchase"])
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(user_ids(rng, n, mode)),
        "event_type": pa.array(types[rng.integers(0, 4, size=n)]),
        "value": pa.array(rng.random(n) * 100.0),
        "props": pa.array(np.full(n, "{}")),
    })


def gen_orders(rng, n, mode):
    odate = T0_US + rng.integers(0, SPAN_US, size=n, dtype=np.int64)
    status = np.array(["O", "F", "P"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    return pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(user_ids(rng, n, mode)),
        "o_orderstatus": pa.array(status[rng.integers(0, 3, size=n)]),
        "o_totalprice": pa.array(rng.random(n) * 1000.0),
        "o_orderdate": pa.array(odate, type=pa.timestamp("us")),
        "o_orderpriority": pa.array(prio[rng.integers(0, 5, size=n)]),
    })


def main():
    outdir, mode = sys.argv[1], sys.argv[2]
    assert mode in ("skewed", "uniform"), mode
    n_events = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    n_orders = n_events // 10
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    ev = gen_events(rng, n_events, mode)
    od = gen_orders(rng, n_orders, mode)
    # 256k-row groups: a ~250 MB events file splits into ~12+ groups of
    # well under the 16 MB maxPartitionBytes (write_split asserts this)
    rgs_e = write_split(ev, os.path.join(outdir, "events.parquet"),
                        row_group_size=262_144)
    rgs_o = write_split(od, os.path.join(outdir, "orders.parquet"),
                        row_group_size=262_144)
    print(f"wrote {ev.num_rows} events ({rgs_e} rgs), "
          f"{od.num_rows} orders ({rgs_o} rgs) to {outdir} [{mode}]")


if __name__ == "__main__":
    main()
