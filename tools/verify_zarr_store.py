#!/usr/bin/env python3
"""Independent Zarr v3 sharded-store reader (external-interop cross-check).

Implements the *published* Zarr v3 spec from scratch — zarr.json parsing,
`sharding_indexed` byte format (end-located index of (offset,len) u64-LE
pairs + CRC32C), default chunk-key encoding `c/<t>/<c>/<z>/<y>/<x>`,
gzip inner codec via stdlib — with NO code shared with the Scala writer.
A store this reads correctly is readable by any spec-conforming
implementation (python `zarr`/`tensorstore` are not installable in this
container; this is the independent reader standing in for them).

Verifies a store produced from the synthetic fixtures: every voxel must
equal the FIXTURES.md content contract
  v(z,y,x,l) = ((z*73856093) ^ (y*19349663) ^ (x*83492791) ^ (l*2654435761)) mod 65536.
Requires the store to be written with codec=gzip (zstd is not decodable
with the python stdlib).

Usage: verify_zarr_store.py <store.ome.zarr> <level> [<level> ...]
Exit 0 = every voxel of every requested level matched.
"""
import glob
import gzip
import json
import os
import struct
import sys

import numpy as np

# CRC32C (Castagnoli), table-driven — stdlib zlib.crc32 is CRC32/IEEE.
_TBL = []
for i in range(256):
    c = i
    for _ in range(8):
        c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
    _TBL.append(c)


def crc32c(data):
    c = 0xFFFFFFFF
    for b in data:
        c = _TBL[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def expected(shape, level):
    z, y, x = np.meshgrid(
        np.arange(shape[0], dtype=np.int64),
        np.arange(shape[1], dtype=np.int64),
        np.arange(shape[2], dtype=np.int64), indexing="ij")
    v = (z * 73856093) ^ (y * 19349663) ^ (x * 83492791) ^ (level * 2654435761)
    return (v % 65536).astype(np.uint16)


def read_level(level_dir):
    meta = json.load(open(f"{level_dir}/zarr.json"))
    assert meta["zarr_format"] == 3 and meta["node_type"] == "array"
    assert meta["data_type"] == "uint16"
    shape = meta["shape"]
    shard = meta["chunk_grid"]["configuration"]["chunk_shape"]
    sharding = meta["codecs"][0]
    assert sharding["name"] == "sharding_indexed"
    cfg = sharding["configuration"]
    chunk = cfg["chunk_shape"]
    assert cfg["index_location"] == "end"
    assert cfg["index_codecs"][-1]["name"] == "crc32c"
    inner = {c["name"] for c in cfg["codecs"]}
    assert "gzip" in inner, f"store must be gzip-coded for stdlib decode, got {inner}"
    sep = meta["chunk_key_encoding"]["configuration"]["separator"]
    # 5-D (T,C,Z,Y,X) with T=C=1 — work in the trailing 3 dims
    sz, sy, sx = shard[2:]
    cz, cy, cx = chunk[2:]
    Z, Y, X = shape[2:]
    out = np.zeros((Z, Y, X), dtype=np.uint16)
    grid = (sz // cz, sy // cy, sx // cx)
    n_chunks = grid[0] * grid[1] * grid[2]
    for f in glob.glob(f"{level_dir}/c/*/*/*/*/*"):
        parts = f[len(level_dir) + 1:].split(sep)
        _, _, gz_, gy_, gx_ = (int(p) for p in parts[1:])
        blob = open(f, "rb").read()
        idx_len = n_chunks * 16
        idx = blob[-idx_len - 4:-4]
        (crc_stored,) = struct.unpack("<I", blob[-4:])
        assert crc32c(idx) == crc_stored, f"{f}: index CRC32C mismatch"
        ci = 0
        for icz in range(grid[0]):
            for icy in range(grid[1]):
                for icx in range(grid[2]):
                    off, ln = struct.unpack_from("<QQ", idx, ci * 16)
                    ci += 1
                    if off == 0xFFFFFFFFFFFFFFFF:
                        continue
                    raw = gzip.decompress(blob[off:off + ln])
                    cdata = np.frombuffer(raw, dtype="<u2").reshape(cz, cy, cx)
                    z0 = gz_ * sz + icz * cz
                    y0 = gy_ * sy + icy * cy
                    x0 = gx_ * sx + icx * cx
                    zh = min(cz, Z - z0); yh = min(cy, Y - y0); xh = min(cx, X - x0)
                    if zh <= 0 or yh <= 0 or xh <= 0:
                        continue
                    out[z0:z0 + zh, y0:y0 + yh, x0:x0 + xh] = cdata[:zh, :yh, :xh]
    return out, (Z, Y, X)


def main():
    store, levels = sys.argv[1], [int(a) for a in sys.argv[2:]]
    ok = True
    for lvl in levels:
        got, shape = read_level(os.path.join(store, str(lvl)))
        want = expected(shape, lvl)
        n_bad = int((got != want).sum())
        print(f"level {lvl}: shape {shape}, {n_bad} mismatching voxels "
              f"of {want.size}", flush=True)
        ok &= n_bad == 0
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
