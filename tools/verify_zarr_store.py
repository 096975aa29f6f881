#!/usr/bin/env python3
"""Independent Zarr v2 + v3 store reader (external-interop cross-check).

Implements the *published* specs from scratch with NO code shared with
the Scala writer:
- Zarr v3: zarr.json parsing, `sharding_indexed` byte format
  (end-located index of (offset,len) u64-LE pairs + CRC32C), default
  chunk-key encoding `c/<t>/<c>/<z>/<y>/<x>`, gzip inner codec via
  stdlib.
- Zarr v2: `.zarray`/`.zattrs`/`.zgroup` parsing, flat (`z.y.x`) and
  nested (`z/y/x`, dimension_separator "/") chunk keys, and the
  c-blosc1 chunk container decoded from its published byte format
  (16-byte header: version/versionlz/flags/typesize + nbytes/blocksize/
  cbytes i32-LE; block-start offsets; per-block [clen u32][payload];
  memcpy + byte-shuffle filters). Requires cname=zlib so the inner
  streams decode with the python stdlib.

A store this reads correctly is readable by any spec-conforming
implementation (python `zarr`/`tensorstore` are not installable in this
container; this is the independent reader standing in for them).

Verifies a store produced from the synthetic fixtures: every voxel must
equal the FIXTURES.md content contract
  v(z,y,x,l) = ((z*73856093) ^ (y*19349663) ^ (x*83492791) ^ (l*2654435761)) mod 65536.
Requires v3 stores written with codec=gzip and v2 stores with blosc
cname=zlib (zstd is not decodable with the python stdlib).

Usage: verify_zarr_store.py <store.ome.zarr> <level> [<level> ...]
Format (v2 vs v3) is auto-detected per level dir. Exit 0 = every voxel
of every requested level matched (and, for v2, the root .zgroup/.zattrs
metadata is well-formed).
"""
import glob
import gzip
import json
import os
import struct
import sys
import zlib

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


def blosc_decompress(blob, path):
    """Decode one c-blosc1 chunk from the published container format."""
    assert len(blob) >= 16, f"{path}: blosc chunk shorter than its header"
    version, versionlz, flags, typesize = blob[0], blob[1], blob[2], blob[3]
    nbytes, blocksize, cbytes = struct.unpack_from("<iii", blob, 4)
    assert version in (1, 2), f"{path}: unsupported blosc version {version}"
    assert cbytes == len(blob), \
        f"{path}: header cbytes {cbytes} != file size {len(blob)}"
    assert typesize >= 1, f"{path}: bad typesize {typesize}"
    memcpy = bool(flags & 0x2)
    byte_shuffle = bool(flags & 0x1)
    bit_shuffle = bool(flags & 0x4)
    dont_split = bool(flags & 0x10)
    ccode = (flags >> 5) & 0x7
    assert not bit_shuffle, f"{path}: bitshuffle not supported by this verifier"
    if memcpy:
        assert len(blob) == 16 + nbytes, f"{path}: bad memcpy chunk length"
        return blob[16:]
    # one stream per block (c-blosc >= 1.14 sets bit 4; the pre-1.14 split
    # layout of typesize streams per block is not implemented here)
    assert dont_split, f"{path}: split-block blosc layout not supported"
    # zlib is the only stdlib-decodable cname (codes: 0 blosclz, 1 lz4,
    # 2 snappy [legacy numbering varies], 3 zlib, 4 zstd)
    assert ccode == 3, \
        f"{path}: blosc ccode {ccode} not stdlib-decodable; write with cname=zlib"
    nblocks = (nbytes + blocksize - 1) // blocksize if blocksize else 0
    bstarts = struct.unpack_from(f"<{nblocks}i", blob, 16)
    out = bytearray(nbytes)
    for b in range(nblocks):
        off = b * blocksize
        blen = min(blocksize, nbytes - off)
        p = bstarts[b]
        (clen,) = struct.unpack_from("<i", blob, p)
        payload = blob[p + 4:p + 4 + clen]
        raw = bytes(payload) if clen == blen else zlib.decompress(payload)
        assert len(raw) == blen, f"{path}: block {b} expanded to {len(raw)}, want {blen}"
        if byte_shuffle and typesize > 1:
            # inverse of c-blosc shuffle: stream j holds every ts-th byte
            arr = np.frombuffer(raw, dtype=np.uint8)
            raw = arr.reshape(typesize, blen // typesize).T.tobytes()
        out[off:off + blen] = raw
    return bytes(out)


def read_level_v2(level_dir):
    """Reassemble one v2 level from its chunk files.

    NOTE: the chunk-file-count assertion below is a WRITER-SPECIFIC
    completeness check, not a Zarr v2 spec requirement — the spec allows
    omitting chunks that contain only the fill value, but this project's
    writer always materializes every chunk in the grid, so a missing file
    here means a lost write, not a legal sparse store.
    """
    meta = json.load(open(f"{level_dir}/.zarray"))
    assert meta["zarr_format"] == 2, f"bad zarr_format {meta['zarr_format']}"
    assert meta["dtype"] == "<u2", f"expected <u2 dtype, got {meta['dtype']}"
    assert meta["order"] == "C"
    comp = meta["compressor"]
    assert comp["id"] == "blosc", f"expected blosc compressor, got {comp['id']}"
    assert comp["shuffle"] in (0, 1), \
        f"verifier supports shuffle 0|1, got {comp['shuffle']}"
    sep = meta.get("dimension_separator", ".")
    assert sep in (".", "/"), f"bad dimension_separator {sep!r}"
    Z, Y, X = meta["shape"]
    cz, cy, cx = meta["chunks"]
    out = np.zeros((Z, Y, X), dtype=np.uint16)
    pattern = f"{level_dir}/*/*/*" if sep == "/" else f"{level_dir}/*.*.*"
    files = [f for f in glob.glob(pattern) if not os.path.basename(f).startswith(".")]
    grid = ((Z + cz - 1) // cz, (Y + cy - 1) // cy, (X + cx - 1) // cx)
    assert len(files) == grid[0] * grid[1] * grid[2], \
        f"{level_dir}: {len(files)} chunk files, grid wants {grid}"
    for f in files:
        rel = f[len(level_dir) + 1:]
        gz_, gy_, gx_ = (int(p) for p in rel.split(sep))
        raw = blosc_decompress(open(f, "rb").read(), f)
        # v2 chunks are always full chunk shape, fill-padded at the edges
        assert len(raw) == cz * cy * cx * 2, \
            f"{f}: decoded {len(raw)} bytes, want full chunk {cz * cy * cx * 2}"
        cdata = np.frombuffer(raw, dtype="<u2").reshape(cz, cy, cx)
        z0, y0, x0 = gz_ * cz, gy_ * cy, gx_ * cx
        zh = min(cz, Z - z0); yh = min(cy, Y - y0); xh = min(cx, X - x0)
        assert zh > 0 and yh > 0 and xh > 0, f"{f}: chunk outside array bounds"
        out[z0:z0 + zh, y0:y0 + yh, x0:x0 + xh] = cdata[:zh, :yh, :xh]
    return out, (Z, Y, X)


def check_v2_root(store):
    """Root metadata sanity for a v2 store: .zgroup + .zattrs ome block."""
    zgroup = json.load(open(os.path.join(store, ".zgroup")))
    assert zgroup["zarr_format"] == 2, f"bad .zgroup {zgroup}"
    zattrs = json.load(open(os.path.join(store, ".zattrs")))
    ms = zattrs["ome"]["multiscales"]
    assert ms and ms[0]["datasets"], ".zattrs ome.multiscales empty"
    for ds in ms[0]["datasets"]:
        ct = ds["coordinateTransformations"]
        assert any(t["type"] == "scale" and len(t["scale"]) == 5 for t in ct), \
            f".zattrs dataset {ds['path']} lacks a 5-d scale transform"
    print(f"v2 root metadata: .zgroup ok, .zattrs ome block ok "
          f"({len(ms[0]['datasets'])} datasets)", flush=True)


def main():
    store, levels = sys.argv[1], [int(a) for a in sys.argv[2:]]
    ok = True
    is_v2 = os.path.exists(os.path.join(store, ".zgroup"))
    if is_v2:
        check_v2_root(store)
    for lvl in levels:
        level_dir = os.path.join(store, str(lvl))
        if os.path.exists(f"{level_dir}/.zarray"):
            got, shape = read_level_v2(level_dir)
        else:
            got, shape = read_level(level_dir)
        want = expected(shape, lvl)
        n_bad = int((got != want).sum())
        print(f"level {lvl}: shape {shape}, {n_bad} mismatching voxels "
              f"of {want.size}", flush=True)
        ok &= n_bad == 0
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
