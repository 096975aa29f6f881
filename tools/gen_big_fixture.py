#!/usr/bin/env python3
"""Generate the ≥1 GB conversion-throughput fixture (PERF.md).

Reuses the gen_fixtures.py HDF5 writer. Differences from the small test
fixtures:

- Size: level-0 true shape (1024, 1024, 1024) uint16 = 2 GiB raw, plus a
  translated pyramid (512³, 256³) — mirroring the reference benchmark's
  3-level conversion of a 9.63 GB tile
  (`tests/test_live_ims_to_zarr.py:866-875`).
- Content: the fixture hash v() computed on a YX-coarse (2×2) grid and
  repeated, so zlib finds the repetition and the file compresses ~2-3×
  like real microscopy tiles (the full-resolution hash is white noise —
  incompressible — which would make inflate trivially cheap and overstate
  throughput).
- Filters: gzip+shuffle, the real-world Imaris default.

Voxel values are NOT the small-fixture contract; perf runs only assert
shard counts/bytes, not voxel equality.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import gen_fixtures as gf  # noqa: E402


def smooth_voxels(shape, level, coarse=2):
    """Coarse-grid hash (smooth structure) XOR 8 bits of per-voxel noise
    (random low byte, structured high byte): zlib ratio ~2x with shuffle —
    the realistic range for microscopy uint16. Noise is seeded-PRNG per
    z-plane (deterministic; multiplicative-hash noise proved too
    structured — zlib still found 4x)."""
    z_n, y_n, x_n = shape
    cy = (y_n + coarse - 1) // coarse
    cx = (x_n + coarse - 1) // coarse
    y_col = (np.arange(cy, dtype=np.int64) * 19349663)[:, None]
    x_row = (np.arange(cx, dtype=np.int64) * 83492791)[None, :]
    out = np.empty(shape, dtype="<u2")
    plane = None
    for z in range(z_n):
        if plane is None or z % coarse == 0:
            v = (np.int64((z // coarse) * 73856093) ^ y_col ^ x_row
                 ^ np.int64(level * 2654435761))
            plane = (v % 65536).astype("<u2")
            plane = np.repeat(np.repeat(plane, coarse, axis=0), coarse, axis=1)
            plane = plane[:y_n, :x_n]
        rng = np.random.RandomState((level * 100003 + z) & 0x7FFFFFFF)
        noise = rng.randint(0, 256, size=(y_n, x_n)).astype("<u2")
        out[z] = plane ^ noise
    return out


def main(path):
    w = gf.Writer()
    levels = {}
    stored = [(1024, 1024, 1024), (512, 512, 512), (256, 256, 256)]
    chunk = (128, 256, 256)
    for lvl, st in enumerate(stored):
        print(f"level {lvl}: generating {st} ...", flush=True)
        data = smooth_voxels(st, lvl)
        print(f"level {lvl}: writing chunks ...", flush=True)
        ds = w.chunked_dataset(data, chunk, {"gzip", "shuffle"})
        del data
        ch = w.group({"Data": ds})
        tp = w.group({"Channel 0": ch})
        rl = w.group({"TimePoint 0": tp})
        levels[lvl] = rl
    dataset_grp = w.group({f"ResolutionLevel {l}": levels[l] for l in levels})
    tz, ty, tx = stored[0]
    image = w.group_with_attrs({
        "X": str(tx), "Y": str(ty), "Z": str(tz),
        "ExtMin0": "0.0", "ExtMin1": "0.0", "ExtMin2": "0.0",
        "ExtMax0": str(float(tx)), "ExtMax1": str(float(ty)),
        "ExtMax2": str(float(tz)), "Unit": "um",
    })
    info = w.group({"Image": image})
    w.finish({"DataSet": dataset_grp, "DataSetInfo": info}, path)
    raw = sum(s[0] * s[1] * s[2] * 2 for s in stored)
    print(f"wrote {path}: raw {raw / 1e9:.2f} GB, "
          f"file {os.path.getsize(path) / 1e9:.2f} GB "
          f"(ratio {raw / os.path.getsize(path):.2f}x)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ims_big/tile_big.ims")
