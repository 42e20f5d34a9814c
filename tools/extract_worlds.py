#!/usr/bin/env python
"""Extract the lateral-collision world meshes from the reference description
package into assets/worlds.json (data mirror, like tools/extract_model.py for
the robot URDF).

Reads the binary STLs under qm_description/meshes/{mazes,tunnel,vchimney}
with the per-world URDF scale factors (qm_description/urdf/*/ *.xacro) and
writes triangle soups [T, 9] (v0, v1, v2 flattened, meters) per world.
Normals are recomputed from the winding (STL normal records are unreliable).

Usage: python tools/extract_worlds.py [reference_root]
"""
import json
import os
import struct
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "qm_door_tpu", "assets",
                   "worlds.json")

# (world name, mesh path, scale xyz) from qm_description/urdf/*/ *.xacro
WORLDS = [
    ("maze1", "meshes/mazes/maze_1.stl", (0.001, 0.001, 0.001)),
    ("maze2", "meshes/mazes/maze_2.stl", (0.001, 0.001, 0.001)),
    ("maze3", "meshes/mazes/maze_3.stl", (0.001, 0.001, 0.001)),
    ("maze4", "meshes/mazes/maze_4.stl", (0.001, 0.001, 0.001)),
    ("tunnel30", "meshes/tunnel/Tunnel30.stl", (0.0011, 0.001, 0.001)),
    ("tunnel40", "meshes/tunnel/Tunnel40.stl", (0.0011, 0.001, 0.001)),
    ("tunnel50", "meshes/tunnel/Tunnel50.stl", (0.0011, 0.001, 0.001)),
    ("tunnel60", "meshes/tunnel/Tunnel60.stl", (0.0011, 0.001, 0.001)),
    # TerrainTunnel.stl is an unfetched git-lfs pointer in the reference
    # checkout (133-byte stub) — tunnel terrain ground relief is covered by
    # sim/terrain.py height-fields instead.
    ("vchimney", "meshes/vchimney/VChimney.stl", (0.001, 0.001, 0.001)),
]


def read_stl_ascii(data, scale):
    tris, cur = [], []
    for line in data.decode("ascii", errors="ignore").splitlines():
        parts = line.split()
        if parts[:1] == ["vertex"]:
            v = [float(p) for p in parts[1:4]]
            cur.extend([round(v[0] * scale[0], 6),
                        round(v[1] * scale[1], 6),
                        round(v[2] * scale[2], 6)])
            if len(cur) == 9:
                tris.append(cur)
                cur = []
    return tris


def read_stl(path, scale):
    data = open(path, "rb").read()
    if data[:5] == b"solid" and b"facet" in data[:500]:
        return read_stl_ascii(data, scale)
    n = struct.unpack("<I", data[80:84])[0]
    tris = []
    for i in range(n):
        off = 84 + i * 50
        vals = struct.unpack("<12f", data[off:off + 48])
        tri = []
        for k in range(3):
            v = vals[3 + 3 * k: 6 + 3 * k]
            tri.extend([round(v[0] * scale[0], 6),
                        round(v[1] * scale[1], 6),
                        round(v[2] * scale[2], 6)])
        tris.append(tri)
    return tris


def main():
    base = os.path.join(REF, "qm_description")
    out = {}
    for name, rel, scale in WORLDS:
        path = os.path.join(base, rel)
        tris = read_stl(path, scale)
        out[name] = tris
        print(f"{name}: {len(tris)} triangles")
    with open(OUT, "w") as f:
        json.dump(out, f)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
