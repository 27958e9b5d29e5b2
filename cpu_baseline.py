"""Measure the native-CPU hair-tracing baseline on this machine.

The reference Mitsuba binary cannot be built here (missing boost/xerces/
eigen/scons; installs disallowed), so the CPU comparison point demanded by
BASELINE.md is established with csrc/cpu_trace_bench.cpp — an equivalent
multithreaded native implementation of the reference's hot loop (SAH BVH +
miter-cylinder intersection) over the same furball workload.

Writes BASELINE_CPU.json: {"cpu_mrays": N, ...}. bench.py divides by this
when present.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def main():
    from hairpt.scene import hairgen

    quality = float(os.environ.get("BENCH_QUALITY", "14.0"))
    fs = hairgen.gen_furball(n_fibers=int(6000 * quality),
                             radius=0.00216667)
    segs = hairgen.segments(fs)
    n = len(segs["p0"])
    segdata = np.concatenate([segs["p0"], segs["p1"], segs["n0"],
                              segs["n1"], segs["radius"][:, None]],
                             axis=1).astype(np.float32)

    # furball camera rays (matches bench.py's framing), 256x256
    res = int(os.environ.get("BENCH_RES", "1024"))
    cam_to_world = np.array([
        [-0.704024, 0.0939171, 0.703939, -10.6677],
        [1.05829e-08, 0.991217, -0.132245, 14.3141],
        [-0.710177, -0.0931033, -0.69784, 10.2879],
        [0, 0, 0, 1]])
    t = np.tan(np.radians(35.0) / 2.0)
    i, j = np.meshgrid(np.arange(res) + 0.5, np.arange(res) + 0.5)
    u = i / res
    v = j / res
    d_cam = np.stack([(1 - 2 * u) * t, (1 - 2 * v) * t,
                      np.ones_like(u)], -1).reshape(-1, 3)
    d_cam /= np.linalg.norm(d_cam, axis=-1, keepdims=True)
    d = d_cam @ cam_to_world[:3, :3].T
    o = np.broadcast_to(cam_to_world[:3, 3], d.shape)
    raydata = np.concatenate([o, d], axis=1).astype(np.float32)

    seg_path = "/tmp/cpu_bench_segs.bin"
    ray_path = "/tmp/cpu_bench_rays.bin"
    with open(seg_path, "wb") as f:
        f.write(np.int32(n).tobytes())
        f.write(segdata.tobytes())
    with open(ray_path, "wb") as f:
        f.write(np.int32(len(raydata)).tobytes())
        f.write(raydata.tobytes())

    exe = os.path.join(ROOT, "csrc", "cpu_trace_bench")
    subprocess.run(["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
                    "-o", exe,
                    os.path.join(ROOT, "csrc", "cpu_trace_bench.cpp"),
                    os.path.join(ROOT, "csrc", "bvh_builder.cpp")],
                   check=True)
    iters = int(os.environ.get("CPU_BENCH_ITERS", "4"))
    out = subprocess.run([exe, seg_path, ray_path, str(iters)],
                         check=True, capture_output=True, text=True)
    sys.stderr.write(out.stderr)
    vals = [float(x) for x in out.stdout.split()]
    mrays, hit_frac = vals[0], vals[1]
    e2e_mrays = vals[2] if len(vals) > 2 else None
    avg_bounces = vals[3] if len(vals) > 3 else None
    result = {
        "cpu_mrays": mrays,
        "hit_fraction": hit_frac,
        "cpu_e2e_mrays": e2e_mrays,
        "e2e_avg_bounces": avg_bounces,
        "segments": int(n),
        "rays": int(len(raydata)),
        "threads": os.cpu_count(),
        "note": "native multithreaded SAH-BVH miter-cylinder closest-hit + "
                "full NEE path-trace e2e loop (sun shadow rays, RR d>=5), "
                "AVX-vectorized SoA leaf tests (triaccel_sse.h counterpart); "
                "reference Mitsuba binary unbuildable here — see docstring",
    }
    with open(os.path.join(ROOT, "BASELINE_CPU.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
