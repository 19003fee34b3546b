#!/usr/bin/env python3
"""Build and run the reference C++ core to produce golden images + a CPU
baseline measurement.

The reference's committed v2 build is broken (SURVEY.md §0), so this drives
the *v1* pipeline (sources under /root/reference/old + bvh copy.*) — the
generation the GUI actually ran against. We compile it out-of-tree in /tmp
(read-only #include of the reference headers; nothing is copied into this
repo) behind a small driver main() written here that only calls the
reference's public API:

  * deterministic depth-1 render at pixel centers (hit -> emission,
    miss -> background, sqrt gamma) — the exact-comparison golden
  * full RayTracer::render(w, h, spp, depth) batches — the stochastic
    golden + Mrays/s wall-clock baseline

Outputs:
  tests/goldens/ref_depth1_{W}x{H}.npy       float32 (H, W, 3)
  tests/goldens/ref_render_{W}x{H}_{spp}spp.npy
  tests/goldens/ref_baseline.json            timing metadata
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
BUILD = "/tmp/refbuild"
GOLDENS = os.path.join(REPO, "tests", "goldens")

# Driver that exercises the reference v1 API only (scene data is the demo
# scene of interaction.py:293-355; camera pose of interaction.py:638-643).
MAIN_CPP = r"""
#include "raytracer_core.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

static Scene demo_scene() {
  Scene scene;
  scene.background_color = Vector3(0.05, 0.05, 0.1);
  struct Row { double cx, cy, cz, r, ar, ag, ab, met, rough, ex, ey, ez; };
  const Row rows[] = {
      {0, -100.5, 0, 100.0, 0.9, 0.9, 0.9, 0.0, 0.5, 0, 0, 0},
      {-2, 0.5, -3, 0.5, 0.9, 0.1, 0.1, 0.9, 0.1, 0, 0, 0},
      {0, 0.5, -3, 0.5, 0.1, 0.9, 0.1, 0.0, 0.3, 0, 0, 0},
      {2, 0.5, -3, 0.5, 0.1, 0.1, 0.9, 0.0, 0.0, 0, 0, 0},
      {-1, 0.3, -1.5, 0.3, 0.9, 0.9, 0.1, 0.5, 0.2, 0, 0, 0},
      {1, 0.3, -1.5, 0.3, 0.9, 0.1, 0.9, 0.2, 0.8, 0, 0, 0},
      {0, 3, -1, 0.3, 1, 1, 1, 0.0, 0.1, 10, 10, 8},
      {-2, 2, 0, 0.2, 1, 1, 1, 0.0, 0.1, 5, 3, 2},
      {2, 2, 0, 0.2, 1, 1, 1, 0.0, 0.1, 2, 3, 5},
  };
  int id = 0;
  for (const Row& r : rows) {
    Sphere s;
    s.center = Vector3(r.cx, r.cy, r.cz);
    s.radius = r.r;
    s.material.albedo = Vector3(r.ar, r.ag, r.ab);
    s.material.metallic = r.met;
    s.material.roughness = r.rough;
    s.material.emission = Vector3(r.ex, r.ey, r.ez);
    s.object_id = id++;
    scene.add_sphere(s);
  }
  scene.build_bvh();
  return scene;
}

static Camera demo_camera(int w, int h) {
  Camera cam;
  cam.position = Vector3(0, 2, 5);
  cam.target = Vector3(0, 0, -1);
  cam.up = Vector3(0, 1, 0);
  cam.fov = 45.0;
  cam.aspect_ratio = double(w) / h;
  return cam;
}

int main(int argc, char** argv) {
  const std::string mode = argv[1];
  const int w = atoi(argv[2]);
  const int h = atoi(argv[3]);
  const char* out_path = argv[4];

  Scene scene = demo_scene();
  Camera cam = demo_camera(w, h);
  std::vector<float> img(size_t(w) * h * 3);

  if (mode == "depth1") {
    // deterministic: pixel centers, first hit -> emission, miss -> bg
    for (int j = 0; j < h; ++j) {
      for (int i = 0; i < w; ++i) {
        const double u = (i + 0.5) / w;
        const double v = (j + 0.5) / h;
        Ray ray = cam.get_ray(u, v);
        HitRecord rec;
        Vector3 c = scene.hit(ray, 1e-3, 1e10, rec) ? rec.material.emission
                                                    : scene.background_color;
        const size_t idx = (size_t(j) * w + i) * 3;
        img[idx + 0] = float(std::min(1.0, std::max(0.0, std::sqrt(std::max(0.0, c.x)))));
        img[idx + 1] = float(std::min(1.0, std::max(0.0, std::sqrt(std::max(0.0, c.y)))));
        img[idx + 2] = float(std::min(1.0, std::max(0.0, std::sqrt(std::max(0.0, c.z)))));
      }
    }
  } else if (mode == "avg") {
    // mean of n_batches independent render() calls (the thread-local RNG
    // state advances across calls, so batches are independent draws) —
    // the variance-reduced golden for RMSE-of-means parity.
    const int spp = atoi(argv[5]);
    const int depth = atoi(argv[6]);
    const int n_batches = atoi(argv[7]);
    RayTracer tracer;
    tracer.set_scene(scene);
    tracer.set_camera(cam);
    std::vector<double> acc(size_t(w) * h * 3, 0.0);
    const auto t0 = std::chrono::high_resolution_clock::now();
    for (int b = 0; b < n_batches; ++b) {
      std::vector<double> result = tracer.render(w, h, spp, depth);
      for (size_t k = 0; k < acc.size(); ++k) acc[k] += result[k];
      if ((b + 1) % 64 == 0) fprintf(stderr, "BATCH %d/%d\n", b + 1, n_batches);
    }
    const auto t1 = std::chrono::high_resolution_clock::now();
    const double secs =
        std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count() * 1e-6;
    fprintf(stderr, "RENDER_SECONDS %.6f\n", secs);
    for (size_t k = 0; k < img.size(); ++k)
      img[k] = float(acc[k] / n_batches);
  } else {  // full render: mode == spp count
    const int spp = atoi(mode.c_str());
    const int depth = atoi(argv[5]);
    RayTracer tracer;
    tracer.set_scene(scene);
    tracer.set_camera(cam);
    const auto t0 = std::chrono::high_resolution_clock::now();
    std::vector<double> result = tracer.render(w, h, spp, depth);
    const auto t1 = std::chrono::high_resolution_clock::now();
    const double secs =
        std::chrono::duration_cast<std::chrono::microseconds>(t1 - t0).count() * 1e-6;
    fprintf(stderr, "RENDER_SECONDS %.6f\n", secs);
    for (size_t k = 0; k < img.size(); ++k) img[k] = float(result[k]);
  }

  FILE* f = fopen(out_path, "wb");
  fwrite(img.data(), sizeof(float), img.size(), f);
  fclose(f);
  return 0;
}
"""


def build() -> str:
    os.makedirs(BUILD, exist_ok=True)
    # The v1 sources live under names with spaces; symlink to sane names.
    links = {
        "raytracer_core.h": f"{REF}/old/raytracer_core copy.h",
        "raytracer_core.cpp": f"{REF}/old/raytracer_core copy.cpp",
        "bvh.h": f"{REF}/old/bvh copy.h",
        "bvh.cpp": f"{REF}/old/bvh copy.cpp",
    }
    for name, target in links.items():
        path = os.path.join(BUILD, name)
        if not os.path.islink(path):
            os.symlink(target, path)
    with open(os.path.join(BUILD, "main.cpp"), "w") as f:
        f.write(MAIN_CPP)
    exe = os.path.join(BUILD, "refmain")
    cmd = [
        "g++", "-O3", "-march=native", "-ffast-math", "-fopenmp",
        "-funroll-loops", "-std=c++17",
        "main.cpp", "raytracer_core.cpp", "bvh.cpp", "-o", exe,
    ]
    subprocess.run(cmd, cwd=BUILD, check=True, capture_output=True, text=True)
    return exe


def run(exe, mode, w, h, out, depth=None):
    args = [exe, str(mode), str(w), str(h), out]
    if depth is not None:
        args.append(str(depth))
    proc = subprocess.run(args, check=True, capture_output=True, text=True)
    secs = None
    for line in proc.stderr.splitlines():
        if line.startswith("RENDER_SECONDS"):
            secs = float(line.split()[1])
    img = np.fromfile(out, np.float32).reshape(h, w, 3)
    return img, secs


def main():
    os.makedirs(GOLDENS, exist_ok=True)
    exe = build()
    print(f"built {exe}")

    meta = {"source": "reference v1 pipeline (old/ sources)",
            "flags": "-O3 -march=native -ffast-math -fopenmp", "runs": {}}

    # deterministic depth-1 golden
    w, h = 160, 120
    img, _ = run(exe, "depth1", w, h, f"{BUILD}/depth1.bin")
    np.save(f"{GOLDENS}/ref_depth1_{w}x{h}.npy", img)
    print(f"depth1 golden {w}x{h}: mean {img.mean():.4f}")

    # stochastic goldens + timing
    for (w, h, spp, depth) in [(160, 120, 512, 4), (640, 480, 8, 4)]:
        img, secs = run(exe, spp, w, h, f"{BUILD}/r{w}x{h}.bin", depth)
        np.save(f"{GOLDENS}/ref_render_{w}x{h}_{spp}spp.npy", img)
        prim = w * h * spp
        meta["runs"][f"{w}x{h}_{spp}spp_d{depth}"] = {
            "seconds": secs,
            "primary_rays": prim,
            "primary_mrays_per_s": prim / secs / 1e6,
        }
        print(f"render {w}x{h}@{spp}spp d{depth}: {secs:.2f}s "
              f"= {prim / secs / 1e6:.2f} primary Mrays/s")

    import multiprocessing

    meta["cpu_count"] = multiprocessing.cpu_count()
    with open(f"{GOLDENS}/ref_baseline.json", "w") as f:
        json.dump(meta, f, indent=2)
    print("wrote", f"{GOLDENS}/ref_baseline.json")


if __name__ == "__main__":
    sys.exit(main())
