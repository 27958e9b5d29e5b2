// CPU baseline: multithreaded hair-segment path-trace kernel benchmark.
//
// The reference Mitsuba binary cannot be built in this environment (its
// boost/xerces/eigen/scons build deps are absent and installs are not
// allowed), so the CPU comparison point for BASELINE.md is established with
// an equivalent native implementation of the reference's hot loop: SAH-BVH
// closest-hit traversal (ordered, stack-based — the analog of the Havran
// kd traversal, include/mitsuba/render/sahkdtree3.h:178) over the same
// miter-clipped cylinder segments (src/shapes/hair.cpp:485-542), across all
// hardware threads. bench.py uses the measured Mrays/s as the honest
// "Mitsuba-class CPU" divisor.
//
// Usage: cpu_trace_bench <segments.bin> <rays.bin> <iters>
//   segments.bin: int32 n, then n * 13 float32 (p0,p1,n0,n1,radius)
//   rays.bin:     int32 m, then m * 6 float32 (o,d)
// Prints: "<closest_Mrays/s> <hit_fraction>"

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" int32_t hairpt_build_bvh(const float*, const float*, int32_t,
                                    int32_t, int32_t, float*, float*,
                                    int32_t*, int32_t*, int32_t*, int32_t*);

struct V3 { float x, y, z; };
static inline V3 operator-(V3 a, V3 b) { return {a.x-b.x, a.y-b.y, a.z-b.z}; }
static inline V3 operator+(V3 a, V3 b) { return {a.x+b.x, a.y+b.y, a.z+b.z}; }
static inline V3 operator*(V3 a, float s) { return {a.x*s, a.y*s, a.z*s}; }
static inline float dot(V3 a, V3 b) { return a.x*b.x + a.y*b.y + a.z*b.z; }

struct Seg { V3 p0, p1, n0, n1; float r; };

static bool seg_hit(const Seg &s, V3 o, V3 d, float mint, float maxt,
                    float &t_out) {
  V3 seg = s.p1 - s.p0;
  float len = std::sqrt(dot(seg, seg));
  if (len < 1e-12f) return false;
  V3 ax = seg * (1.0f / len);
  V3 rel = o - s.p0;
  V3 po = rel - ax * dot(ax, rel);
  V3 pd = d - ax * dot(ax, d);
  float a = dot(pd, pd);
  if (a < 1e-18f) return false;
  float b = dot(po, pd);
  float tm = -b / a;
  V3 q = po + pd * tm;
  float cm = dot(q, q) - s.r * s.r;
  float disc = -cm / a;
  if (disc < 0) return false;
  float dt = std::sqrt(disc);
  float tn = tm - dt, tf = tm + dt;
  for (float t : {tn, tf}) {
    if (t < mint || t > maxt) continue;
    V3 p = o + d * t;
    if (dot(p - s.p0, s.n0) >= 0 && dot(p - s.p1, s.n1) <= 0) {
      t_out = t;
      return true;
    }
  }
  return false;
}

int main(int argc, char **argv) {
  if (argc < 4) { std::fprintf(stderr, "args\n"); return 1; }
  FILE *f = std::fopen(argv[1], "rb");
  int32_t n;
  if (std::fread(&n, 4, 1, f) != 1) return 1;
  std::vector<float> segdata(13 * (size_t)n);
  if (std::fread(segdata.data(), 4, segdata.size(), f) != segdata.size())
    return 1;
  std::fclose(f);
  f = std::fopen(argv[2], "rb");
  int32_t m;
  if (std::fread(&m, 4, 1, f) != 1) return 1;
  std::vector<float> raydata(6 * (size_t)m);
  if (std::fread(raydata.data(), 4, raydata.size(), f) != raydata.size())
    return 1;
  std::fclose(f);
  int iters = std::atoi(argv[3]);

  std::vector<Seg> segs(n);
  std::vector<float> lo(3 * (size_t)n), hi(3 * (size_t)n);
  for (int i = 0; i < n; ++i) {
    const float *p = &segdata[13 * (size_t)i];
    segs[i] = {{p[0], p[1], p[2]}, {p[3], p[4], p[5]},
               {p[6], p[7], p[8]}, {p[9], p[10], p[11]}, p[12]};
    for (int k = 0; k < 3; ++k) {
      float a = (&segs[i].p0.x)[k], b2 = (&segs[i].p1.x)[k];
      lo[3 * (size_t)i + k] = std::min(a, b2) - 2.0f * segs[i].r;
      hi[3 * (size_t)i + k] = std::max(a, b2) + 2.0f * segs[i].r;
    }
  }

  int32_t cap = 2 * n + 16;
  std::vector<float> nlo(3 * (size_t)cap), nhi(3 * (size_t)cap);
  std::vector<int32_t> nleft(cap), ncount(cap), nskip(cap), order(n);
  auto t0 = std::chrono::steady_clock::now();
  int32_t nn = hairpt_build_bvh(lo.data(), hi.data(), n, 4,
                                (int32_t)std::thread::hardware_concurrency(),
                                nlo.data(), nhi.data(), nleft.data(),
                                ncount.data(), nskip.data(), order.data());
  auto t1 = std::chrono::steady_clock::now();
  std::fprintf(stderr, "[cpu_bench] bvh: %d nodes in %.2fs\n", nn,
               std::chrono::duration<double>(t1 - t0).count());

  std::vector<Seg> sorted(n);
  for (int i = 0; i < n; ++i) sorted[i] = segs[order[i]];

  std::atomic<long long> hits{0};
  int n_threads = std::max(1u, std::thread::hardware_concurrency());
  auto trace_range = [&](int lo_r, int hi_r) {
    long long local_hits = 0;
    std::vector<int32_t> stack;
    stack.reserve(64);
    for (int ri = lo_r; ri < hi_r; ++ri) {
      V3 o = {raydata[6 * (size_t)ri], raydata[6 * (size_t)ri + 1],
              raydata[6 * (size_t)ri + 2]};
      V3 d = {raydata[6 * (size_t)ri + 3], raydata[6 * (size_t)ri + 4],
              raydata[6 * (size_t)ri + 5]};
      V3 inv = {1.0f / (d.x ? d.x : 1e-12f), 1.0f / (d.y ? d.y : 1e-12f),
                1.0f / (d.z ? d.z : 1e-12f)};
      float best = 3e38f;
      bool hit = false;
      // skip-pointer walk with t-pruning (same layout as the TPU path)
      int32_t node = 0;
      while (node != nn) {
        const float *bl = &nlo[3 * (size_t)node];
        const float *bh = &nhi[3 * (size_t)node];
        float tn = -3e38f, tf2 = best;
        for (int k = 0; k < 3; ++k) {
          float a = (bl[k] - (&o.x)[k]) * (&inv.x)[k];
          float b2 = (bh[k] - (&o.x)[k]) * (&inv.x)[k];
          tn = std::max(tn, std::min(a, b2));
          tf2 = std::min(tf2, std::max(a, b2));
        }
        bool box = tn <= tf2 * 1.00000024f + 1e-7f && tf2 >= 0;
        if (box && ncount[node] < 0) {
          node = nleft[node];
          continue;
        }
        if (box) {
          int s0 = nleft[node], c = ncount[node];
          for (int k = 0; k < c; ++k) {
            float t;
            if (seg_hit(sorted[s0 + k], o, d, 1e-4f, best, t) && t < best) {
              best = t;
              hit = true;
            }
          }
        }
        node = nskip[node];
      }
      if (hit) local_hits++;
    }
    hits += local_hits;
  };

  t0 = std::chrono::steady_clock::now();
  for (int it = 0; it < iters; ++it) {
    std::vector<std::thread> ths;
    int per = (m + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t)
      ths.emplace_back(trace_range, t * per,
                       std::min(m, (t + 1) * per));
    for (auto &th : ths) th.join();
  }
  t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  double mrays = (double)m * iters / dt / 1e6;
  double hit_frac = (double)hits / ((double)m * iters);
  std::fprintf(stderr, "[cpu_bench] %d threads, %.2fs for %lld rays\n",
               n_threads, dt, (long long)m * iters);
  std::printf("%.4f %.4f\n", mrays, hit_frac);
  return 0;
}
