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
// Prints: "<closest_Mrays/s> <hit_fraction> <e2e_Mrays/s> <avg_bounces>"
//
// The e2e phase runs a full NEE path-trace loop per camera ray —
// closest hit, hair shading frame, one sun shadow ray (any-hit with
// early exit, scene.cpp:840-843 analog), cosine-sampled bounce and
// Russian roulette from depth 5 (path.cpp:276-283 analog) — so the
// CPU divisor for BASELINE.md matches the TPU headline e2e metric
// (primary Mrays/s under the path-tracing workload), not just the
// closest-hit kernel.

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

// SoA segment layout, leaf-contiguous, with the unit axis precomputed
// (the reference pre-transforms its TriAccel rows the same way,
// include/mitsuba/render/triaccel.h:37; the SIMD leaf test below is the
// counterpart of its 4-ray SSE packets, triaccel_sse.h — here data-
// parallel over SEGMENTS, which vectorizes the same arithmetic).
struct SegSoA {
  std::vector<float> p0x, p0y, p0z, p1x, p1y, p1z;
  std::vector<float> axx, axy, axz, r2;
  std::vector<float> n0x, n0y, n0z, n1x, n1y, n1z;
  void fill(const std::vector<Seg> &segs) {
    size_t n = segs.size();
    for (auto v : {&p0x, &p0y, &p0z, &p1x, &p1y, &p1z, &axx, &axy, &axz,
                   &r2, &n0x, &n0y, &n0z, &n1x, &n1y, &n1z})
      v->resize(n);
    for (size_t i = 0; i < n; ++i) {
      const Seg &s = segs[i];
      V3 seg = s.p1 - s.p0;
      float len = std::sqrt(dot(seg, seg));
      V3 ax = len > 1e-12f ? seg * (1.0f / len) : V3{0, 0, 1};
      p0x[i] = s.p0.x; p0y[i] = s.p0.y; p0z[i] = s.p0.z;
      p1x[i] = s.p1.x; p1y[i] = s.p1.y; p1z[i] = s.p1.z;
      axx[i] = ax.x; axy[i] = ax.y; axz[i] = ax.z;
      r2[i] = s.r * s.r;
      n0x[i] = s.n0.x; n0y[i] = s.n0.y; n0z[i] = s.n0.z;
      n1x[i] = s.n1.x; n1y[i] = s.n1.y; n1z[i] = s.n1.z;
    }
  }
};

// Branch-free miter-cylinder test over a contiguous leaf range; the
// straight-line body auto-vectorizes to AVX-512 lanes under
// -O3 -march=native (verified: the leaf loop is the benchmark hot spot).
static inline void leaf_hits(const SegSoA &S, int s0, int c, V3 o, V3 d,
                             float mint, float &best, bool &hit) {
  float tc[32];
#pragma GCC ivdep
  for (int k = 0; k < c; ++k) {
    int i = s0 + k;
    float relx = o.x - S.p0x[i], rely = o.y - S.p0y[i],
          relz = o.z - S.p0z[i];
    float axd = S.axx[i] * d.x + S.axy[i] * d.y + S.axz[i] * d.z;
    float axr = S.axx[i] * relx + S.axy[i] * rely + S.axz[i] * relz;
    float pox = relx - S.axx[i] * axr, poy = rely - S.axy[i] * axr,
          poz = relz - S.axz[i] * axr;
    float pdx = d.x - S.axx[i] * axd, pdy = d.y - S.axy[i] * axd,
          pdz = d.z - S.axz[i] * axd;
    float a = pdx * pdx + pdy * pdy + pdz * pdz;
    float ainv = 1.0f / std::max(a, 1e-18f);
    float b = pox * pdx + poy * pdy + poz * pdz;
    float tm = -b * ainv;
    float qx = pox + pdx * tm, qy = poy + pdy * tm, qz = poz + pdz * tm;
    float cm = qx * qx + qy * qy + qz * qz - S.r2[i];
    float disc = -cm * ainv;
    float dt = std::sqrt(std::max(disc, 0.0f));
    float tn = tm - dt, tf = tm + dt;
    // miter-plane membership at both roots
    float pnx = o.x + d.x * tn, pny = o.y + d.y * tn,
          pnz = o.z + d.z * tn;
    float pfx = o.x + d.x * tf, pfy = o.y + d.y * tf,
          pfz = o.z + d.z * tf;
    bool ok_n = (pnx - S.p0x[i]) * S.n0x[i] + (pny - S.p0y[i]) * S.n0y[i]
                + (pnz - S.p0z[i]) * S.n0z[i] >= 0
             && (pnx - S.p1x[i]) * S.n1x[i] + (pny - S.p1y[i]) * S.n1y[i]
                + (pnz - S.p1z[i]) * S.n1z[i] <= 0;
    bool ok_f = (pfx - S.p0x[i]) * S.n0x[i] + (pfy - S.p0y[i]) * S.n0y[i]
                + (pfz - S.p0z[i]) * S.n0z[i] >= 0
             && (pfx - S.p1x[i]) * S.n1x[i] + (pfy - S.p1y[i]) * S.n1y[i]
                + (pfz - S.p1z[i]) * S.n1z[i] <= 0;
    bool vn = disc >= 0 && tn >= mint && ok_n;
    bool vf = disc >= 0 && tf >= mint && ok_f;
    float t = vn ? tn : (vf ? tf : 3e38f);
    tc[k] = t;
  }
  for (int k = 0; k < c; ++k) {
    if (tc[k] < best) { best = tc[k]; hit = true; }
  }
}

// closest-hit variant that also reports the winning segment (leaf-order
// index) — the e2e path loop needs it for the shading frame
static inline void leaf_hits_pid(const SegSoA &S, int s0, int c, V3 o,
                                 V3 d, float mint, float &best, int &pid) {
  float tc[32];
#pragma GCC ivdep
  for (int k = 0; k < c; ++k) {
    int i = s0 + k;
    float relx = o.x - S.p0x[i], rely = o.y - S.p0y[i],
          relz = o.z - S.p0z[i];
    float axd = S.axx[i] * d.x + S.axy[i] * d.y + S.axz[i] * d.z;
    float axr = S.axx[i] * relx + S.axy[i] * rely + S.axz[i] * relz;
    float pox = relx - S.axx[i] * axr, poy = rely - S.axy[i] * axr,
          poz = relz - S.axz[i] * axr;
    float pdx = d.x - S.axx[i] * axd, pdy = d.y - S.axy[i] * axd,
          pdz = d.z - S.axz[i] * axd;
    float a = pdx * pdx + pdy * pdy + pdz * pdz;
    float ainv = 1.0f / std::max(a, 1e-18f);
    float b = pox * pdx + poy * pdy + poz * pdz;
    float tm = -b * ainv;
    float qx = pox + pdx * tm, qy = poy + pdy * tm, qz = poz + pdz * tm;
    float cm = qx * qx + qy * qy + qz * qz - S.r2[i];
    float disc = -cm * ainv;
    float dt = std::sqrt(std::max(disc, 0.0f));
    float tn = tm - dt, tf = tm + dt;
    float pnx = o.x + d.x * tn, pny = o.y + d.y * tn,
          pnz = o.z + d.z * tn;
    float pfx = o.x + d.x * tf, pfy = o.y + d.y * tf,
          pfz = o.z + d.z * tf;
    bool ok_n = (pnx - S.p0x[i]) * S.n0x[i] + (pny - S.p0y[i]) * S.n0y[i]
                + (pnz - S.p0z[i]) * S.n0z[i] >= 0
             && (pnx - S.p1x[i]) * S.n1x[i] + (pny - S.p1y[i]) * S.n1y[i]
                + (pnz - S.p1z[i]) * S.n1z[i] <= 0;
    bool ok_f = (pfx - S.p0x[i]) * S.n0x[i] + (pfy - S.p0y[i]) * S.n0y[i]
                + (pfz - S.p0z[i]) * S.n0z[i] >= 0
             && (pfx - S.p1x[i]) * S.n1x[i] + (pfy - S.p1y[i]) * S.n1y[i]
                + (pfz - S.p1z[i]) * S.n1z[i] <= 0;
    bool vn = disc >= 0 && tn >= mint && ok_n;
    bool vf = disc >= 0 && tf >= mint && ok_f;
    tc[k] = vn ? tn : (vf ? tf : 3e38f);
  }
  for (int k = 0; k < c; ++k) {
    if (tc[k] < best) { best = tc[k]; pid = s0 + k; }
  }
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
  int32_t nn = hairpt_build_bvh(lo.data(), hi.data(), n, 8,
                                (int32_t)std::thread::hardware_concurrency(),
                                nlo.data(), nhi.data(), nleft.data(),
                                ncount.data(), nskip.data(), order.data());
  auto t1 = std::chrono::steady_clock::now();
  std::fprintf(stderr, "[cpu_bench] bvh: %d nodes in %.2fs\n", nn,
               std::chrono::duration<double>(t1 - t0).count());

  std::vector<Seg> sorted(n);
  for (int i = 0; i < n; ++i) sorted[i] = segs[order[i]];
  SegSoA soa;
  soa.fill(sorted);

  std::atomic<long long> hits{0};
  int n_threads = std::max(1u, std::thread::hardware_concurrency());
  if (const char* e = std::getenv("CPU_BENCH_THREADS"))
    n_threads = std::max(1, std::atoi(e));
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
          leaf_hits(soa, nleft[node], ncount[node], o, d, 1e-4f, best,
                    hit);
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

  // ---- e2e NEE path trace over the same camera rays ----
  V3 sun = {-0.376047f, 0.758426f, 0.532333f};
  {
    float l = std::sqrt(dot(sun, sun));
    sun = sun * (1.0f / l);
  }
  auto closest = [&](V3 o, V3 d, float mint, float &best, int &pid) {
    V3 inv = {1.0f / (d.x ? d.x : 1e-12f), 1.0f / (d.y ? d.y : 1e-12f),
              1.0f / (d.z ? d.z : 1e-12f)};
    best = 3e38f;
    pid = -1;
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
      bool box = tn <= tf2 * 1.00000024f + 1e-7f && tf2 >= mint;
      if (box && ncount[node] < 0) { node = nleft[node]; continue; }
      if (box) leaf_hits_pid(soa, nleft[node], ncount[node], o, d, mint,
                             best, pid);
      node = nskip[node];
    }
  };
  auto occluded = [&](V3 o, V3 d, float mint) {
    V3 inv = {1.0f / (d.x ? d.x : 1e-12f), 1.0f / (d.y ? d.y : 1e-12f),
              1.0f / (d.z ? d.z : 1e-12f)};
    int32_t node = 0;
    while (node != nn) {
      const float *bl = &nlo[3 * (size_t)node];
      const float *bh = &nhi[3 * (size_t)node];
      float tn = -3e38f, tf2 = 3e38f;
      for (int k = 0; k < 3; ++k) {
        float a = (bl[k] - (&o.x)[k]) * (&inv.x)[k];
        float b2 = (bh[k] - (&o.x)[k]) * (&inv.x)[k];
        tn = std::max(tn, std::min(a, b2));
        tf2 = std::min(tf2, std::max(a, b2));
      }
      bool box = tn <= tf2 * 1.00000024f + 1e-7f && tf2 >= mint;
      if (box && ncount[node] < 0) { node = nleft[node]; continue; }
      if (box) {
        float best2 = 3e38f;
        bool h = false;
        leaf_hits(soa, nleft[node], ncount[node], o, d, mint, best2, h);
        if (h) return true;   // first accepted hit terminates the walk
      }
      node = nskip[node];
    }
    return false;
  };

  std::atomic<long long> bounces{0};
  const float eps = 1e-4f;
  auto path_range = [&](int lo_r, int hi_r) {
    long long local_b = 0;
    for (int ri = lo_r; ri < hi_r; ++ri) {
      V3 o = {raydata[6 * (size_t)ri], raydata[6 * (size_t)ri + 1],
              raydata[6 * (size_t)ri + 2]};
      V3 d = {raydata[6 * (size_t)ri + 3], raydata[6 * (size_t)ri + 4],
              raydata[6 * (size_t)ri + 5]};
      uint32_t rng = 0x9E3779B9u * (uint32_t)(ri + 1) + 0x85EBCA6Bu;
      auto rnd = [&rng]() {
        rng ^= rng << 13; rng ^= rng >> 17; rng ^= rng << 5;
        return (rng >> 8) * (1.0f / 16777216.0f);
      };
      float beta = 1.0f;
      float mint = 1e-2f;   // camera near plane on the first segment
      for (int depth = 0; depth < 65; ++depth) {
        float t;
        int pid;
        closest(o, d, mint, t, pid);
        if (pid < 0) break;                  // escaped to the sky
        local_b++;
        V3 p = o + d * t;
        const Seg &sg = sorted[pid];
        V3 ax = sg.p1 - sg.p0;
        float al = std::sqrt(dot(ax, ax));
        ax = al > 1e-12f ? ax * (1.0f / al) : V3{0, 0, 1};
        V3 rel = p - sg.p0;
        V3 nr = rel - ax * dot(ax, rel);
        float nl = std::sqrt(dot(nr, nr));
        nr = nl > 1e-12f ? nr * (1.0f / nl) : V3{1, 0, 0};
        // NEE: one sun shadow ray (any-hit, early exit)
        V3 so = p + nr * eps;
        occluded(so, sun, eps);
        // cosine-sampled bounce about the radial normal
        float u1 = rnd(), u2 = rnd();
        float r = std::sqrt(u1), phi = 6.2831853f * u2;
        V3 tvec = std::fabs(nr.x) < 0.9f ? V3{1, 0, 0} : V3{0, 1, 0};
        V3 b1 = {nr.y * tvec.z - nr.z * tvec.y,
                 nr.z * tvec.x - nr.x * tvec.z,
                 nr.x * tvec.y - nr.y * tvec.x};
        float bl2 = std::sqrt(dot(b1, b1));
        b1 = b1 * (1.0f / bl2);
        V3 b2v = {nr.y * b1.z - nr.z * b1.y, nr.z * b1.x - nr.x * b1.z,
                  nr.x * b1.y - nr.y * b1.x};
        float z = std::sqrt(std::max(0.0f, 1.0f - u1));
        d = b1 * (r * std::cos(phi)) + b2v * (r * std::sin(phi))
            + nr * z;
        o = p + nr * eps;
        mint = eps;
        beta *= 0.6f;        // fur-ish single-bounce albedo
        if (depth >= 5) {    // RR, path.cpp:276-283 analog
          float q = std::min(0.95f, std::max(0.05f, beta));
          if (rnd() > q) break;
          beta /= q;
        }
      }
    }
    bounces += local_b;
  };

  t0 = std::chrono::steady_clock::now();
  int e2e_iters = std::max(1, iters / 4);
  for (int it = 0; it < e2e_iters; ++it) {
    std::vector<std::thread> ths;
    int per = (m + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t)
      ths.emplace_back(path_range, t * per, std::min(m, (t + 1) * per));
    for (auto &th : ths) th.join();
  }
  t1 = std::chrono::steady_clock::now();
  double dt_e = std::chrono::duration<double>(t1 - t0).count();
  double mrays_e2e = (double)m * e2e_iters / dt_e / 1e6;
  double avg_b = (double)bounces / ((double)m * e2e_iters);
  std::fprintf(stderr,
               "[cpu_bench] e2e: %d threads, %.2fs for %lld paths "
               "(%.2f bounces avg)\n",
               n_threads, dt_e, (long long)m * e2e_iters, avg_b);
  std::printf("%.4f %.4f %.4f %.2f\n", mrays, hit_frac, mrays_e2e, avg_b);
  return 0;
}
