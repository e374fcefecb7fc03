// CPU baseline: per-pair matching cost of the reference algorithm,
// measured with the same loop structure the native matcher uses
// (8 OpenMP threads over the gallery, scalar ADC lookup loop, descriptor
// GEMM, spectral filtering power iterations). This is an independent
// implementation of the algorithm's cost profile used only to calibrate
// the TPU engine's vs_baseline speedup — see matching/matcher.cpp in the
// reference for the algorithm being modeled.
//
// Build: g++ -O3 -march=native -fopenmp -o cpu_baseline cpu_baseline.cpp
// Run:   ./cpu_baseline <n_pairs> [Lm Rm D Lt Rt]
#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>
#ifdef _OPENMP
#include <omp.h>
#endif

static const int N_SUBS = 16, N_CLUSTERS = 256;
static const int TOP_MINU = 120, TOP_TEX = 200;

struct Workload {
  int Lm, Rm, D, Lt, Rt;
  std::vector<float> lat_des;        // [3][Lm*D]
  std::vector<float> rol_des;        // [Rm*D]
  std::vector<float> dist_codewords; // [Lt*N_SUBS*N_CLUSTERS]
  std::vector<uint8_t> codes;        // [Rt*N_SUBS]
  std::vector<float> lat_xy, rol_xy, lat_ori, rol_ori; // coords/oris
};

static void fill(Workload &w, std::mt19937 &rng) {
  std::normal_distribution<float> nd(0.f, 1.f);
  std::uniform_real_distribution<float> ud(0.f, 1.f);
  auto fillv = [&](std::vector<float> &v, size_t n) {
    v.resize(n);
    for (auto &x : v) x = nd(rng);
  };
  fillv(w.lat_des, (size_t)3 * w.Lm * w.D);
  fillv(w.rol_des, (size_t)w.Rm * w.D);
  fillv(w.dist_codewords, (size_t)w.Lt * N_SUBS * N_CLUSTERS);
  for (auto &x : w.dist_codewords) x = std::fabs(x) * 0.4f;
  w.codes.resize((size_t)w.Rt * N_SUBS);
  for (auto &c : w.codes) c = (uint8_t)(rng() & 255);
  fillv(w.lat_xy, (size_t)std::max(w.Lm, w.Lt) * 2);
  fillv(w.rol_xy, (size_t)std::max(w.Rm, w.Rt) * 2);
  fillv(w.lat_ori, std::max(w.Lm, w.Lt));
  fillv(w.rol_ori, std::max(w.Rm, w.Rt));
  for (auto &x : w.lat_xy) x = ud(rng) * 480.f;
  for (auto &x : w.rol_xy) x = ud(rng) * 480.f;
}

// spectral filtering cost model: H build over K corr + iters power steps +
// greedy pass (the reference's LSS_R_Fast2* loops)
static float lss_cost(const float *xy1, const float *xy2, const float *v,
                      int K, int iters) {
  std::vector<float> H((size_t)K * K, 0.f), S(v, v + K), S1(K);
  for (int i = 0; i < K - 1; ++i)
    for (int j = i + 1; j < K; ++j) {
      float dx1 = xy1[2 * i] - xy1[2 * j], dy1 = xy1[2 * i + 1] - xy1[2 * j + 1];
      float dx2 = xy2[2 * i] - xy2[2 * j], dy2 = xy2[2 * i + 1] - xy2[2 * j + 1];
      float d = std::fabs(std::sqrt(dx1 * dx1 + dy1 * dy1) -
                          std::sqrt(dx2 * dx2 + dy2 * dy2));
      if (d > 30.f) continue;
      float h = (30.f - d) / 25.f;
      h = h < 0.f ? 0.f : (h > 1.f ? 1.f : h);
      H[(size_t)i * K + j] = H[(size_t)j * K + i] = h;
    }
  for (int it = 0; it < iters; ++it) {
    float sum = 0.f;
    for (int i = 0; i < K; ++i) {
      float acc = 0.f;
      const float *row = &H[(size_t)i * K];
      for (int k = 0; k < K; ++k) acc += row[k] * S[k];
      S1[i] = acc;
      sum += acc;
    }
    float inv = 1.f / (sum + 1e-5f);
    for (int i = 0; i < K; ++i) S[i] = S1[i] * inv;
  }
  float score = 0.f;
  for (int i = 0; i < K; ++i)
    if (S[i] > 1e-4f) score += v[i];
  return score;
}

static float one_pair(const Workload &w, std::vector<float> &scratch) {
  float total = 0.f;
  // --- 3 minutiae-template matches: descriptor GEMM + normalize + top-120
  std::vector<float> simi((size_t)w.Lm * w.Rm);
  std::vector<float> rowsum(w.Lm), colsum(w.Rm);
  std::vector<int> order;
  for (int t = 0; t < 3; ++t) {
    const float *A = &w.lat_des[(size_t)t * w.Lm * w.D];
    for (int i = 0; i < w.Lm; ++i) {
      const float *a = A + (size_t)i * w.D;
      float rs = 0.f;
      for (int j = 0; j < w.Rm; ++j) {
        const float *b = &w.rol_des[(size_t)j * w.D];
        float acc = 0.f;
        for (int k = 0; k < w.D; ++k) acc += a[k] * b[k];
        acc = acc < 0.f ? 0.f : acc;
        simi[(size_t)i * w.Rm + j] = acc;
        rs += acc;
      }
      rowsum[i] = rs;
    }
    for (int j = 0; j < w.Rm; ++j) {
      float cs = 0.f;
      for (int i = 0; i < w.Lm; ++i) cs += simi[(size_t)i * w.Rm + j];
      colsum[j] = cs;
    }
    order.resize(simi.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = (int)i;
    int topn = std::min((int)simi.size(), TOP_MINU);
    std::partial_sort(order.begin(), order.begin() + topn, order.end(),
                      [&](int a, int b) {
                        float na = simi[a] / (rowsum[a / w.Rm] + colsum[a % w.Rm] - simi[a] + 1e-6f);
                        float nb = simi[b] / (rowsum[b / w.Rm] + colsum[b % w.Rm] - simi[b] + 1e-6f);
                        return na > nb;
                      });
    std::vector<float> cxy1(2 * topn), cxy2(2 * topn), cv(topn);
    for (int i = 0; i < topn; ++i) {
      int li = order[i] / w.Rm, ri = order[i] % w.Rm;
      cxy1[2 * i] = w.lat_xy[2 * li];
      cxy1[2 * i + 1] = w.lat_xy[2 * li + 1];
      cxy2[2 * i] = w.rol_xy[2 * ri];
      cxy2[2 * i + 1] = w.rol_xy[2 * ri + 1];
      cv[i] = simi[order[i]];
    }
    total += lss_cost(cxy1.data(), cxy2.data(), cv.data(), topn, 5 + 5);
  }
  // --- texture match: ADC lookup loop (the reference's method-1 walk)
  scratch.resize((size_t)w.Lt * w.Rt);
  for (int i = 0; i < w.Lt; ++i) {
    const float *lut0 = &w.dist_codewords[(size_t)i * N_SUBS * N_CLUSTERS];
    for (int j = 0; j < w.Rt; ++j) {
      const uint8_t *c = &w.codes[(size_t)j * N_SUBS];
      float d1 = 6.f, d2 = 0.f, d3 = 0.f, d4 = 0.f;
      const float *lut = lut0;
      for (int k = 0; k < N_SUBS; k += 4, lut += 4 * N_CLUSTERS) {
        d1 -= lut[c[k]];
        d2 -= lut[N_CLUSTERS + c[k + 1]];
        d3 -= lut[2 * N_CLUSTERS + c[k + 2]];
        d4 -= lut[3 * N_CLUSTERS + c[k + 3]];
      }
      scratch[(size_t)i * w.Rt + j] = (d1 + d2) + (d3 + d4);
    }
  }
  std::vector<float> best(w.Lt);
  std::vector<int> bj(w.Lt);
  for (int i = 0; i < w.Lt; ++i) {
    const float *row = &scratch[(size_t)i * w.Rt];
    int m = 0;
    for (int j = 1; j < w.Rt; ++j)
      if (row[j] > row[m]) m = j;
    best[i] = row[m];
    bj[i] = m;
  }
  int topn = std::min(w.Lt, TOP_TEX);
  std::vector<int> ord(w.Lt);
  for (int i = 0; i < w.Lt; ++i) ord[i] = i;
  std::partial_sort(ord.begin(), ord.begin() + topn, ord.end(),
                    [&](int a, int b) { return best[a] > best[b]; });
  std::vector<float> cxy1(2 * topn), cxy2(2 * topn), cv(topn);
  for (int i = 0; i < topn; ++i) {
    cxy1[2 * i] = w.lat_xy[2 * ord[i]];
    cxy1[2 * i + 1] = w.lat_xy[2 * ord[i] + 1];
    cxy2[2 * i] = w.rol_xy[2 * bj[ord[i]]];
    cxy2[2 * i + 1] = w.rol_xy[2 * bj[ord[i]] + 1];
    cv[i] = best[ord[i]];
  }
  total += 0.3f * lss_cost(cxy1.data(), cxy2.data(), cv.data(), topn, 3 + 5);
  return total;
}

int main(int argc, char **argv) {
  int n_pairs = argc > 1 ? atoi(argv[1]) : 2000;
  Workload w;
  w.Lm = argc > 2 ? atoi(argv[2]) : 64;
  w.Rm = argc > 3 ? atoi(argv[3]) : 96;
  w.D = argc > 4 ? atoi(argv[4]) : 96;
  w.Lt = argc > 5 ? atoi(argv[5]) : 448;
  w.Rt = argc > 6 ? atoi(argv[6]) : 448;
  std::mt19937 rng(7);
  fill(w, rng);

  volatile float sink = 0.f;
  auto t0 = std::chrono::high_resolution_clock::now();
#pragma omp parallel num_threads(8)
  {
    std::vector<float> scratch;
#pragma omp for schedule(static, 16)
    for (int p = 0; p < n_pairs; ++p) {
      float s = one_pair(w, scratch);
#pragma omp critical
      sink += s;
    }
  }
  auto t1 = std::chrono::high_resolution_clock::now();
  double sec = std::chrono::duration<double>(t1 - t0).count();
  printf("{\"pairs\": %d, \"seconds\": %.4f, \"pairs_per_s\": %.1f}\n",
         n_pairs, sec, n_pairs / sec);
  return (int)(sink * 0.f);
}
