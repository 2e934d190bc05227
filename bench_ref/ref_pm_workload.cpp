// Measured CPU baseline for bench.py: a faithful, from-scratch C++
// implementation of the reference's PatchMatch depth-estimation WORKLOAD
// (cdcseacave/openMVS), timed on this host so the benchmark anchor is a
// measured number instead of a guess.
//
// Workload model (behavior studied from the reference; no code copied):
//   - DepthEstimator::ScorePixelImage (DepthMap.cpp:465-564): 9x9 window,
//     step 2 => 25 texels; plane-induced homography H = K1(R - t n^T/d)K0^-1
//     walked incrementally across the window; bilinear sample per texel;
//     bilateral-weighted ZNCC (weights cached per reference pixel, computed
//     once per pixel per pass in FillPixelPatch, DepthMap.h:402-412);
//     plane-smoothness bonus over up to 4 close neighbors
//     (DepthMap.cpp:522-534); geometric-consistency term via forward-
//     backward reprojection against the neighbor depth map on geometric
//     passes (DepthMap.cpp:535-551).
//   - DepthEstimator::ProcessPixel (DepthMap.cpp:630-912): per pixel per
//     sweep, up to 2 causal-neighbor propagation hypotheses + nRandomIters=6
//     random-refinement hypotheses (DepthMap.cpp:104-107,812-852), each
//     scored in every selected view (min-mean aggregation over N views,
//     DepthMap.cpp:567-626).
//   - Driver (SceneDensify.cpp:616-805): ScoreDepthMapTmp initial scoring
//     (1 hypothesis/pixel), then nEstimationIters=3 alternating zig-zag
//     sweeps, over a 2-level sub-resolution pyramid (quarter, half, full),
//     then 2 geometric-consistency re-estimation passes at full resolution.
//   - Threading: the reference pulls pixel indices from an atomic counter
//     with nMaxThreads worker threads (SceneDensify.cpp:490-539); modeled
//     here as an OpenMP parallel-for over rows (same arithmetic, same
//     memory behavior, zero contention => an upper bound on reference
//     throughput, i.e. a conservative anchor for vs_baseline).
//
// Scene model: 640x480 grayscale views (the bundled 4-image test scene
// resolution class), 3 neighbor views per reference view (4-image scene).
//
// Output: one JSON line {"depth_maps_per_s": ..., "mscores_per_s": ...}.
//
// Build: g++ -O3 -march=native -fopenmp -o ref_pm_workload ref_pm_workload.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>
#include <chrono>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int kHalfWin = 4;     // 9x9 window
constexpr int kStep = 2;        // => 5x5 = 25 texels
constexpr int kTexels = 25;
constexpr int kViews = 3;       // neighbors of a view in the 4-image scene
constexpr int kRandomIters = 6; // OPTDENSE::nRandomIters default
constexpr int kEstimationIters = 3; // OPTDENSE::nEstimationIters default
constexpr int kGeomIters = 2;   // geometric-consistency passes
constexpr float kThRobust = 1.2f;

struct Mat3 { float m[9]; };

struct View {
  std::vector<float> image;  // grayscale
  std::vector<float> depth;  // for geometric passes
  int w, h;
  // fixed relative geometry vs the reference view (synthetic but realistic)
  Mat3 KRK;    // K1*R*K0^-1
  float Kt[3]; // K1*t
};

// xorshift PRNG: cheap like the reference's SEACAVE::Random
static inline uint32_t xs(uint32_t& s) {
  s ^= s << 13; s ^= s >> 17; s ^= s << 5; return s;
}
static inline float frand(uint32_t& s) { return (xs(s) >> 8) * (1.0f / 16777216.0f); }

static inline float bilinear(const std::vector<float>& img, int w, float x, float y) {
  const int x0 = (int)x, y0 = (int)y;
  const float fx = x - x0, fy = y - y0;
  const float* p = &img[y0 * w + x0];
  const float a = p[0] + (p[1] - p[0]) * fx;
  const float b = p[w] + (p[w + 1] - p[w]) * fx;
  return a + (b - a) * fy;
}

struct PixelWeights {
  float w[kTexels];       // bilateral weight
  float tw[kTexels];      // temp weight (w * (v0 - mean0))
  float sumW;
  float normSq0;
};

// Bilateral weights around the center texel, as the reference caches per
// pixel (DepthMap.h:402-412): spatial Gaussian x color Gaussian.
static void computeWeights(const std::vector<float>& img0, int w, int x, int y,
                           PixelWeights& out) {
  const float c = img0[y * w + x];
  const float sigmaC = -1.0f / (2.0f * 0.2f * 0.2f);
  const float sigmaS = -1.0f / (2.0f * 4.5f * 4.5f);
  int n = 0;
  float sw = 0, mean = 0;
  float v[kTexels];
  for (int i = -kHalfWin; i <= kHalfWin; i += kStep) {
    for (int j = -kHalfWin; j <= kHalfWin; j += kStep) {
      const float t = img0[(y + i) * w + (x + j)];
      const float dc = t - c;
      const float ws = std::exp(dc * dc * sigmaC + (float)(i * i + j * j) * sigmaS);
      v[n] = t;
      out.w[n] = ws;
      sw += ws;
      mean += ws * t;
      ++n;
    }
  }
  mean /= sw;
  float nsq = 0;
  for (int k = 0; k < kTexels; ++k) {
    out.tw[k] = out.w[k] * (v[k] - mean);
    nsq += out.tw[k] * (v[k] - mean);
  }
  out.sumW = sw;
  out.normSq0 = nsq;
}

// One hypothesis scored in one view: homography walk + 25 bilinear samples +
// weighted ZNCC (the reference's ScorePixelImage inner loop).
static inline float scoreImage(const View& v, const PixelWeights& pw,
                               int x0, int y0, float depth,
                               const float nrm[3], bool geometric,
                               float geomWeight) {
  // H = KRK - (K t) * n^T / d   (plane-induced homography)
  const float id = 1.0f / depth;
  float H[9];
  for (int r = 0; r < 3; ++r)
    for (int c = 0; c < 3; ++c)
      H[r * 3 + c] = v.KRK.m[r * 3 + c] - v.Kt[r] * nrm[c] * id;
  // walk the window incrementally (the reference's baseX/X update)
  const float sx = (float)(x0 - kHalfWin), sy = (float)(y0 - kHalfWin);
  float bX = H[0] * sx + H[1] * sy + H[2];
  float bY = H[3] * sx + H[4] * sy + H[5];
  float bZ = H[6] * sx + H[7] * sy + H[8];
  const float stepf = (float)kStep;
  const float dxX = H[0] * stepf, dxY = H[3] * stepf, dxZ = H[6] * stepf;
  const float dyX = H[1] * stepf, dyY = H[4] * stepf, dyZ = H[7] * stepf;
  float sum = 0, sumSq = 0, num = 0;
  int n = 0;
  for (int i = 0; i < 5; ++i) {
    float X = bX, Y = bY, Z = bZ;
    for (int j = 0; j < 5; ++j) {
      const float iz = 1.0f / Z;
      const float px = X * iz, py = Y * iz;
      if (px < 1 || px > v.w - 2 || py < 1 || py > v.h - 2)
        return kThRobust;
      const float val = bilinear(v.image, v.w, px, py);
      const float vw = val * pw.w[n];
      sum += vw;
      sumSq += val * vw;
      num += val * pw.tw[n];
      ++n;
      X += dxX; Y += dxY; Z += dxZ;
    }
    bX += dyX; bY += dyY; bZ += dyZ;
  }
  const float normSq1 = sumSq - sum * sum / pw.sumW;
  const float nrmSq = pw.normSq0 * normSq1;
  if (nrmSq <= 1e-16f) return kThRobust;
  float ncc = num / std::sqrt(nrmSq);
  ncc = ncc < -1 ? -1 : (ncc > 1 ? 1 : ncc);
  float score = 1.0f - ncc;
  if (geometric) {
    // forward-backward reprojection vs the neighbor's depth map
    // (DepthMap.cpp:535-551): project, sample neighbor depth, reproject
    float consistency = 4.0f;
    const float Xc = v.KRK.m[0] * x0 + v.KRK.m[1] * y0 + v.KRK.m[2];
    const float Yc = v.KRK.m[3] * x0 + v.KRK.m[4] * y0 + v.KRK.m[5];
    const float Zc = v.KRK.m[6] * x0 + v.KRK.m[7] * y0 + v.KRK.m[8];
    const float Z1 = Zc * depth + v.Kt[2];
    if (Z1 > 0) {
      const float x1 = (Xc * depth + v.Kt[0]) / Z1;
      const float y1 = (Yc * depth + v.Kt[1]) / Z1;
      if (x1 >= 1 && x1 < v.w - 2 && y1 >= 1 && y1 < v.h - 2) {
        const float d1 = bilinear(v.depth, v.w, x1, y1);
        if (std::fabs(d1 - Z1) < 0.03f * Z1) {
          // inverse mapping back into the reference view (synthetic inverse:
          // same arithmetic cost as the reference's Tr/Tn application)
          const float xb = x1 + (d1 - Z1) * 0.5f, yb = y1 + (d1 - Z1) * 0.5f;
          const float dx = x0 - xb, dy = y0 - yb;
          const float dist = std::sqrt(dx * dx + dy * dy);
          const float c2 = std::sqrt(dist * (dist + 2.0f));
          consistency = c2 < consistency ? c2 : consistency;
        }
      }
    }
    score += geomWeight * consistency;
  }
  return score < 2.0f ? score : 2.0f;
}

// min-mean multi-view aggregation (DepthMap.cpp:567-626) + plane-smoothness
// bonus applied per view in the reference; modeled once per hypothesis here
// (4 exp calls), matching the reference's per-ScorePixel transcendental count
// when DENSE_SMOOTHNESS is enabled with ~2 close neighbors x 2 factors.
static inline float scorePixel(const View* views, const PixelWeights& pw,
                               int x0, int y0, float depth, const float nrm[3],
                               bool geometric, float neighDepth) {
  float scores[kViews];
  for (int k = 0; k < kViews; ++k)
    scores[k] = scoreImage(views[k], pw, x0, y0, depth, nrm, geometric, 0.1f);
  // smoothness factors (2 neighbors x depth+normal Gaussians)
  const float dd = (depth - neighDepth) / depth;
  const float fD = std::exp(dd * dd * -200.0f);
  const float fN = std::exp(0.04f * -7.3f);
  const float bonus = (1.0f - 0.05f * fD) * (1.0f - 0.05f * fN);
  // min-mean: mean of the best ceil(kViews/2) scores
  for (int a = 0; a < kViews; ++a)  // tiny sort
    for (int b = a + 1; b < kViews; ++b)
      if (scores[b] < scores[a]) { float t = scores[a]; scores[a] = scores[b]; scores[b] = t; }
  const int keep = (kViews + 1) / 2;
  float s = 0;
  for (int a = 0; a < keep; ++a) s += scores[a];
  return (s / keep) * bonus;
}

struct Level {
  int w, h;
  std::vector<float> depth, conf;
  std::vector<float> nx, ny, nz;
};

static uint64_t runPass(const View* views, const std::vector<float>& img0,
                        Level& L, bool geometric, uint32_t seedBase) {
  uint64_t hypCount = 0;
  const int w = L.w, h = L.h;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 8) reduction(+ : hypCount)
#endif
  for (int y = kHalfWin; y < h - kHalfWin; ++y) {
    uint32_t rng = seedBase + 0x9e3779b9u * (uint32_t)y;
    PixelWeights pw;
    for (int x = kHalfWin; x < w - kHalfWin; ++x) {
      // per-pixel weights recomputed every pass, as FillPixelPatch does
      computeWeights(img0, w, x, y, pw);
      const int idx = y * w + x;
      float d = L.depth[idx];
      float nrm[3] = {L.nx[idx], L.ny[idx], L.nz[idx]};
      float conf = L.conf[idx];
      const float nd = L.depth[idx > w ? idx - w : idx];
      // 2 propagation hypotheses (causal neighbors)
      for (int p = 0; p < 2; ++p) {
        const int nidx = p == 0 ? (x > kHalfWin ? idx - 1 : idx) : (y > kHalfWin ? idx - w : idx);
        const float cand = L.depth[nidx] * (1.0f + 0.001f * (frand(rng) - 0.5f));
        const float s = scorePixel(views, pw, x, y, cand, nrm, geometric, nd);
        ++hypCount;
        if (s < conf) { conf = s; d = cand; }
      }
      // 6 random-refinement hypotheses with shrinking range
      float range = 0.02f * d;
      for (int r = 0; r < kRandomIters; ++r) {
        const float cand = d + (frand(rng) - 0.5f) * range;
        float n2[3] = {nrm[0] + (frand(rng) - 0.5f) * 0.1f, nrm[1] + (frand(rng) - 0.5f) * 0.1f, nrm[2]};
        const float in = 1.0f / std::sqrt(n2[0] * n2[0] + n2[1] * n2[1] + n2[2] * n2[2]);
        n2[0] *= in; n2[1] *= in; n2[2] *= in;
        const float s = scorePixel(views, pw, x, y, cand, n2, geometric, nd);
        ++hypCount;
        if (s < conf) {
          conf = s; d = cand; nrm[0] = n2[0]; nrm[1] = n2[1]; nrm[2] = n2[2];
          range *= 0.5f;
        }
      }
      L.depth[idx] = d; L.conf[idx] = conf;
      L.nx[idx] = nrm[0]; L.ny[idx] = nrm[1]; L.nz[idx] = nrm[2];
    }
  }
  return hypCount;
}

static uint64_t runInitScore(const View* views, const std::vector<float>& img0,
                             Level& L) {
  uint64_t hypCount = 0;
  const int w = L.w, h = L.h;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 8) reduction(+ : hypCount)
#endif
  for (int y = kHalfWin; y < h - kHalfWin; ++y) {
    PixelWeights pw;
    for (int x = kHalfWin; x < w - kHalfWin; ++x) {
      computeWeights(img0, w, x, y, pw);
      const int idx = y * w + x;
      const float nrm[3] = {L.nx[idx], L.ny[idx], L.nz[idx]};
      L.conf[idx] = scorePixel(views, pw, x, y, L.depth[idx], nrm, false,
                               L.depth[idx]);
      ++hypCount;
    }
  }
  return hypCount;
}

static void makeSyntheticImage(std::vector<float>& img, int w, int h, uint32_t seed) {
  img.resize((size_t)w * h);
  uint32_t s = seed;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      img[y * w + x] = 0.5f + 0.3f * std::sin(x * 0.05f + seed) *
                                std::cos(y * 0.07f) + 0.2f * (frand(s) - 0.5f);
}

}  // namespace

int main(int argc, char** argv) {
  const int W = 640, H = 480;
  // full-resolution views (bilinear sampling targets)
  View views[kViews];
  for (int k = 0; k < kViews; ++k) {
    views[k].w = W; views[k].h = H;
    makeSyntheticImage(views[k].image, W, H, 17u + k);
    views[k].depth.assign((size_t)W * H, 4.0f);
    // plausible K*R*K^-1 (near-identity with small rotation) and K*t
    const float a = 0.02f * (k + 1);
    const Mat3 KRK = {{std::cos(a), -std::sin(a) * 0.1f, 5.0f * k,
                       std::sin(a) * 0.1f, std::cos(a), 2.0f * k,
                       0.00001f * k, 0.00002f * k, 1.0f}};
    views[k].KRK = KRK;
    views[k].Kt[0] = 60.0f * (k + 1); views[k].Kt[1] = 8.0f * k; views[k].Kt[2] = 0.02f * k;
  }
  std::vector<float> img0;
  makeSyntheticImage(img0, W, H, 3u);

  // sub-resolution pyramid: quarter, half, full (nSubResolutionLevels=2)
  const int scales[3] = {4, 2, 1};
  // low-res reference image pyramids
  std::vector<float> img0s[3];
  for (int li = 0; li < 3; ++li) {
    const int s = scales[li], w = W / s, h = H / s;
    img0s[li].resize((size_t)w * h);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x)
        img0s[li][y * w + x] = img0[(y * s) * W + x * s];
  }
  View viewScaled[3][kViews];
  for (int li = 0; li < 3; ++li) {
    const int s = scales[li], w = W / s, h = H / s;
    for (int k = 0; k < kViews; ++k) {
      viewScaled[li][k] = views[k];
      viewScaled[li][k].w = w; viewScaled[li][k].h = h;
      viewScaled[li][k].image.resize((size_t)w * h);
      viewScaled[li][k].depth.assign((size_t)w * h, 4.0f);
      for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x)
          viewScaled[li][k].image[y * w + x] = views[k].image[(y * s) * W + x * s];
      viewScaled[li][k].KRK.m[2] /= s; viewScaled[li][k].KRK.m[5] /= s;
      viewScaled[li][k].Kt[0] /= s; viewScaled[li][k].Kt[1] /= s;
    }
  }

  const int reps = argc > 1 ? atoi(argv[1]) : 3;
  uint64_t totalHyp = 0;
  const auto t0 = std::chrono::steady_clock::now();
  for (int rep = 0; rep < reps; ++rep) {
    for (int li = 0; li < 3; ++li) {
      const int s = scales[li], w = W / s, h = H / s;
      Level L;
      L.w = w; L.h = h;
      L.depth.assign((size_t)w * h, 4.0f);
      L.conf.assign((size_t)w * h, 2.0f);
      L.nx.assign((size_t)w * h, 0.0f);
      L.ny.assign((size_t)w * h, 0.0f);
      L.nz.assign((size_t)w * h, -1.0f);
      totalHyp += runInitScore(viewScaled[li], img0s[li], L);
      for (int it = 0; it < kEstimationIters; ++it)
        totalHyp += runPass(viewScaled[li], img0s[li], L, false, 7u * rep + it);
      if (li == 2)  // geometric passes at full resolution only
        for (int g = 0; g < kGeomIters; ++g)
          totalHyp += runPass(viewScaled[li], img0s[li], L, true, 31u * rep + g);
    }
  }
  const auto t1 = std::chrono::steady_clock::now();
  const double dt = std::chrono::duration<double>(t1 - t0).count();
  const double mapsPerS = reps / dt;
  const double scores = (double)totalHyp * kViews;
  int threads = 1;
#ifdef _OPENMP
  threads = omp_get_max_threads();
#endif
  printf("{\"depth_maps_per_s\": %.4f, \"mscores_per_s\": %.2f, "
         "\"threads\": %d, \"reps\": %d, \"seconds\": %.2f}\n",
         mapsPerS, scores / dt / 1e6, threads, reps, dt);
  return 0;
}
