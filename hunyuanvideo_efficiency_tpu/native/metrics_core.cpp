// Native metrics core: threaded PSNR / SSIM over uint8 video frames.
//
// The reference's evaluation loop leans on native libraries (OpenCV PSNR,
// skimage's C internals; reference: evaluation/compute_metrics.py:31-41) and
// threads across GPUs (compute_metrics_threads.py). This is the framework's
// first-party native equivalent: exact same math as
// evaluation/metrics.py (uniform 7x7 window, K1=0.01, K2=0.03, N-1
// covariance), C++ with a std::thread frame pool, bound via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmetrics_core.so
//        metrics_core.cpp -lpthread   (utils/native.py builds on demand)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// mean over a 7x7 window (valid region handled by caller crop), uniform
// filter with edge replication to mirror scipy.ndimage.uniform_filter's
// 'reflect' ... scipy default mode is 'reflect' (d c b a | a b c d); we
// replicate that exactly.
constexpr int WIN = 7;
constexpr int PAD = WIN / 2;

inline int reflect(int i, int n) {
  // scipy 'reflect': (d c b a | a b c d | d c b a)
  if (i < 0) return -i - 1;
  if (i >= n) return 2 * n - i - 1;
  return i;
}

void uniform_filter(const double* src, double* dst, int h, int w) {
  // separable 7-tap box filter with reflect boundaries
  std::vector<double> tmp(static_cast<size_t>(h) * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double s = 0;
      for (int k = -PAD; k <= PAD; ++k) s += src[y * w + reflect(x + k, w)];
      tmp[y * w + x] = s / WIN;
    }
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double s = 0;
      for (int k = -PAD; k <= PAD; ++k) s += tmp[reflect(y + k, h) * w + x];
      dst[y * w + x] = s / WIN;
    }
  }
}

double ssim_channel(const uint8_t* a, const uint8_t* b, int h, int w,
                    int stride, int nch, int ch, double data_range) {
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<double> x(n), y(n), xx(n), yy(n), xy(n);
  for (int i = 0; i < h; ++i)
    for (int j = 0; j < w; ++j) {
      double xa = a[(i * stride + j) * nch + ch];
      double yb = b[(i * stride + j) * nch + ch];
      size_t t = static_cast<size_t>(i) * w + j;
      x[t] = xa; y[t] = yb; xx[t] = xa * xa; yy[t] = yb * yb; xy[t] = xa * yb;
    }
  std::vector<double> ux(n), uy(n), uxx(n), uyy(n), uxy(n);
  uniform_filter(x.data(), ux.data(), h, w);
  uniform_filter(y.data(), uy.data(), h, w);
  uniform_filter(xx.data(), uxx.data(), h, w);
  uniform_filter(yy.data(), uyy.data(), h, w);
  uniform_filter(xy.data(), uxy.data(), h, w);

  const double cov_norm = double(WIN * WIN) / (WIN * WIN - 1);
  const double c1 = (0.01 * data_range) * (0.01 * data_range);
  const double c2 = (0.03 * data_range) * (0.03 * data_range);
  double acc = 0;
  size_t cnt = 0;
  for (int i = PAD; i < h - PAD; ++i)
    for (int j = PAD; j < w - PAD; ++j) {
      size_t t = static_cast<size_t>(i) * w + j;
      double vx = cov_norm * (uxx[t] - ux[t] * ux[t]);
      double vy = cov_norm * (uyy[t] - uy[t] * uy[t]);
      double vxy = cov_norm * (uxy[t] - ux[t] * uy[t]);
      double a1 = 2 * ux[t] * uy[t] + c1, a2 = 2 * vxy + c2;
      double b1 = ux[t] * ux[t] + uy[t] * uy[t] + c1, b2 = vx + vy + c2;
      acc += (a1 * a2) / (b1 * b2);
      ++cnt;
    }
  return acc / double(cnt);
}

}  // namespace

extern "C" {

// videos: [T, H, W, C] uint8, contiguous. Writes per-frame values.
void psnr_frames(const uint8_t* a, const uint8_t* b, int t, int h, int w,
                 int c, double data_range, double* out) {
  const size_t frame = static_cast<size_t>(h) * w * c;
  int n_threads = std::min<unsigned>(std::thread::hardware_concurrency(), 8);
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int t0, int t1) {
    for (int f = t0; f < t1; ++f) {
      const uint8_t* fa = a + f * frame;
      const uint8_t* fb = b + f * frame;
      double mse = 0;
      for (size_t i = 0; i < frame; ++i) {
        double d = double(fa[i]) - double(fb[i]);
        mse += d * d;
      }
      mse /= double(frame);
      out[f] = mse == 0 ? INFINITY
                        : 10.0 * std::log10(data_range * data_range / mse);
    }
  };
  std::vector<std::thread> pool;
  int per = (t + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads && i * per < t; ++i)
    pool.emplace_back(work, i * per, std::min(t, (i + 1) * per));
  for (auto& th : pool) th.join();
}

void ssim_frames(const uint8_t* a, const uint8_t* b, int t, int h, int w,
                 int c, double data_range, double* out) {
  const size_t frame = static_cast<size_t>(h) * w * c;
  int n_threads = std::min<unsigned>(std::thread::hardware_concurrency(), 8);
  if (n_threads < 1) n_threads = 1;
  auto work = [&](int t0, int t1) {
    for (int f = t0; f < t1; ++f) {
      const uint8_t* fa = a + f * frame;
      const uint8_t* fb = b + f * frame;
      double s = 0;
      for (int ch = 0; ch < c; ++ch)
        s += ssim_channel(fa, fb, h, w, w, c, ch, data_range);
      out[f] = s / c;
    }
  };
  std::vector<std::thread> pool;
  int per = (t + n_threads - 1) / n_threads;
  for (int i = 0; i < n_threads && i * per < t; ++i)
    pool.emplace_back(work, i * per, std::min(t, (i + 1) * per));
  for (auto& th : pool) th.join();
}

}  // extern "C"
