// nerf3dt_native: CPU-side native runtime for the TPU framework.
//
// The reference offloads its performance-critical CPU work to external
// native deps (librosa's C FFT, torch DataLoader worker processes reloading
// models per item — XGaze_utils/data_loader_xgaze_new.py:938-1066). This
// library provides the TPU-native replacements:
//
//   * mel-spectrogram front-end (STFT via Bluestein/radix-2 FFT + Slaney
//     mel filterbank + dB normalization), bit-matching the Python
//     pipeline in nerf3dtalker_tpu/data/mel.py (hparams.py:15-60 params);
//   * a threaded, double-buffered shard prefetcher for raw float32 array
//     files (the training input path: shuffled batch assembly off the
//     critical path, no Python in the loop).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <atomic>
#include <cmath>
#include <complex>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ----------------------------------------------------------------- FFT

// iterative radix-2 Cooley-Tukey, n must be a power of two
void fft_pow2(std::vector<std::complex<double>>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = 2 * kPi / (double)len * (invert ? 1 : -1);
    std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1);
      for (size_t j = 0; j < len / 2; j++) {
        auto u = a[i + j], v = a[i + j + len / 2] * w;
        a[i + j] = u + v;
        a[i + j + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert)
    for (auto& x : a) x /= (double)n;
}

// Bluestein chirp-z transform: DFT of arbitrary length n
void dft_bluestein(const std::vector<std::complex<double>>& in,
                   std::vector<std::complex<double>>& out) {
  const size_t n = in.size();
  size_t m = 1;
  while (m < 2 * n + 1) m <<= 1;
  std::vector<std::complex<double>> a(m, 0.0), b(m, 0.0), chirp(n);
  for (size_t i = 0; i < n; i++) {
    double ang = kPi * (double)((unsigned long long)i * i % (2 * n)) / (double)n;
    chirp[i] = std::complex<double>(std::cos(ang), -std::sin(ang));
    a[i] = in[i] * chirp[i];
  }
  b[0] = std::conj(chirp[0]);
  for (size_t i = 1; i < n; i++) b[i] = b[m - i] = std::conj(chirp[i]);
  fft_pow2(a, false);
  fft_pow2(b, false);
  for (size_t i = 0; i < m; i++) a[i] *= b[i];
  fft_pow2(a, true);
  out.resize(n);
  for (size_t i = 0; i < n; i++) out[i] = a[i] * chirp[i];
}

// --------------------------------------------------------- mel filterbank

double hz_to_mel_slaney(double f) {
  double mel = f / (200.0 / 3.0);
  const double log_step = std::log(6.4) / 27.0;
  if (f >= 1000.0) mel = 15.0 + std::log(f / 1000.0) / log_step;
  return mel;
}

double mel_to_hz_slaney(double m) {
  double f = m * (200.0 / 3.0);
  const double log_step = std::log(6.4) / 27.0;
  if (m >= 15.0) f = 1000.0 * std::exp(log_step * (m - 15.0));
  return f;
}

struct MelBasis {
  int n_mels, n_bins;
  std::vector<float> w;  // [n_mels, n_bins]
};

MelBasis build_mel_basis(int sr, int n_fft, int n_mels, double fmin, double fmax) {
  MelBasis mb;
  mb.n_mels = n_mels;
  mb.n_bins = n_fft / 2 + 1;
  mb.w.assign((size_t)n_mels * mb.n_bins, 0.f);
  std::vector<double> fftfreqs(mb.n_bins), hz(n_mels + 2);
  for (int i = 0; i < mb.n_bins; i++)
    fftfreqs[i] = (double)sr / 2.0 * i / (mb.n_bins - 1);
  double m_lo = hz_to_mel_slaney(fmin), m_hi = hz_to_mel_slaney(fmax);
  for (int i = 0; i < n_mels + 2; i++)
    hz[i] = mel_to_hz_slaney(m_lo + (m_hi - m_lo) * i / (n_mels + 1));
  for (int m = 0; m < n_mels; m++) {
    double enorm = 2.0 / (hz[m + 2] - hz[m]);
    for (int k = 0; k < mb.n_bins; k++) {
      double lower = (fftfreqs[k] - hz[m]) / (hz[m + 1] - hz[m]);
      double upper = (hz[m + 2] - fftfreqs[k]) / (hz[m + 2] - hz[m + 1]);
      double v = std::min(lower, upper);
      if (v > 0) mb.w[(size_t)m * mb.n_bins + k] = (float)(v * enorm);
    }
  }
  return mb;
}

}  // namespace

extern "C" {

// Returns the number of STFT frames for a given wav length (librosa
// centered framing: 1 + floor(padded / hop) with pad n_fft/2 each side).
int n3d_mel_frames(int wav_len, int n_fft, int hop) {
  int padded = wav_len + 2 * (n_fft / 2);
  return 1 + (padded - n_fft) / hop;
}

// mel: [n_mels, frames] row-major into `out`. Returns frame count or -1.
int n3d_melspectrogram(const float* wav, int wav_len, float* out, int sr,
                       int n_fft, int hop, int win, int n_mels, double fmin,
                       double fmax, double preemph, double ref_level_db,
                       double min_level_db, double max_abs_value) {
  if (wav_len <= 0) return -1;
  // pre-emphasis y[t] = x[t] - k x[t-1]  (scipy lfilter([1,-k],[1]))
  std::vector<double> y(wav_len);
  y[0] = wav[0];
  for (int t = 1; t < wav_len; t++) y[t] = wav[t] - preemph * wav[t - 1];

  // reflect pad n_fft/2
  const int pad = n_fft / 2;
  std::vector<double> yp(wav_len + 2 * pad);
  for (int i = 0; i < pad; i++) yp[i] = y[pad - i];
  for (int i = 0; i < wav_len; i++) yp[pad + i] = y[i];
  for (int i = 0; i < pad; i++) yp[pad + wav_len + i] = y[wav_len - 2 - i];

  const int frames = 1 + ((int)yp.size() - n_fft) / hop;
  const int n_bins = n_fft / 2 + 1;

  // hann window (periodic)
  std::vector<double> window(n_fft, 0.0);
  const int off = (n_fft - win) / 2;
  for (int i = 0; i < win; i++)
    window[off + i] = 0.5 - 0.5 * std::cos(2 * kPi * i / win);

  MelBasis mb = build_mel_basis(sr, n_fft, n_mels, fmin, fmax);
  const double min_level = std::exp(min_level_db / 20.0 * std::log(10.0));

  std::vector<double> mag(n_bins);
  std::vector<std::complex<double>> frame(n_fft), spec;
  for (int f = 0; f < frames; f++) {
    for (int i = 0; i < n_fft; i++)
      frame[i] = yp[(size_t)f * hop + i] * window[i];
    dft_bluestein(frame, spec);
    for (int k = 0; k < n_bins; k++) mag[k] = std::abs(spec[k]);
    for (int m = 0; m < n_mels; m++) {
      double s = 0;
      const float* wrow = &mb.w[(size_t)m * n_bins];
      for (int k = 0; k < n_bins; k++) s += wrow[k] * mag[k];
      double db = 20.0 * std::log10(std::max(min_level, s)) - ref_level_db;
      double v = (2 * max_abs_value) * ((db - min_level_db) / (-min_level_db)) -
                 max_abs_value;
      v = std::min(max_abs_value, std::max(-max_abs_value, v));
      out[(size_t)m * frames + f] = (float)v;
    }
  }
  return frames;
}

// ------------------------------------------------- threaded batch prefetch

struct Prefetcher {
  const float* data = nullptr;  // [n_items, item_size] borrowed
  int64_t n_items = 0, item_size = 0, batch = 0;
  uint64_t seed = 0;
  std::vector<int64_t> order;
  int64_t cursor = 0;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_full, cv_empty;
  std::queue<std::vector<float>> ready;
  size_t max_queue = 4;
  std::atomic<bool> stop{false};

  void shuffle_epoch() {
    order.resize(n_items);
    for (int64_t i = 0; i < n_items; i++) order[i] = i;
    std::mt19937_64 rng(seed++);
    for (int64_t i = n_items - 1; i > 0; i--) {
      std::uniform_int_distribution<int64_t> d(0, i);
      std::swap(order[i], order[d(rng)]);
    }
    cursor = 0;
  }

  void run() {
    shuffle_epoch();
    while (!stop.load()) {
      std::vector<float> buf((size_t)batch * item_size);
      for (int64_t b = 0; b < batch; b++) {
        if (cursor >= n_items) shuffle_epoch();
        const float* src = data + order[cursor++] * item_size;
        std::memcpy(buf.data() + (size_t)b * item_size, src,
                    sizeof(float) * item_size);
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_full.wait(lk, [&] { return ready.size() < max_queue || stop.load(); });
      if (stop.load()) return;
      ready.push(std::move(buf));
      cv_empty.notify_one();
    }
  }
};

void* n3d_prefetcher_create(const float* data, int64_t n_items,
                            int64_t item_size, int64_t batch, uint64_t seed) {
  auto* p = new Prefetcher();
  p->data = data;
  p->n_items = n_items;
  p->item_size = item_size;
  p->batch = batch;
  p->seed = seed;
  p->worker = std::thread([p] { p->run(); });
  return p;
}

// Blocks until a batch is ready; copies [batch, item_size] into out.
void n3d_prefetcher_next(void* handle, float* out) {
  auto* p = (Prefetcher*)handle;
  std::vector<float> buf;
  {
    std::unique_lock<std::mutex> lk(p->mu);
    p->cv_empty.wait(lk, [&] { return !p->ready.empty(); });
    buf = std::move(p->ready.front());
    p->ready.pop();
    p->cv_full.notify_one();
  }
  std::memcpy(out, buf.data(), sizeof(float) * buf.size());
}

void n3d_prefetcher_destroy(void* handle) {
  auto* p = (Prefetcher*)handle;
  p->stop.store(true);
  p->cv_full.notify_all();
  if (p->worker.joinable()) p->worker.join();
  delete p;
}

}  // extern "C"
