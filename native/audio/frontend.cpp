// Native host audio frontend: framed STFT magnitude + mel projection.
//
// The data pipeline's hot host-side op (the reference does this with
// torch.stft in dataloader worker processes, matcha/utils/audio.py:45-82).
// Semantics match matcha_tpu/audio/mel.py exactly: reflect pad by
// (n_fft - hop)/2, periodic Hann window, center=False framing, magnitude
// sqrt(re^2 + im^2 + 1e-9), caller-provided mel filterbank, log-clamp.
// OpenMP parallelises over frames.
//
// Build: g++ -O3 -fopenmp -shared -fPIC frontend.cpp -o libaudio.so

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// Iterative radix-2 complex FFT (n must be a power of two).
void fft_radix2(float* re, float* im, int n) {
  // bit-reversal permutation
  for (int i = 1, j = 0; i < n; ++i) {
    int bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  for (int len = 2; len <= n; len <<= 1) {
    const double ang = -2.0 * kPi / len;
    const float wr = static_cast<float>(std::cos(ang));
    const float wi = static_cast<float>(std::sin(ang));
    for (int i = 0; i < n; i += len) {
      float cur_r = 1.0f, cur_i = 0.0f;
      for (int k = 0; k < len / 2; ++k) {
        const int a = i + k, b = i + k + len / 2;
        const float tr = re[b] * cur_r - im[b] * cur_i;
        const float ti = re[b] * cur_i + im[b] * cur_r;
        re[b] = re[a] - tr;
        im[b] = im[a] - ti;
        re[a] += tr;
        im[a] += ti;
        const float nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
    }
  }
}

// Real-input FFT of n samples via one n/2-point complex FFT (even samples
// packed as the real part, odd as the imaginary part), then the standard
// split into even/odd spectra with one twiddle pass. Halves the butterfly
// work vs a full complex FFT of length n — the same trick pocketfft uses.
//   x:          n real samples
//   zre/zim:    n/2 scratch
//   Xre/Xim:    n/2 + 1 outputs (non-negative frequencies)
//   tw_c/tw_s:  cos/sin(2*pi*k/n), k in [0, n/2)
void rfft(const float* x, int n, float* zre, float* zim, float* Xre,
          float* Xim, const float* tw_c, const float* tw_s) {
  const int N = n / 2;
  for (int k = 0; k < N; ++k) {
    zre[k] = x[2 * k];
    zim[k] = x[2 * k + 1];
  }
  fft_radix2(zre, zim, N);
  Xre[0] = zre[0] + zim[0];
  Xim[0] = 0.0f;
  Xre[N] = zre[0] - zim[0];
  Xim[N] = 0.0f;
  for (int k = 1; k < N; ++k) {
    const float ar = zre[k], ai = zim[k];
    const float br = zre[N - k], bi = -zim[N - k];  // conj(Z[N-k])
    const float er = 0.5f * (ar + br), ei = 0.5f * (ai + bi);   // even spectrum
    const float onr = 0.5f * (ai - bi), oni = -0.5f * (ar - br);  // odd/(2i)
    const float c = tw_c[k], s = tw_s[k];  // e^{-2*pi*i*k/n} = c - i*s
    Xre[k] = er + c * onr + s * oni;
    Xim[k] = ei + c * oni - s * onr;
  }
}

}  // namespace

extern "C" {

// audio:   (n_samples,) float32 in [-1, 1]
// mel_fb:  (n_mels, n_fft/2 + 1) float32 filterbank
// out:     (n_mels, n_frames) float32 log-mel, n_frames = n_samples / hop
//          (caller allocates; computed with the padded framing below)
// returns the number of frames written, or -1 on invalid args.
int32_t mel_spectrogram_c(const float* audio, int64_t n_samples,
                          const float* mel_fb, int32_t n_mels, int32_t n_fft,
                          int32_t hop, float* out) {
  if (n_fft <= 0 || (n_fft & (n_fft - 1)) != 0 || hop <= 0) return -1;
  const int64_t pad = (n_fft - hop) / 2;
  const int64_t padded = n_samples + 2 * pad;
  if (padded < n_fft) return -1;
  const int64_t n_frames = 1 + (padded - n_fft) / hop;
  const int32_t n_freq = n_fft / 2 + 1;

  // reflect-padded sample accessor
  std::vector<float> buf(padded);
  for (int64_t i = 0; i < padded; ++i) {
    int64_t s = i - pad;
    if (s < 0) s = -s;
    if (s >= n_samples) s = 2 * (n_samples - 1) - s;
    buf[i] = audio[s];
  }

  std::vector<float> window(n_fft);
  for (int32_t i = 0; i < n_fft; ++i) {
    window[i] = 0.5f - 0.5f * static_cast<float>(std::cos(2.0 * kPi * i / n_fft));
  }

  // rfft twiddles cos/sin(2*pi*k/n_fft)
  std::vector<float> tw_c(n_fft / 2), tw_s(n_fft / 2);
  for (int32_t k = 0; k < n_fft / 2; ++k) {
    tw_c[k] = static_cast<float>(std::cos(2.0 * kPi * k / n_fft));
    tw_s[k] = static_cast<float>(std::sin(2.0 * kPi * k / n_fft));
  }

  // Mel rows are contiguous triangles (Slaney filterbank): precompute each
  // row's nonzero band so the projection is O(band) not O(n_freq) — the
  // dense dot is ~20x wasted work at 80 mels over 513 bins.
  std::vector<int32_t> lo(n_mels, 0), hi(n_mels, 0);
  for (int32_t m = 0; m < n_mels; ++m) {
    const float* fb = mel_fb + static_cast<int64_t>(m) * n_freq;
    int32_t a = 0;
    while (a < n_freq && fb[a] == 0.0f) ++a;
    int32_t b = n_freq;
    while (b > a && fb[b - 1] == 0.0f) --b;
    lo[m] = a;
    hi[m] = b;
  }

#pragma omp parallel
  {
    std::vector<float> frame_w(n_fft), zre(n_fft / 2), zim(n_fft / 2);
    std::vector<float> re(n_freq), im(n_freq), mag(n_freq);
#pragma omp for schedule(static)
    for (int64_t t = 0; t < n_frames; ++t) {
      const float* frame = buf.data() + t * hop;
      for (int32_t i = 0; i < n_fft; ++i) frame_w[i] = frame[i] * window[i];
      rfft(frame_w.data(), n_fft, zre.data(), zim.data(), re.data(), im.data(),
           tw_c.data(), tw_s.data());
      for (int32_t f = 0; f < n_freq; ++f) {
        mag[f] = std::sqrt(re[f] * re[f] + im[f] * im[f] + 1e-9f);
      }
      for (int32_t m = 0; m < n_mels; ++m) {
        const float* fb = mel_fb + static_cast<int64_t>(m) * n_freq;
        float acc = 0.0f;
        for (int32_t f = lo[m]; f < hi[m]; ++f) acc += fb[f] * mag[f];
        out[static_cast<int64_t>(m) * n_frames + t] =
            std::log(acc < 1e-5f ? 1e-5f : acc);
      }
    }
  }
  return static_cast<int32_t>(n_frames);
}

}  // extern "C"
