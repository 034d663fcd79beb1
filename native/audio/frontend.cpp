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

#pragma omp parallel
  {
    std::vector<float> re(n_fft), im(n_fft), mag(n_freq);
#pragma omp for schedule(static)
    for (int64_t t = 0; t < n_frames; ++t) {
      const float* frame = buf.data() + t * hop;
      for (int32_t i = 0; i < n_fft; ++i) {
        re[i] = frame[i] * window[i];
        im[i] = 0.0f;
      }
      fft_radix2(re.data(), im.data(), n_fft);
      for (int32_t f = 0; f < n_freq; ++f) {
        mag[f] = std::sqrt(re[f] * re[f] + im[f] * im[f] + 1e-9f);
      }
      for (int32_t m = 0; m < n_mels; ++m) {
        const float* fb = mel_fb + static_cast<int64_t>(m) * n_freq;
        float acc = 0.0f;
        for (int32_t f = 0; f < n_freq; ++f) acc += fb[f] * mag[f];
        out[static_cast<int64_t>(m) * n_frames + t] =
            std::log(acc < 1e-5f ? 1e-5f : acc);
      }
    }
  }
  return static_cast<int32_t>(n_frames);
}

}  // extern "C"
