// Native host-side components for birdsoundclassif_tpu.
//
// The TPU owns the compute path (JAX/XLA); this library owns the hot
// host-side work the reference delegated to librosa/ffmpeg/python loops:
//   * WAV decode (RIFF parse, PCM 8/16/24/32 + IEEE float, mono downmix)
//   * polyphase windowed-sinc resampling to 44.1 kHz
//   * greedy NMS (in given order) for host-side merging / tooling
//
// C ABI only — consumed via ctypes (no pybind11 in this environment).
// Build: python -m birdsoundclassif_tpu.native.build

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

// Returns 0 on success; fills *out (malloc'd, caller frees via nbm_free),
// *n_samples (mono), *sample_rate.
int nbm_read_wav(const char* path, float** out, int64_t* n_samples,
                 int32_t* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 44) { std::fclose(f); return -2; }
  std::vector<uint8_t> buf(static_cast<size_t>(size));
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);

  if (std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return -4;

  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sr = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    uint32_t chunk_size;
    std::memcpy(&chunk_size, buf.data() + pos + 4, 4);
    const uint8_t* body = buf.data() + pos + 8;
    if (pos + 8 + chunk_size > buf.size())
      chunk_size = static_cast<uint32_t>(buf.size() - pos - 8);
    if (std::memcmp(buf.data() + pos, "fmt ", 4) == 0 && chunk_size >= 16) {
      std::memcpy(&audio_format, body, 2);
      std::memcpy(&channels, body + 2, 2);
      std::memcpy(&sr, body + 4, 4);
      std::memcpy(&bits, body + 14, 2);
    } else if (std::memcmp(buf.data() + pos, "data", 4) == 0) {
      data = body;
      data_len = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);
  }
  if (!data || channels == 0) return -5;
  if (audio_format == 0xFFFE) audio_format = (bits == 32 ? 1 : 1);

  int64_t frames = 0;
  int bytes_per = bits / 8;
  if (bytes_per == 0) return -6;
  frames = data_len / (bytes_per * channels);
  float* mono = static_cast<float*>(std::malloc(sizeof(float) * frames));
  if (!mono) return -7;

  const double inv_ch = 1.0 / channels;
  if (audio_format == 1 && bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(data);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = static_cast<float>(acc * inv_ch / 32768.0);
    }
  } else if (audio_format == 1 && bits == 8) {
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c)
        acc += (static_cast<int>(data[i * channels + c]) - 128);
      mono[i] = static_cast<float>(acc * inv_ch / 128.0);
    }
  } else if (audio_format == 1 && bits == 24) {
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) {
        const uint8_t* p = data + (i * channels + c) * 3;
        int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        acc += v;
      }
      mono[i] = static_cast<float>(acc * inv_ch / 8388608.0);
    }
  } else if (audio_format == 1 && bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(data);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = static_cast<float>(acc * inv_ch / 2147483648.0);
    }
  } else if (audio_format == 3 && bits == 32) {
    const float* s = reinterpret_cast<const float*>(data);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = static_cast<float>(acc * inv_ch);
    }
  } else if (audio_format == 3 && bits == 64) {
    const double* s = reinterpret_cast<const double*>(data);
    for (int64_t i = 0; i < frames; ++i) {
      double acc = 0;
      for (int c = 0; c < channels; ++c) acc += s[i * channels + c];
      mono[i] = static_cast<float>(acc * inv_ch);
    }
  } else {
    std::free(mono);
    return -8;
  }
  *out = mono;
  *n_samples = frames;
  *sample_rate = static_cast<int32_t>(sr);
  return 0;
}

void nbm_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// polyphase windowed-sinc resampler (Kaiser window, beta ~ 8.6 => ~80 dB)
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Resample n samples from sr_in to sr_out. Returns output length; *out is
// malloc'd. Mirrors scipy.signal.resample_poly's zero-phase FIR structure.
int64_t nbm_resample(const float* in, int64_t n, int32_t sr_in, int32_t sr_out,
                     float** out) {
  if (sr_in == sr_out) {
    float* copy = static_cast<float*>(std::malloc(sizeof(float) * n));
    std::memcpy(copy, in, sizeof(float) * n);
    *out = copy;
    return n;
  }
  int64_t g = 1;
  {
    int64_t a = sr_in, b = sr_out;
    while (b) { int64_t t = a % b; a = b; b = t; }
    g = a;
  }
  const int64_t up = sr_out / g, down = sr_in / g;
  const int half_len_base = 10;  // taps per phase (scipy default n=10)
  const int64_t max_rate = std::max(up, down);
  const double f_c = 1.0 / static_cast<double>(max_rate);  // cutoff (relative)
  const int64_t half_len = half_len_base * max_rate;
  const int64_t fir_len = 2 * half_len + 1;
  const double beta = 8.555;  // kaiser_beta(kaiser_atten(n, f_c)) ~ scipy

  std::vector<double> h(fir_len);
  const double i0b = bessel_i0(beta);
  for (int64_t i = 0; i < fir_len; ++i) {
    const double m = static_cast<double>(i) - half_len;
    double sinc = (m == 0.0) ? f_c : std::sin(M_PI * f_c * m) / (M_PI * m);
    const double r = m / half_len;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    h[i] = sinc * w * up;
  }

  const int64_t n_out = (n * up + down - 1) / down;
  float* y = static_cast<float*>(std::malloc(sizeof(float) * n_out));
  if (!y) return -1;

  // polyphase evaluation: y[j] = sum_k h[phase + k*up] * x[start - k]
  for (int64_t j = 0; j < n_out; ++j) {
    const int64_t t_up = j * down;              // position in upsampled grid
    const int64_t x0 = (t_up + half_len) / up;  // aligned for zero phase
    const int64_t h0 = (t_up + half_len) - x0 * up;
    double acc = 0.0;
    for (int64_t k = 0;; ++k) {
      const int64_t hi = h0 + k * up;
      if (hi >= fir_len) break;
      const int64_t xi = x0 - k;
      if (xi < 0) break;
      if (xi < n) acc += h[hi] * in[xi];
    }
    y[j] = static_cast<float>(acc);
  }
  *out = y;
  return n_out;
}

// ---------------------------------------------------------------------------
// greedy NMS in given order (matches ops/nms.py greedy_nms_in_order)
// ---------------------------------------------------------------------------

// boxes: n x 4 (x1, y1, x2, y2); keep: n bytes out (1 = kept)
void nbm_nms_in_order(const float* boxes, const uint8_t* valid, int64_t n,
                      float iou_thresh, uint8_t* keep) {
  std::vector<float> area(n);
  for (int64_t i = 0; i < n; ++i) {
    area[i] = (boxes[i * 4 + 2] - boxes[i * 4 + 0] + 1.0f) *
              (boxes[i * 4 + 3] - boxes[i * 4 + 1] + 1.0f);
    keep[i] = valid[i];
  }
  for (int64_t i = 0; i < n; ++i) {
    if (!keep[i]) continue;
    const float x1 = boxes[i * 4], y1 = boxes[i * 4 + 1];
    const float x2 = boxes[i * 4 + 2], y2 = boxes[i * 4 + 3];
    for (int64_t j = i + 1; j < n; ++j) {
      if (!keep[j]) continue;
      const float ix1 = std::max(x1, boxes[j * 4 + 0]);
      const float iy1 = std::max(y1, boxes[j * 4 + 1]);
      const float ix2 = std::min(x2, boxes[j * 4 + 2]);
      const float iy2 = std::min(y2, boxes[j * 4 + 3]);
      const float iw = std::max(0.0f, ix2 - ix1 + 1.0f);
      const float ih = std::max(0.0f, iy2 - iy1 + 1.0f);
      const float inter = iw * ih;
      const float iou = inter / (area[i] + area[j] - inter);
      if (iou >= iou_thresh) keep[j] = 0;
    }
  }
}

// ---------------------------------------------------------------------------
// PCM wire codec encoder (matches audio/wirecodec.py encode())
// ---------------------------------------------------------------------------
//
// k-bit two's-complement first-difference packing with a clamped-outlier
// side table; k = 16 stores deltas wrapped mod 2^16 (no outliers). The
// numpy encoder is the reference semantics; this is the fast path for the
// inference prefetch thread (one pass vs several 100 MB numpy temporaries).

// Smallest k in {8, 10, 12, 13, 14} whose range holds all but
// <= outlier_cap deltas, else 16. Also returns that k's outlier count.
void nbm_wire_analyze(const int16_t* x, int64_t n, int64_t outlier_cap,
                      int32_t* k_out, int64_t* n_outliers_out) {
  static const int kCand[5] = {8, 10, 12, 13, 14};
  int64_t exceed[5] = {0, 0, 0, 0, 0};
  int32_t prev = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t d = static_cast<int32_t>(x[i]) - prev;
    prev = x[i];
    const int32_t mag = d < 0 ? -d : d;
    // a delta that fits width kCand[c] fits every larger width, so count
    // upward from the narrowest and stop at the first fit
    for (int c = 0; c < 5; ++c) {
      if (mag > (1 << (kCand[c] - 1)) - 1) ++exceed[c];
      else break;
    }
  }
  for (int c = 0; c < 5; ++c) {
    if (exceed[c] <= outlier_cap) {
      *k_out = kCand[c];
      *n_outliers_out = exceed[c];
      return;
    }
  }
  *k_out = 16;
  *n_outliers_out = 0;
}

// Pack into plane-major payload (bpg rows x n_groups cols, row-major) +
// outlier table. Returns the outlier count, or -1 if it exceeds cap.
int64_t nbm_wire_pack(const int16_t* x, int64_t n, int32_t k,
                      uint8_t* payload, int64_t n_groups,
                      int32_t* opos, int32_t* ores, int64_t cap) {
  int a = k, b = 8;
  while (b) { const int t = a % b; a = b; b = t; }
  const int g = 8 / a;  // samples per group: g * k is a whole byte count
  const int bpg = g * k / 8;
  const int32_t lo = -(1 << (k - 1)), hi = (1 << (k - 1)) - 1;
  const uint32_t mask = (1u << k) - 1u;
  int64_t n_out = 0;
  int32_t prev = 0;
  int64_t s = 0;
  for (int64_t q = 0; q < n_groups; ++q) {
    uint8_t gb[18] = {0};  // bpg <= 13; +2 slack for the 3-byte bit spill
    for (int j = 0; j < g; ++j, ++s) {
      uint32_t u = 0;
      if (s < n) {
        const int32_t d = static_cast<int32_t>(x[s]) - prev;
        prev = x[s];
        int32_t stored;
        if (k == 16) {
          stored = ((d + (1 << 15)) & 0xFFFF) - (1 << 15);
        } else {
          stored = d < lo ? lo : (d > hi ? hi : d);
          if (stored != d) {
            if (n_out >= cap) return -1;
            opos[n_out] = static_cast<int32_t>(s);
            ores[n_out] = d - stored;
            ++n_out;
          }
        }
        u = static_cast<uint32_t>(stored) & mask;
      }
      const int bit = j * k;
      const uint32_t v = u << (bit & 7);
      const int byte = bit >> 3;
      gb[byte] |= static_cast<uint8_t>(v & 0xFF);
      gb[byte + 1] |= static_cast<uint8_t>((v >> 8) & 0xFF);
      gb[byte + 2] |= static_cast<uint8_t>((v >> 16) & 0xFF);
    }
    for (int i = 0; i < bpg; ++i) payload[i * n_groups + q] = gb[i];
  }
  return n_out;
}

}  // extern "C"
