// Native data-pipeline kernels for quant_tpu.
//
// The host-side input pipeline (shuffle + gather + crop/flip augmentation)
// is the one part of the training loop that runs on CPU every step; the
// pure-numpy version loops per image in Python. These kernels are the
// native replacement: OpenMP-parallel over the batch, branch-free inner
// loops, own counter-based RNG so results are reproducible from a seed.
//
// Exposed as a plain C ABI consumed via ctypes
// (quant_tpu/data/native.py). Build: scripts/build_native.sh.

#include <cstdint>
#include <cstring>

namespace {

// splitmix64: tiny, high-quality, seedable per-index generator.
inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ull;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ull;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebull;
  return x ^ (x >> 31);
}

}  // namespace

extern "C" {

// Fisher-Yates shuffle of idx[0..n) seeded deterministically.
void qtd_shuffle(int32_t* idx, int64_t n, uint64_t seed) {
  for (int64_t i = n - 1; i > 0; --i) {
    uint64_t r = splitmix64(seed + static_cast<uint64_t>(i));
    int64_t j = static_cast<int64_t>(r % static_cast<uint64_t>(i + 1));
    int32_t t = idx[i];
    idx[i] = idx[j];
    idx[j] = t;
  }
}

// Gather rows: dst[b] = src[idx[b]], each row `row_elems` floats.
void qtd_gather(const float* src, const int32_t* idx, float* dst,
                int64_t batch, int64_t row_elems) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    std::memcpy(dst + b * row_elems,
                src + static_cast<int64_t>(idx[b]) * row_elems,
                sizeof(float) * static_cast<size_t>(row_elems));
  }
}

namespace {
inline void fill_pad(float* d, const float* pad_vals, int64_t c,
                     int64_t count) {
  for (int64_t i = 0; i < count; ++i)
    for (int64_t ch = 0; ch < c; ++ch) d[i * c + ch] = pad_vals[ch];
}
}  // namespace

// RandomCrop(h, pad) + horizontal flip over an NHWC batch.
// in:  (n, h, w, c) float32; out: same shape. Out-of-bounds pixels are
// filled with pad_vals[c] — the normalized value of a raw black pixel,
// matching torchvision's pad-then-normalize ordering.
// Per-image offsets/flip are derived from (seed, image index) so the
// augmentation stream is reproducible and order-independent.
void qtd_crop_flip(const float* in, float* out, int64_t n, int64_t h,
                   int64_t w, int64_t c, int64_t pad, uint64_t seed,
                   const float* pad_vals) {
  const int64_t span = 2 * pad + 1;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    uint64_t r = splitmix64(seed ^ (0x517cc1b727220a95ull *
                                    static_cast<uint64_t>(i + 1)));
    const int64_t dy = static_cast<int64_t>(r % span) - pad;
    const int64_t dx = static_cast<int64_t>((r >> 21) % span) - pad;
    const bool flip = ((r >> 42) & 1ull) != 0;

    const float* src = in + i * h * w * c;
    float* dst = out + i * h * w * c;
    for (int64_t y = 0; y < h; ++y) {
      const int64_t sy = y + dy;
      if (sy < 0 || sy >= h) {
        fill_pad(dst + y * w * c, pad_vals, c, w);
        continue;
      }
      for (int64_t x = 0; x < w; ++x) {
        const int64_t out_x = flip ? (w - 1 - x) : x;
        const int64_t sx = x + dx;
        float* d = dst + (y * w + out_x) * c;
        if (sx < 0 || sx >= w) {
          fill_pad(d, pad_vals, c, 1);
        } else {
          std::memcpy(d, src + (sy * w + sx) * c, sizeof(float) * c);
        }
      }
    }
  }
}

// Fused shuffle-gather-augment for one batch: dst[b] =
// crop_flip(src[order[start+b]]). Saves one intermediate copy.
void qtd_make_batch(const float* src, const int32_t* order, int64_t start,
                    float* dst, int64_t batch, int64_t h, int64_t w,
                    int64_t c, int64_t pad, uint64_t seed, int augment,
                    const float* pad_vals) {
  const int64_t row = h * w * c;
  if (!augment) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < batch; ++b) {
      std::memcpy(dst + b * row,
                  src + static_cast<int64_t>(order[start + b]) * row,
                  sizeof(float) * static_cast<size_t>(row));
    }
    return;
  }
  const int64_t span = 2 * pad + 1;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t i = order[start + b];
    uint64_t r = splitmix64(seed ^ (0x517cc1b727220a95ull *
                                    static_cast<uint64_t>(start + b + 1)));
    const int64_t dy = static_cast<int64_t>(r % span) - pad;
    const int64_t dx = static_cast<int64_t>((r >> 21) % span) - pad;
    const bool flip = ((r >> 42) & 1ull) != 0;
    const float* s = src + i * row;
    float* d0 = dst + b * row;
    for (int64_t y = 0; y < h; ++y) {
      const int64_t sy = y + dy;
      if (sy < 0 || sy >= h) {
        fill_pad(d0 + y * w * c, pad_vals, c, w);
        continue;
      }
      for (int64_t x = 0; x < w; ++x) {
        const int64_t out_x = flip ? (w - 1 - x) : x;
        const int64_t sx = x + dx;
        float* d = d0 + (y * w + out_x) * c;
        if (sx < 0 || sx >= w) {
          fill_pad(d, pad_vals, c, 1);
        } else {
          std::memcpy(d, s + (sy * w + sx) * c, sizeof(float) * c);
        }
      }
    }
  }
}

}  // extern "C"
