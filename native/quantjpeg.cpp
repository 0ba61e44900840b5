// Native JPEG decode + crop + resize for the ImageNet input pipeline.
//
// The reference feeds ImageNet through torchvision/PIL worker processes
// (apple/ml-quant quant/data/data_loaders.py: DataLoader num_workers);
// quant_tpu's equivalent is a thread pool over this library. Each call
// decodes ONE image (ctypes releases the GIL, so the Python thread pool
// provides the parallelism) with two decode-side wins over PIL:
//
//   * libjpeg scaled decode: the IDCT runs at 1/2, 1/4 or 1/8 scale when
//     the requested crop only needs that resolution (RandomResizedCrop
//     boxes resized down to 224 rarely need full-res pixels) — up to
//     ~8x less IDCT + color-convert work.
//   * fused crop: only the crop box is carried into the resize; the
//     full-res RGB image for a small crop is never materialized past
//     the row buffer.
//
// Resampling is PIL-convention bilinear (triangle filter whose support
// widens with the downscale factor, the Pillow>=2.7 behavior that
// torchvision inherits), so outputs track the PIL path closely; the
// Python tests compare the two within a small tolerance.
//
// API (ctypes, see quant_tpu/data/native_jpeg.py):
//   qj_probe(buf, n, &w, &h)                       -> 0 ok
//   qj_decode(buf, n, x0, y0, cw, ch, ow, oh, flip, out) -> 0 ok
//     crop box in ORIGINAL image coordinates; cw==0 means full image;
//     out is uint8 RGB (oh, ow, 3), flip mirrors horizontally.

#include <csetjmp>
#include <cmath>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE declared first
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jb;
};

void on_error(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  std::longjmp(err->jb, 1);
}

void silence(j_common_ptr, int) {}
void silence_msg(j_common_ptr) {}

// PIL-convention separable resize weights for one axis: triangle filter
// with support = max(1, in/out). Precomputed once per axis per call.
struct AxisWeights {
  std::vector<int> first;    // per output index: first source index
  std::vector<int> count;    // taps
  std::vector<float> w;      // flattened weights, max_taps stride
  int max_taps = 0;
};

AxisWeights make_weights(int in, int out) {
  AxisWeights aw;
  double scale = static_cast<double>(in) / out;
  double fscale = scale < 1.0 ? 1.0 : scale;
  double support = fscale;  // bilinear filter radius 1.0 * fscale
  aw.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  aw.first.resize(out);
  aw.count.resize(out);
  aw.w.assign(static_cast<size_t>(out) * aw.max_taps, 0.0f);
  for (int i = 0; i < out; ++i) {
    double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in) xmax = in;
    int n = xmax - xmin;
    if (n > aw.max_taps) n = aw.max_taps;
    double total = 0.0;
    std::vector<double> tmp(n);
    for (int k = 0; k < n; ++k) {
      double x = (xmin + k + 0.5 - center) / fscale;
      double v = x < 0 ? -x : x;
      v = v >= 1.0 ? 0.0 : 1.0 - v;  // triangle
      tmp[k] = v;
      total += v;
    }
    if (total <= 0.0) { tmp.assign(n, 1.0); total = n; }
    aw.first[i] = xmin;
    aw.count[i] = n;
    for (int k = 0; k < n; ++k)
      aw.w[static_cast<size_t>(i) * aw.max_taps + k] =
          static_cast<float>(tmp[k] / total);
  }
  return aw;
}

inline uint8_t clamp_u8(float v) {
  int i = static_cast<int>(v + 0.5f);
  if (i < 0) i = 0;
  if (i > 255) i = 255;
  return static_cast<uint8_t>(i);
}

}  // namespace

extern "C" {

int qj_probe(const uint8_t* buf, int64_t n, int32_t* w, int32_t* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = on_error;
  err.pub.emit_message = silence;
  err.pub.output_message = silence_msg;
  if (setjmp(err.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(n));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  *w = static_cast<int32_t>(cinfo.image_width);
  *h = static_cast<int32_t>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int qj_decode(const uint8_t* buf, int64_t n,
              int32_t x0, int32_t y0, int32_t cw, int32_t ch,
              int32_t out_w, int32_t out_h, int32_t flip,
              uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = on_error;
  err.pub.emit_message = silence;
  err.pub.output_message = silence_msg;
  // Heap buffers via volatile pointers: locals modified after setjmp
  // are indeterminate after a longjmp (libjpeg's error_exit), and a
  // longjmp must not skip destructors of non-trivial locals.
  std::vector<uint8_t>* volatile rows = nullptr;
  std::vector<uint8_t>* volatile line = nullptr;
  if (setjmp(err.jb)) {
    delete rows;
    delete line;
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(n));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  const int iw = static_cast<int>(cinfo.image_width);
  const int ih = static_cast<int>(cinfo.image_height);
  if (cw == 0) { x0 = 0; y0 = 0; cw = iw; ch = ih; }
  if (x0 < 0 || y0 < 0 || cw <= 0 || ch <= 0 ||
      x0 + cw > iw || y0 + ch > ih || out_w <= 0 || out_h <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }

  // Largest DCT downscale (1/1, 1/2, 1/4, 1/8) that keeps the scaled
  // crop box at least as large as the output (never upsample a box the
  // full-res decode could have served better).
  int denom = 1;
  while (denom < 8 && (cw / (denom * 2)) >= out_w &&
         (ch / (denom * 2)) >= out_h)
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = static_cast<unsigned int>(denom);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int sw = static_cast<int>(cinfo.output_width);
  const int sh = static_cast<int>(cinfo.output_height);
  // Crop box mapped into scaled coordinates (floor/ceil = never smaller).
  int sx0 = x0 / denom, sy0 = y0 / denom;
  int sx1 = (x0 + cw + denom - 1) / denom;
  int sy1 = (y0 + ch + denom - 1) / denom;
  if (sx1 > sw) sx1 = sw;
  if (sy1 > sh) sy1 = sh;
  const int bw = sx1 - sx0, bh = sy1 - sy0;

  // Decode; keep only the box rows/cols, stop at the box's last row.
  rows = new std::vector<uint8_t>(
      static_cast<size_t>(bh) * bw * 3);
  line = new std::vector<uint8_t>(static_cast<size_t>(sw) * 3);
  JSAMPROW rp[1] = {line->data()};
  int y = 0;
  while (cinfo.output_scanline < cinfo.output_height && y < sy1) {
    jpeg_read_scanlines(&cinfo, rp, 1);
    if (y >= sy0)
      std::memcpy(rows->data() + static_cast<size_t>(y - sy0) * bw * 3,
                  line->data() + static_cast<size_t>(sx0) * 3,
                  static_cast<size_t>(bw) * 3);
    ++y;
  }
  if (cinfo.output_scanline < cinfo.output_height)
    jpeg_abort_decompress(&cinfo);  // crop ends above the image bottom
  else
    jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  delete line;
  line = nullptr;

  // Separable PIL-style bilinear: horizontal then vertical.
  AxisWeights wx = make_weights(bw, out_w);
  AxisWeights wy = make_weights(bh, out_h);
  std::vector<float> mid(static_cast<size_t>(bh) * out_w * 3);
  for (int r = 0; r < bh; ++r) {
    const uint8_t* src = rows->data() + static_cast<size_t>(r) * bw * 3;
    float* dst = mid.data() + static_cast<size_t>(r) * out_w * 3;
    for (int i = 0; i < out_w; ++i) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const float* w = wx.w.data() + static_cast<size_t>(i) * wx.max_taps;
      const uint8_t* s = src + static_cast<size_t>(wx.first[i]) * 3;
      for (int k = 0; k < wx.count[i]; ++k) {
        acc0 += w[k] * s[3 * k];
        acc1 += w[k] * s[3 * k + 1];
        acc2 += w[k] * s[3 * k + 2];
      }
      dst[3 * i] = acc0; dst[3 * i + 1] = acc1; dst[3 * i + 2] = acc2;
    }
  }
  delete rows;
  for (int j = 0; j < out_h; ++j) {
    const float* wcol = wy.w.data() + static_cast<size_t>(j) * wy.max_taps;
    for (int i = 0; i < out_w; ++i) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < wy.count[j]; ++k) {
        const float* s = mid.data() +
            (static_cast<size_t>(wy.first[j] + k) * out_w + i) * 3;
        acc0 += wcol[k] * s[0];
        acc1 += wcol[k] * s[1];
        acc2 += wcol[k] * s[2];
      }
      int oi = flip ? (out_w - 1 - i) : i;
      uint8_t* d = out + (static_cast<size_t>(j) * out_w + oi) * 3;
      d[0] = clamp_u8(acc0); d[1] = clamp_u8(acc1); d[2] = clamp_u8(acc2);
    }
  }
  return 0;
}

// Fused ColorJitter + ImageNet normalization on a decoded uint8 image.
// Replicates quant_tpu.data.loaders.apply_color_jitter exactly
// (torchvision blend semantics, clamp after each op, ITU-R 601-2 luma):
//   op 0: x *= fb
//   op 1: x = x*fc + (1-fc)*mean(gray(x))   (image-wide mean)
//   op 2: x = x*fs + (1-fs)*gray(x)          (per pixel)
// then x = (x - mean[c]) / std[c]. n_ops = 0 -> normalize only (eval).
int qj_jitter_norm(const uint8_t* in, int64_t npix,
                   float fb, float fc, float fs,
                   const int32_t* order, int32_t n_ops,
                   const float* mean, const float* stdev,
                   float* out) {
  const float kGray[3] = {0.299f, 0.587f, 0.114f};
  const float inv255 = 1.0f / 255.0f;
  for (int64_t i = 0; i < npix * 3; ++i) out[i] = in[i] * inv255;
  for (int32_t o = 0; o < n_ops; ++o) {
    int op = order[o];
    if (op == 0) {
      for (int64_t i = 0; i < npix * 3; ++i) {
        float v = out[i] * fb;
        out[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      }
    } else if (op == 1) {
      double acc = 0.0;
      for (int64_t i = 0; i < npix; ++i)
        acc += out[3 * i] * kGray[0] + out[3 * i + 1] * kGray[1] +
               out[3 * i + 2] * kGray[2];
      float m = static_cast<float>(acc / npix) * (1.0f - fc);
      for (int64_t i = 0; i < npix * 3; ++i) {
        float v = out[i] * fc + m;
        out[i] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
      }
    } else if (op == 2) {
      for (int64_t i = 0; i < npix; ++i) {
        float g = (out[3 * i] * kGray[0] + out[3 * i + 1] * kGray[1] +
                   out[3 * i + 2] * kGray[2]) * (1.0f - fs);
        for (int c = 0; c < 3; ++c) {
          float v = out[3 * i + c] * fs + g;
          out[3 * i + c] = v < 0.f ? 0.f : (v > 1.f ? 1.f : v);
        }
      }
    } else {
      return 2;
    }
  }
  float inv_std[3] = {1.f / stdev[0], 1.f / stdev[1], 1.f / stdev[2]};
  for (int64_t i = 0; i < npix; ++i)
    for (int c = 0; c < 3; ++c)
      out[3 * i + c] = (out[3 * i + c] - mean[c]) * inv_std[c];
  return 0;
}

}  // extern "C"
