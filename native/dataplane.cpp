// deco_tpu native data-plane: threaded JPEG decode + ADM center-crop.
//
// TPU-native equivalent of the reference stack's native input path (torch's
// C++ DataLoader workers + PIL's C decoders feeding
// src/data/dataset/imagenet.py of hhhhzp/DeCo). The host CPUs that feed a
// TPU pod slice must sustain (chips x ~70) images/sec of JPEG decode +
// resample; the Python/PIL path tops out far below that on one core, so the
// hot loop lives here and Python drives it through a C ABI (ctypes).
//
// Semantics contract (FID-critical, tests/test_native_dataplane.py): the
// output must match deco_tpu.data.imagenet.adm_center_crop — the
// guided-diffusion pipeline of repeated //2 BOX downsamples, one BICUBIC
// resize putting the short side at `resolution`, then a center crop. The
// resampler below therefore reimplements PIL's convolution-based scheme
// (per-output-pixel clamped filter windows, normalized weights, separable
// H-then-V passes) with float accumulation; agreement with Pillow is within
// +-1 LSB which is far below JPEG's own reconstruction error.
//
// Build: scripts/build_native.sh  (g++ -O3 -shared -fPIC, links libjpeg).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// PIL-compatible separable resampling (BOX and BICUBIC/Catmull-Rom a=-0.5)
// ---------------------------------------------------------------------------

struct Filter {
  double (*fn)(double);
  double support;
};

double box_filter(double x) { return (x > -0.5 && x <= 0.5) ? 1.0 : 0.0; }

double bicubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

const Filter kBox{box_filter, 0.5};
const Filter kBicubic{bicubic_filter, 2.0};

// Precompute, for every output index, the input window [bound0, bound0+n)
// and its normalized weights.
struct Coeffs {
  std::vector<int> bounds;    // 2 per output pixel: start, count
  std::vector<float> weights; // kmax per output pixel (float: SIMD width)
  int kmax;
};

Coeffs precompute(int in_size, int out_size, const Filter& f) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = f.support * filterscale;
  c.kmax = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.bounds.resize(2 * out_size);
  c.weights.assign(static_cast<size_t>(out_size) * c.kmax, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = std::max(0, static_cast<int>(center - support + 0.5));
    int xmax = std::min(in_size, static_cast<int>(center + support + 0.5));
    int n = xmax - xmin;
    float* w = &c.weights[static_cast<size_t>(xx) * c.kmax];
    double total = 0.0;
    std::vector<double> raw(n);
    for (int x = 0; x < n; ++x) {
      raw[x] = f.fn((x + xmin - center + 0.5) / filterscale);
      total += raw[x];
    }
    for (int x = 0; x < n; ++x)
      w[x] = static_cast<float>(total != 0.0 ? raw[x] / total : raw[x]);
    c.bounds[2 * xx] = xmin;
    c.bounds[2 * xx + 1] = n;
  }
  return c;
}

inline uint8_t clip8(float v) {
  int i = static_cast<int>(std::lround(v));
  return static_cast<uint8_t>(std::min(255, std::max(0, i)));
}

// Separable resample of an interleaved RGB uint8 image. Like PIL, the
// horizontal pass materializes a ROUNDED uint8 intermediate before the
// vertical pass — keeping a float intermediate drifts up to 1 LSB per pass
// from Pillow's output, which compounds across the ADM halving chain.
void resample(const uint8_t* in, int in_w, int in_h, uint8_t* out, int out_w,
              int out_h, const Filter& f) {
  Coeffs ch = precompute(in_w, out_w, f);
  Coeffs cv = precompute(in_h, out_h, f);
  // horizontal pass into a uint8 intermediate (in_h x out_w)
  std::vector<uint8_t> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int y = 0; y < in_h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * in_w * 3;
    uint8_t* trow = &tmp[static_cast<size_t>(y) * out_w * 3];
    for (int xx = 0; xx < out_w; ++xx) {
      int xmin = ch.bounds[2 * xx], n = ch.bounds[2 * xx + 1];
      const float* w = &ch.weights[static_cast<size_t>(xx) * ch.kmax];
      float r = 0, g = 0, b = 0;
      const uint8_t* px = row + static_cast<size_t>(xmin) * 3;
      for (int x = 0; x < n; ++x, px += 3) {
        r += px[0] * w[x];
        g += px[1] * w[x];
        b += px[2] * w[x];
      }
      trow[xx * 3 + 0] = clip8(r);
      trow[xx * 3 + 1] = clip8(g);
      trow[xx * 3 + 2] = clip8(b);
    }
  }
  // vertical pass: per-output-row AXPY over contiguous input rows (the
  // strided per-column loop defeats both cache and vectorizer)
  std::vector<float> acc(static_cast<size_t>(out_w) * 3);
  for (int yy = 0; yy < out_h; ++yy) {
    int ymin = cv.bounds[2 * yy], n = cv.bounds[2 * yy + 1];
    const float* w = &cv.weights[static_cast<size_t>(yy) * cv.kmax];
    std::fill(acc.begin(), acc.end(), 0.0f);
    for (int y = 0; y < n; ++y) {
      const uint8_t* trow = &tmp[static_cast<size_t>(ymin + y) * out_w * 3];
      float wy = w[y];
      for (int xx = 0; xx < out_w * 3; ++xx) acc[xx] += trow[xx] * wy;
    }
    uint8_t* orow = out + static_cast<size_t>(yy) * out_w * 3;
    for (int xx = 0; xx < out_w * 3; ++xx) orow[xx] = clip8(acc[xx]);
  }
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg, PIL-default ISLOW DCT -> identical pixels to PIL)
// ---------------------------------------------------------------------------

struct JpegError {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void on_jpeg_error(j_common_ptr cinfo) {
  JpegError* err = reinterpret_cast<JpegError*>(cinfo->err);
  longjmp(err->jump, 1);
}

// returns true on success; rgb is resized to w*h*3
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& rgb,
                 int& w, int& h) {
  jpeg_decompress_struct cinfo;
  JpegError jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = on_jpeg_error;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr -> RGB like PIL convert
  cinfo.dct_method = JDCT_ISLOW;    // PIL default; bit-identical decode
  jpeg_start_decompress(&cinfo);
  w = static_cast<int>(cinfo.output_width);
  h = static_cast<int>(cinfo.output_height);
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// ADM pipeline (guided-diffusion center_crop_arr; imagenet.py:12-32)
// ---------------------------------------------------------------------------

bool adm_center_crop(std::vector<uint8_t>& img, int& w, int& h,
                     int resolution) {
  // repeated //2 BOX downsample while the short side is >= 2*resolution
  while (std::min(w, h) >= 2 * resolution) {
    int nw = w / 2, nh = h / 2;
    std::vector<uint8_t> next(static_cast<size_t>(nw) * nh * 3);
    resample(img.data(), w, h, next.data(), nw, nh, kBox);
    img.swap(next);
    w = nw;
    h = nh;
  }
  // one BICUBIC resize: short side -> resolution (PIL round() semantics)
  // Python round() is round-half-to-even (banker's rounding); std::lround
  // rounds half away from zero, which diverges for sizes landing exactly on
  // .5 (e.g. 509*256/512 = 254.5 -> Python 254, lround 255) and would shift
  // the center crop. nearbyint under FE_TONEAREST matches Python exactly.
  double scale = static_cast<double>(resolution) / std::min(w, h);
  int nw = static_cast<int>(std::nearbyint(w * scale));
  int nh = static_cast<int>(std::nearbyint(h * scale));
  if (nw != w || nh != h) {
    std::vector<uint8_t> next(static_cast<size_t>(nw) * nh * 3);
    resample(img.data(), w, h, next.data(), nw, nh, kBicubic);
    img.swap(next);
    w = nw;
    h = nh;
  }
  if (w < resolution || h < resolution) return false;
  // center crop
  int y0 = (h - resolution) / 2, x0 = (w - resolution) / 2;
  std::vector<uint8_t> out(static_cast<size_t>(resolution) * resolution * 3);
  for (int y = 0; y < resolution; ++y)
    std::memcpy(&out[static_cast<size_t>(y) * resolution * 3],
                &img[(static_cast<size_t>(y0 + y) * w + x0) * 3],
                static_cast<size_t>(resolution) * 3);
  img.swap(out);
  w = h = resolution;
  return true;
}

}  // namespace

extern "C" {

int dp_version() { return 1; }

// Decode one JPEG and ADM-center-crop it to resolution x resolution x 3.
// out must hold resolution*resolution*3 bytes. Returns 0 on success.
int dp_decode_jpeg_adm(const unsigned char* data, size_t len, int resolution,
                       unsigned char* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(data, len, rgb, w, h)) return 1;
  if (!adm_center_crop(rgb, w, h, resolution)) return 2;
  std::memcpy(out, rgb.data(),
              static_cast<size_t>(resolution) * resolution * 3);
  return 0;
}

// Threaded batch: n images packed in one buffer at offsets[i] with lens[i];
// out is n*resolution*resolution*3; status[i] gets the per-image rc.
// Returns the number of failures.
int dp_decode_jpeg_adm_batch(const unsigned char* data, const size_t* offsets,
                             const size_t* lens, int n, int resolution,
                             unsigned char* out, int* status,
                             int num_threads) {
  if (num_threads < 1) num_threads = 1;
  num_threads = std::min(num_threads, n);
  std::atomic<int> next(0), failures(0);
  size_t img_bytes = static_cast<size_t>(resolution) * resolution * 3;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      int rc = dp_decode_jpeg_adm(data + offsets[i], lens[i], resolution,
                                  out + img_bytes * i);
      status[i] = rc;
      if (rc != 0) {
        std::memset(out + img_bytes * i, 0, img_bytes);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Standalone PIL-compatible resize (filter: 0 = BOX, 1 = BICUBIC); used by
// the parity tests and available for custom pipelines.
int dp_resize(const unsigned char* in, int in_w, int in_h, unsigned char* out,
              int out_w, int out_h, int filter) {
  if (in_w <= 0 || in_h <= 0 || out_w <= 0 || out_h <= 0) return 1;
  resample(in, in_w, in_h, out, out_w, out_h, filter == 0 ? kBox : kBicubic);
  return 0;
}

}  // extern "C"
