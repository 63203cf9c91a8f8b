// fastloader: multithreaded JPEG decode + resize + center-crop for the host
// input pipeline.
//
// The reference's data loading rides torch DataLoader worker processes with
// PIL decode (see /root/reference/projects/med_benchmarking/datasets/*.py);
// this native component is the TPU framework's equivalent of a native data
// loader: a C++ thread pool decodes JPEG bytes with libjpeg, bilinear-resizes
// the shorter side to `out_size`, center-crops, and writes dense
// (N, out_size, out_size, 3) uint8 — one call per batch, no Python in the
// loop. Exposed through a plain C ABI consumed via ctypes
// (mmlearn_tpu/native/__init__.py).
//
// Build: g++ -O3 -march=native -shared -fPIC fastloader.cpp -ljpeg -lpthread
//        -o libfastloader.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes into an RGB buffer (allocated by caller as w*h*3 after a
// header probe, or grown via the out vector).
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& out,
                 int& width, int& height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  width = static_cast<int>(cinfo.output_width);
  height = static_cast<int>(cinfo.output_height);
  out.resize(static_cast<size_t>(width) * height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) *
                                    width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resample of a source crop rect (cx, cy, cw, ch) to a square
// (out_size, out_size) output; optional horizontal flip.
void resample_crop(const uint8_t* src, int w, int h, double cx, double cy,
                   double cw, double ch, int out_size, bool hflip,
                   uint8_t* dst) {
  const double sx_scale = cw / out_size;
  const double sy_scale = ch / out_size;
  for (int oy = 0; oy < out_size; ++oy) {
    const double sy = cy + (oy + 0.5) * sy_scale - 0.5;
    const int y0 = sy <= 0 ? 0 : static_cast<int>(sy);
    const int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    const double fy = sy - y0 < 0 ? 0 : sy - y0;
    for (int ox = 0; ox < out_size; ++ox) {
      const int out_x = hflip ? out_size - 1 - ox : ox;
      const double sx = cx + (ox + 0.5) * sx_scale - 0.5;
      const int x0 = sx <= 0 ? 0 : static_cast<int>(sx);
      const int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      const double fx = sx - x0 < 0 ? 0 : sx - x0;
      for (int c = 0; c < 3; ++c) {
        const double v00 = src[(static_cast<size_t>(y0) * w + x0) * 3 + c];
        const double v01 = src[(static_cast<size_t>(y0) * w + x1) * 3 + c];
        const double v10 = src[(static_cast<size_t>(y1) * w + x0) * 3 + c];
        const double v11 = src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
        const double v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                         v10 * fy * (1 - fx) + v11 * fy * fx;
        dst[(static_cast<size_t>(oy) * out_size + out_x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5);
      }
    }
  }
}

// Eval path: shorter side -> out_size, center crop. Matches
// mmlearn_tpu.datasets.builtin.image_utils.ImageTransform(train=False).
void resize_center_crop(const uint8_t* src, int w, int h, int out_size,
                        uint8_t* dst) {
  const int short_side = w < h ? w : h;
  const double scale = static_cast<double>(out_size) / short_side;
  const int nw = static_cast<int>(std::lround(w * scale));
  const int nh = static_cast<int>(std::lround(h * scale));
  const int left = (nw - out_size) / 2;
  const int top = (nh - out_size) / 2;
  // crop rect in source coordinates
  resample_crop(src, w, h, left / scale, top / scale, out_size / scale,
                out_size / scale, out_size, /*hflip=*/false, dst);
}

// splitmix64: tiny deterministic per-image RNG for the train augmentations.
struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  uint64_t next() {
    state += 0x9e3779b97f4a7c15ULL;
    uint64_t z = state;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
  }
  double uniform() {  // [0, 1)
    return (next() >> 11) * (1.0 / 9007199254740992.0);
  }
};

// Train path: random area-scale crop + resize + random horizontal flip.
// Matches ImageTransform(train=True): scale ~ U(smin, smax),
// crop = (w*sqrt(s), h*sqrt(s)) at a uniform offset, flip with p=pflip.
void random_resized_crop(const uint8_t* src, int w, int h, int out_size,
                         double smin, double smax, double pflip, uint64_t seed,
                         uint8_t* dst) {
  Rng rng(seed);
  const double s = smin + (smax - smin) * rng.uniform();
  const double root = std::sqrt(s);
  const int cw = w * root < 1 ? 1 : static_cast<int>(w * root);
  const int ch = h * root < 1 ? 1 : static_cast<int>(h * root);
  const int max_left = w - cw > 0 ? w - cw : 0;
  const int max_top = h - ch > 0 ? h - ch : 0;
  const int left = max_left > 0
                       ? static_cast<int>(rng.next() % (max_left + 1))
                       : 0;
  const int top = max_top > 0 ? static_cast<int>(rng.next() % (max_top + 1))
                              : 0;
  const bool flip = rng.uniform() < pflip;
  resample_crop(src, w, h, left, top, cw, ch, out_size, flip, dst);
}

}  // namespace

extern "C" {

// Decode one JPEG and write (out_size, out_size, 3) uint8. Returns 0 on
// success, nonzero on decode failure.
int fl_decode_jpeg_resize(const uint8_t* data, size_t len, int out_size,
                          uint8_t* out) {
  std::vector<uint8_t> raw;
  int w = 0, h = 0;
  if (!decode_jpeg(data, len, raw, w, h)) return 1;
  resize_center_crop(raw.data(), w, h, out_size, out);
  return 0;
}

// Train-path decode: random-resized-crop (area scale in [smin, smax]) +
// random horizontal flip (p=pflip), seeded per call. Returns 0 on success.
int fl_decode_jpeg_train(const uint8_t* data, size_t len, int out_size,
                         double smin, double smax, double pflip, uint64_t seed,
                         uint8_t* out) {
  std::vector<uint8_t> raw;
  int w = 0, h = 0;
  if (!decode_jpeg(data, len, raw, w, h)) return 1;
  random_resized_crop(raw.data(), w, h, out_size, smin, smax, pflip, seed,
                      out);
  return 0;
}

// Batched train-path decode with per-image seeds and a thread pool.
int fl_decode_jpeg_batch_train(const uint8_t* blob, const size_t* offsets,
                               int n, int out_size, double smin, double smax,
                               double pflip, const uint64_t* seeds,
                               uint8_t* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  const size_t item = static_cast<size_t>(out_size) * out_size * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const uint8_t* data = blob + offsets[i];
      const size_t len = offsets[i + 1] - offsets[i];
      if (fl_decode_jpeg_train(data, len, out_size, smin, smax, pflip,
                               seeds[i], out + item * i) != 0) {
        std::memset(out + item * i, 0, item);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// Batch variant with an internal thread pool. `offsets` has n+1 entries into
// `blob`; output is (n, out_size, out_size, 3) contiguous. Returns the number
// of failed decodes (their slots are zeroed).
int fl_decode_jpeg_batch(const uint8_t* blob, const size_t* offsets, int n,
                         int out_size, uint8_t* out, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  const size_t item = static_cast<size_t>(out_size) * out_size * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const uint8_t* data = blob + offsets[i];
      const size_t len = offsets[i + 1] - offsets[i];
      if (fl_decode_jpeg_resize(data, len, out_size, out + item * i) != 0) {
        std::memset(out + item * i, 0, item);
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
