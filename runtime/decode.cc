// Native host runtime: threaded image decode pool (JPEG / PNG / WebP).
//
// The reference outsources image decode to OpenCV's C++ `imdecode`
// (lib/src/util/helpers.dart, face_detector.dart:1412-1430) — which accepts
// every common container — and hides its latency inside Dart isolates.  The
// TPU pipeline's host-side equivalent is this small libjpeg/libpng/libwebp
// decoder with a pthread worker pool: decode is the only remaining host
// compute, and at batch serving rates it must keep up with the device
// (SURVEY §7.3 "JPEG decode throughput").  Formats are routed by magic
// bytes; anything unrecognized (or a 16-bit PNG, whose 8-bit reduction is
// codec-specific) reports a status so the Python layer falls back to
// PIL/cv2 with identical semantics.
//
// C ABI (used from Python via ctypes — see utils/native.py):
//   fdt_image_probe(data, len, &w, &h)           -> 0 ok / <0 error
//   fdt_image_decode(data, len, out, w, h)       -> 0 ok / <0 error
//   fdt_jpeg_probe / fdt_jpeg_decode             -> JPEG-only (legacy names)
//   fdt_pool_create(threads)                     -> pool*
//   fdt_pool_decode_batch(pool, n, datas, lens, outs, ws, hs) -> 0/neg
//   fdt_pool_destroy(pool)
//
// Status codes: -2 corrupt stream, -3 bad header, -4 geometry mismatch,
// -5 unsupported format (route to the Python fallback).
//
// Output is tightly packed RGB888, row-major.  Alpha, when present, is
// dropped without compositing — matching both PIL's `convert("RGB")` and
// OpenCV's IMREAD_COLOR, so the fallback paths stay bit-identical.

#include <cstddef>  // size_t, required before jpeglib.h
#include <cstdio>   // FILE, required before jpeglib.h

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>

#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <condition_variable>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

int decode_one(const uint8_t* data, size_t len, uint8_t* out, int expect_w,
               int expect_h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;  // corrupt stream
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  if (expect_w > 0 && (w != expect_w || h != expect_h)) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -4;  // caller buffer sized for a different geometry
  }
  const int stride = w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + size_t(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int jpeg_probe_impl(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// PNG via libpng's simplified API.  16-bit sources (the suggested format
// carries PNG_FORMAT_FLAG_LINEAR) are reported unsupported: their 8-bit
// reduction is codec-specific, so they route to the Python fallback for a
// single source of truth.
int png_probe_impl(const uint8_t* data, size_t len, int* w, int* h) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return -3;
  if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    png_image_free(&image);
    return -5;
  }
  *w = static_cast<int>(image.width);
  *h = static_cast<int>(image.height);
  png_image_free(&image);
  return 0;
}

int png_decode_impl(const uint8_t* data, size_t len, uint8_t* out,
                    int expect_w, int expect_h) {
  png_image image;
  std::memset(&image, 0, sizeof image);
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, data, len)) return -3;
  if (image.format & PNG_FORMAT_FLAG_LINEAR) {
    png_image_free(&image);
    return -5;
  }
  if (static_cast<int>(image.width) != expect_w ||
      static_cast<int>(image.height) != expect_h) {
    png_image_free(&image);
    return -4;
  }
  // Read RGBA then drop alpha: requesting RGB would make libpng composite
  // alpha against a background, which PIL/cv2 (the fallback paths) do not.
  image.format = PNG_FORMAT_RGBA;
  std::vector<uint8_t> rgba(size_t(expect_w) * expect_h * 4);
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    png_image_free(&image);
    return -2;
  }
  const size_t n = size_t(expect_w) * expect_h;
  for (size_t i = 0; i < n; ++i) {
    out[i * 3 + 0] = rgba[i * 4 + 0];
    out[i * 3 + 1] = rgba[i * 4 + 1];
    out[i * 3 + 2] = rgba[i * 4 + 2];
  }
  return 0;
}

// WebP (static frames; animations make WebPDecodeRGBInto fail -> -2 and the
// Python layer falls back to PIL, which decodes the first frame).
int webp_probe_impl(const uint8_t* data, size_t len, int* w, int* h) {
  if (!WebPGetInfo(data, len, w, h)) return -3;
  return 0;
}

int webp_decode_impl(const uint8_t* data, size_t len, uint8_t* out,
                     int expect_w, int expect_h) {
  int w = 0, h = 0;
  if (!WebPGetInfo(data, len, &w, &h)) return -3;
  if (w != expect_w || h != expect_h) return -4;
  if (!WebPDecodeRGBInto(data, len, out, size_t(expect_w) * expect_h * 3,
                         expect_w * 3)) {
    return -2;
  }
  return 0;
}

enum class Fmt { kJpeg, kPng, kWebp, kUnknown };

Fmt sniff(const uint8_t* d, size_t len) {
  static const uint8_t kPngSig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A,
                                     0x1A, 0x0A};
  if (len >= 2 && d[0] == 0xFF && d[1] == 0xD8) return Fmt::kJpeg;
  if (len >= 8 && std::memcmp(d, kPngSig, 8) == 0) return Fmt::kPng;
  if (len >= 12 && std::memcmp(d, "RIFF", 4) == 0 &&
      std::memcmp(d + 8, "WEBP", 4) == 0) {
    return Fmt::kWebp;
  }
  return Fmt::kUnknown;
}

int probe_any(const uint8_t* data, size_t len, int* w, int* h) {
  switch (sniff(data, len)) {
    case Fmt::kJpeg: return jpeg_probe_impl(data, len, w, h);
    case Fmt::kPng: return png_probe_impl(data, len, w, h);
    case Fmt::kWebp: return webp_probe_impl(data, len, w, h);
    default: return -5;
  }
}

int decode_any(const uint8_t* data, size_t len, uint8_t* out, int expect_w,
               int expect_h) {
  switch (sniff(data, len)) {
    case Fmt::kJpeg: return decode_one(data, len, out, expect_w, expect_h);
    case Fmt::kPng: return png_decode_impl(data, len, out, expect_w,
                                           expect_h);
    case Fmt::kWebp: return webp_decode_impl(data, len, out, expect_w,
                                             expect_h);
    default: return -5;
  }
}

class DecodePool {
 public:
  explicit DecodePool(int threads) : stop_(false) {
    if (threads < 1) threads = 1;
    for (int i = 0; i < threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }

  ~DecodePool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      queue_.push(std::move(fn));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        fn = std::move(queue_.front());
        queue_.pop();
      }
      fn();
    }
  }

  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> queue_;
  std::vector<std::thread> workers_;
  bool stop_;
};

}  // namespace

extern "C" {

int fdt_jpeg_probe(const uint8_t* data, size_t len, int* w, int* h) {
  return jpeg_probe_impl(data, len, w, h);
}

int fdt_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out, int w,
                    int h) {
  return decode_one(data, len, out, w, h);
}

int fdt_image_probe(const uint8_t* data, size_t len, int* w, int* h) {
  return probe_any(data, len, w, h);
}

int fdt_image_decode(const uint8_t* data, size_t len, uint8_t* out, int w,
                     int h) {
  return decode_any(data, len, out, w, h);
}

void* fdt_pool_create(int threads) { return new DecodePool(threads); }

void fdt_pool_destroy(void* pool) {
  delete static_cast<DecodePool*>(pool);
}

// Decodes n images (any supported format, mixed freely) concurrently.
// outs[i] must hold ws[i]*hs[i]*3 bytes (from fdt_image_probe).  Returns 0,
// or the first nonzero per-item status.
int fdt_pool_decode_batch(void* pool, int n, const uint8_t** datas,
                          const size_t* lens, uint8_t** outs, const int* ws,
                          const int* hs) {
  DecodePool* p = static_cast<DecodePool*>(pool);
  std::vector<int> status(n, 0);
  std::mutex done_mu;
  std::condition_variable done_cv;
  int remaining = n;
  for (int i = 0; i < n; ++i) {
    p->Submit([&, i] {
      status[i] = decode_any(datas[i], lens[i], outs[i], ws[i], hs[i]);
      std::lock_guard<std::mutex> lk(done_mu);
      if (--remaining == 0) done_cv.notify_one();
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining == 0; });
  for (int i = 0; i < n; ++i) {
    if (status[i] != 0) return status[i];
  }
  return 0;
}

}  // extern "C"
