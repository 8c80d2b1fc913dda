// Native host runtime: threaded JPEG decode pool.
//
// The reference outsources image decode to OpenCV's C++ `imdecode`
// (lib/src/util/helpers.dart, face_detector.dart:1412-1430) and hides its
// latency inside Dart isolates.  The TPU pipeline's host-side equivalent is
// this small libjpeg-based decoder with a pthread worker pool: decode is the
// only remaining host compute, and at batch serving rates it must keep up
// with the device (SURVEY §7.3 "JPEG decode throughput").
//
// C ABI (used from Python via ctypes — see utils/native.py):
//   fdt_jpeg_probe(data, len, &w, &h)            -> 0 ok / <0 error
//   fdt_jpeg_decode(data, len, out, w, h)        -> 0 ok / <0 error
//   fdt_pool_create(threads)                     -> pool*
//   fdt_pool_decode_batch(pool, n, datas, lens, outs, ws, hs) -> 0/neg
//   fdt_pool_destroy(pool)
//
// Output is tightly packed RGB888, row-major.

#include <cstddef>  // size_t, required before jpeglib.h
#include <cstdio>   // FILE, required before jpeglib.h

#include <jpeglib.h>

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

int fdt_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out, int w,
                    int h) {
  return decode_one(data, len, out, w, h);
}

void* fdt_pool_create(int threads) { return new DecodePool(threads); }

void fdt_pool_destroy(void* pool) {
  delete static_cast<DecodePool*>(pool);
}

// Decodes n JPEGs concurrently.  outs[i] must hold ws[i]*hs[i]*3 bytes
// (from fdt_jpeg_probe).  Returns 0, or the first nonzero per-item status.
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
      status[i] = decode_one(datas[i], lens[i], outs[i], ws[i], hs[i]);
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
