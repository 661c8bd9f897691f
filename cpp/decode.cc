// tpudf host-side JPEG decode + resize service.
//
// The reference leans on TurboJPEG/OpenCV for host decode
// (hidf_video_classifier.py:84-90, 151-167). This is the tpudf-native
// equivalent: a small C++ library exposing batch JPEG decode + bilinear
// resize over a persistent thread pool, feeding uint8 NHWC buffers that go
// straight to the TPU via device_put. Linked against system libjpeg
// (libjpeg-turbo ABI). Python binding: ctypes (tpudf/data/decode.py).
//
// Exposed C API:
//   tpudf_decode_batch(paths, n, size, out, n_threads) -> per-image status
//   tpudf_decode_jpeg_mem(buf, len, size, out)         -> single in-memory

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
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

// Bilinear resize RGB u8 (h, w) -> (size, size).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst,
                     int size) {
  const float sy = static_cast<float>(sh) / size;
  const float sx = static_cast<float>(sw) / size;
  for (int y = 0; y < size; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < size; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        float a = src[(y0 * sw + x0) * 3 + c] * (1 - wx) +
                  src[(y0 * sw + x1) * 3 + c] * wx;
        float b = src[(y1 * sw + x0) * 3 + c] * (1 - wx) +
                  src[(y1 * sw + x1) * 3 + c] * wx;
        float v = a * (1 - wy) + b * wy;
        dst[(y * size + x) * 3 + c] =
            static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      }
    }
  }
}

// Decode one JPEG from memory into out (size*size*3). Returns 0 on success.
int decode_mem(const uint8_t* buf, size_t len, int size, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain downscale: pick the smallest scale >= target (big speedup
  // for large photos — the same trick TurboJPEG uses).
  for (int denom = 8; denom >= 1; --denom) {
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
    jpeg_calc_output_dimensions(&cinfo);
    if (static_cast<int>(cinfo.output_width) >= size &&
        static_cast<int>(cinfo.output_height) >= size) {
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  if (w == size && h == size) {
    std::memcpy(out, rgb.data(), static_cast<size_t>(size) * size * 3);
  } else {
    resize_bilinear(rgb.data(), h, w, out, size);
  }
  return 0;
}

int decode_file(const char* path, int size, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 3;
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    std::fclose(f);
    return 4;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(len));
  size_t rd = std::fread(buf.data(), 1, static_cast<size_t>(len), f);
  std::fclose(f);
  if (rd != static_cast<size_t>(len)) return 5;
  return decode_mem(buf.data(), buf.size(), size, out);
}

// Persistent thread pool: created once, reused across batches.
class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

Pool* pool(int n_threads) {
  static Pool* p = new Pool(n_threads > 0 ? n_threads : 8);
  return p;
}

}  // namespace

extern "C" {

// paths: array of C strings; out: n * size*size*3 bytes; status: n ints.
void tpudf_decode_batch(const char** paths, int n, int size, uint8_t* out,
                        int* status, int n_threads) {
  Pool* p = pool(n_threads);
  std::atomic<int> done{0};
  std::mutex mu;
  std::condition_variable cv;
  const size_t stride = static_cast<size_t>(size) * size * 3;
  for (int i = 0; i < n; ++i) {
    p->submit([&, i] {
      status[i] = decode_file(paths[i], size, out + stride * i);
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(mu);
        cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(mu);
  cv.wait(lk, [&] { return done.load() == n; });
}

int tpudf_decode_jpeg_mem(const uint8_t* buf, long len, int size,
                          uint8_t* out) {
  return decode_mem(buf, static_cast<size_t>(len), size, out);
}

}  // extern "C"
