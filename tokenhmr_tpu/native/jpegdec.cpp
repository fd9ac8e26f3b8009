// Native multi-threaded JPEG decoding for the host input pipeline.
//
// The reference leans on torch DataLoader worker PROCESSES for decode
// parallelism; here a C++ thread pool decodes a whole batch of tar-shard
// jpg members inside ONE process (ctypes releases the GIL for the entire
// batch call), replacing cv2.imdecode in the loader hot path
// (ref lib/datasets/image_dataset.py wds .decode("rgb8")).
//
// C ABI only (loaded via ctypes, no pybind11 in this image).
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC -o
//        libtokenhmr_jpeg.so jpegdec.cpp -ljpeg -lpthread

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG to tightly-packed RGB. Returns 0 on success.
int decode_one(const uint8_t* data, size_t len, uint8_t* out, int out_h,
               int out_w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_height) != out_h ||
      static_cast<int>(cinfo.output_width) != out_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  const size_t stride = static_cast<size_t>(out_w) * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + stride * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // namespace

extern "C" {

// Read (width, height) from the header without decoding. Returns 0 on ok.
int thmr_jpeg_dims(const uint8_t* data, size_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decode one image into a caller-allocated (h, w, 3) uint8 RGB buffer.
int thmr_jpeg_decode(const uint8_t* data, size_t len, uint8_t* out, int h,
                     int w) {
  return decode_one(data, len, out, h, w);
}

// Decode a batch with a thread pool. datas/lens/outs are parallel arrays;
// hs/ws give each pre-probed output size. rcs[i] receives per-image status.
void thmr_jpeg_decode_batch(int n, const uint8_t** datas, const size_t* lens,
                            uint8_t** outs, const int* hs, const int* ws,
                            int* rcs, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> next(1, 0);
  for (int t = 0; t < num_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += num_threads) {
        rcs[i] = decode_one(datas[i], lens[i], outs[i], hs[i], ws[i]);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
