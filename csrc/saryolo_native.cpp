// SAR-YOLO-TPU native host runtime: JPEG decode, letterbox, HSV jitter, NMS.
//
// TPU-native counterpart of the reference's native components (C++ deploy
// examples, SURVEY §2.9): the pixel pipeline that must stay on the host
// (file IO, JPEG entropy decode, letterbox for ragged source sizes) runs in
// C++ threads with no GIL, feeding uint8 NHWC batches to the device. The same
// library serves C++ deploy clients of exported models (letterbox + NMS
// mirror the Python/jnp implementations bit-for-bit within rounding).
//
// C ABI only — consumed via ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Bilinear letterbox: src (h, w, 3) uint8 -> dst (imgsz, imgsz, 3) uint8.
// Matches data/augment.py letterbox(center=True, scaleup configurable).
// Returns scale r; writes pad offsets to *pad_x / *pad_y.
// ---------------------------------------------------------------------------
float sy_letterbox_u8(const uint8_t* src, int h, int w, uint8_t* dst, int imgsz,
                      int scaleup, int pad_value, int* pad_x, int* pad_y) {
  float r = std::min((float)imgsz / h, (float)imgsz / w);
  if (!scaleup) r = std::min(r, 1.0f);
  int nh = (int)std::lround(h * r);
  int nw = (int)std::lround(w * r);
  float dw = (imgsz - nw) / 2.0f;
  float dh = (imgsz - nh) / 2.0f;
  int left = (int)std::lround(dw - 0.1);
  int top = (int)std::lround(dh - 0.1);
  *pad_x = left;
  *pad_y = top;

  std::memset(dst, pad_value, (size_t)imgsz * imgsz * 3);

  // bilinear resize rows [top, top+nh) cols [left, left+nw)
  const float sx = (float)w / nw;
  const float sy = (float)h / nh;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, h - 1);
    y0 = std::max(y0, 0);
    uint8_t* out_row = dst + ((size_t)(y + top) * imgsz + left) * 3;
    const uint8_t* r0 = src + (size_t)y0 * w * 3;
    const uint8_t* r1 = src + (size_t)y1 * w * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, w - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * r0[x0 * 3 + c] + wx * r0[x1 * 3 + c]) +
                  wy * ((1 - wx) * r1[x0 * 3 + c] + wx * r1[x1 * 3 + c]);
        out_row[x * 3 + c] = (uint8_t)std::lround(std::min(std::max(v, 0.0f), 255.0f));
      }
    }
  }
  return r;
}

// ---------------------------------------------------------------------------
// Greedy NMS over desc-sorted candidates. boxes (n,4) xyxy, scores (n).
// Writes kept indices to keep_out; returns count (<= max_det).
// ---------------------------------------------------------------------------
int sy_nms(const float* boxes, const float* scores, int n, float iou_thres,
           int max_det, int* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  int kept = 0;
  for (int oi = 0; oi < n && kept < max_det; ++oi) {
    int i = order[oi];
    if (suppressed[i] || scores[i] <= 0.f) continue;
    keep_out[kept++] = i;
    const float* bi = boxes + 4 * i;
    float area_i = (bi[2] - bi[0]) * (bi[3] - bi[1]);
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, xx2 - xx1) * std::max(0.f, yy2 - yy1);
      float area_j = (bj[2] - bj[0]) * (bj[3] - bj[1]);
      float iou = inter / (area_i + area_j - inter + 1e-7f);
      if (iou > iou_thres) suppressed[j] = 1;
    }
  }
  return kept;
}

// ---------------------------------------------------------------------------
// Batch letterbox with a worker-thread pool: srcs are n images of (hs[i], ws[i]),
// dst is (n, imgsz, imgsz, 3). rs/pads receive per-image scale + offsets.
// ---------------------------------------------------------------------------
void sy_letterbox_batch(const uint8_t** srcs, const int* hs, const int* ws, int n,
                        uint8_t* dst, int imgsz, int scaleup, int pad_value,
                        float* rs, int* pads_xy, int n_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    int i;
    while ((i = next.fetch_add(1)) < n) {
      rs[i] = sy_letterbox_u8(srcs[i], hs[i], ws[i],
                              dst + (size_t)i * imgsz * imgsz * 3, imgsz, scaleup,
                              pad_value, &pads_xy[2 * i], &pads_xy[2 * i + 1]);
    }
  };
  int nt = std::max(1, n_threads);
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"

#ifdef SY_WITH_JPEG
#include <jpeglib.h>
#include <csetjmp>

namespace {
struct SyJpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};
void sy_jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<SyJpegErr*>(cinfo->err)->jb, 1);
}
}  // namespace

extern "C" {

// Decode a JPEG buffer to RGB uint8. Caller provides out sized >= max_h*max_w*3;
// actual dims written to *h/*w. Returns 0 on success.
int sy_decode_jpeg(const uint8_t* buf, long len, uint8_t* out, int max_h, int max_w,
                   int* h, int* w) {
  jpeg_decompress_struct cinfo;
  SyJpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = sy_jpeg_error_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_height > max_h || (int)cinfo.output_width > max_w) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
#endif  // SY_WITH_JPEG
