// Native host-side data-path ops for the TPU feeder.
//
// The reference's data path leans on native code inside its dependencies
// (OpenCV decode, torch DataLoader workers; SURVEY.md §2.9). This is the
// first-party native equivalent for the hot host-side transforms that sit
// between decode and jax.device_put: uint8 -> float32 normalization, center
// cropping, and multi-threaded batch assembly. Exposed via a plain C ABI and
// bound with ctypes (no pybind11 in the image).
//
// Build: make -C magvit2_pytorch_tpu/native   (produces libbatch_ops.so)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

extern "C" {

// u8 HWC frame -> f32 [0,1], optional BGR->RGB swap (OpenCV decode order).
void normalize_u8_to_f32(const uint8_t* src, float* dst, int64_t n_pixels,
                         int channels, int bgr_to_rgb) {
  const float scale = 1.0f / 255.0f;
  if (!bgr_to_rgb || channels != 3) {
    for (int64_t i = 0; i < n_pixels * channels; ++i) {
      dst[i] = static_cast<float>(src[i]) * scale;
    }
    return;
  }
  for (int64_t p = 0; p < n_pixels; ++p) {
    const uint8_t* s = src + p * 3;
    float* d = dst + p * 3;
    d[0] = static_cast<float>(s[2]) * scale;
    d[1] = static_cast<float>(s[1]) * scale;
    d[2] = static_cast<float>(s[0]) * scale;
  }
}

// Center-crop one HWC u8 frame into a f32 [0,1] HWC destination.
void center_crop_normalize(const uint8_t* src, int src_h, int src_w,
                           float* dst, int crop_h, int crop_w, int channels,
                           int bgr_to_rgb) {
  const int y0 = std::max(0, src_h / 2 - crop_h / 2);
  const int x0 = std::max(0, src_w / 2 - crop_w / 2);
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* row = src + ((y0 + y) * src_w + x0) * channels;
    float* drow = dst + (y * crop_w) * channels;
    normalize_u8_to_f32(row, drow, crop_w, channels, bgr_to_rgb);
  }
}

// Assemble a (batch, frames, h, w, c) f32 batch from `batch` pointers to
// contiguous u8 videos of identical shape, normalizing in parallel across a
// small thread pool. Returns 0 on success.
int assemble_batch(const uint8_t** srcs, float* dst, int batch,
                   int64_t frames, int64_t h, int64_t w, int channels,
                   int bgr_to_rgb, int num_threads) {
  const int64_t per_item = frames * h * w * channels;
  if (num_threads <= 1 || batch <= 1) {
    for (int b = 0; b < batch; ++b) {
      normalize_u8_to_f32(srcs[b], dst + b * per_item, frames * h * w,
                          channels, bgr_to_rgb);
    }
    return 0;
  }

  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int b = next.fetch_add(1);
      if (b >= batch) break;
      normalize_u8_to_f32(srcs[b], dst + b * per_item, frames * h * w,
                          channels, bgr_to_rgb);
    }
  };
  std::vector<std::thread> threads;
  const int n = std::min(num_threads, batch);
  threads.reserve(n);
  for (int i = 0; i < n; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Truncate-or-zero-pad along the leading (time) axis:
// (t_in, stride) f32 -> (t_out, stride), reference cast_num_frames
// (data.py:37-46) semantics.
void cast_num_frames_f32(const float* src, int64_t t_in, float* dst,
                         int64_t t_out, int64_t stride) {
  const int64_t copy = std::min(t_in, t_out);
  std::memcpy(dst, src, sizeof(float) * copy * stride);
  if (t_out > copy) {
    std::memset(dst + copy * stride, 0, sizeof(float) * (t_out - copy) * stride);
  }
}

}  // extern "C"
