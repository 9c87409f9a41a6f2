// Fused crop + bicubic resize for uint8 RGB24 frame stacks, via libswscale.
//
// Replaces per-frame PIL bicubic in the chunk sampler's RandomResizedCrop /
// Resize+CenterCrop (reference dataset/video_dataset.py:95-107 uses
// torchvision v2 BICUBIC antialias=true; swscale's bicubic scaler applies
// ratio-scaled filter taps, i.e. it is likewise antialiased on downscale).
// Measured: PIL bicubic is the single most expensive host stage (~37 ms per
// 48-frame clip vs ~13 ms decode) — this kernel exists purely to unblock the
// host pipeline that feeds the TPU.
//
// One SwsContext is built per call (per clip, dozens of frames), then reused
// across the frame loop; sws_scale runs SIMD paths and releases no Python
// state (called through ctypes, so the GIL is dropped during the whole
// stack resize — decode workers overlap).

#include <cstdint>

extern "C" {
#include <libswscale/swscale.h>
}

extern "C" {

// in:  [T, H, W, 3] uint8, C-contiguous
// crop window (cy, cx, ch, cw) within [H, W]
// out: [T, oh, ow, 3] uint8, C-contiguous
// Returns 0 on success.
int fr_resize_frames(const uint8_t* in, int64_t T, int H, int W,
                     int cy, int cx, int ch, int cw,
                     uint8_t* out, int oh, int ow) {
  if (!in || !out || T <= 0) return 1;
  if (cy < 0 || cx < 0 || ch <= 0 || cw <= 0 || cy + ch > H || cx + cw > W)
    return 2;
  if (oh <= 0 || ow <= 0) return 3;

  SwsContext* sws = sws_getContext(
      cw, ch, AV_PIX_FMT_RGB24, ow, oh, AV_PIX_FMT_RGB24,
      SWS_BICUBIC | SWS_ACCURATE_RND, nullptr, nullptr, nullptr);
  if (!sws) return 4;

  const int64_t in_frame = static_cast<int64_t>(H) * W * 3;
  const int64_t out_frame = static_cast<int64_t>(oh) * ow * 3;
  const int in_stride = W * 3;
  const int out_stride = ow * 3;

  for (int64_t t = 0; t < T; ++t) {
    const uint8_t* src =
        in + t * in_frame + static_cast<int64_t>(cy) * in_stride + cx * 3;
    uint8_t* dst = out + t * out_frame;
    const uint8_t* src_planes[4] = {src, nullptr, nullptr, nullptr};
    uint8_t* dst_planes[4] = {dst, nullptr, nullptr, nullptr};
    const int src_strides[4] = {in_stride, 0, 0, 0};
    const int dst_strides[4] = {out_stride, 0, 0, 0};
    sws_scale(sws, src_planes, src_strides, 0, ch, dst_planes, dst_strides);
  }
  sws_freeContext(sws);
  return 0;
}

}  // extern "C"
