// ursa_dataio: native host-side data pipeline for URSABench-TPU.
//
// The TPU compute path keeps whole datasets device-resident (HBM), but
// ImageNet-scale configs (the reference ships ResNet50ImageNet tuned
// hyperparameters) must stream batches from host RAM. This library is the
// hot host loop of that path: permutation generation, batch gather, and
// fused uint8 -> normalized float32 NHWC conversion — the work the
// reference delegates to torch DataLoader worker processes
// (/root/reference/URSABench/datasets.py:244-261). Exposed via a plain C
// ABI consumed through ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libursa_dataio.so)

#include <cstdint>
#include <cstring>
#include <random>

extern "C" {

// Fisher-Yates permutation of [0, n) using a seeded 64-bit PCG stream.
void ursa_permutation(int64_t n, uint64_t seed, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = i;
  std::mt19937_64 rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    uint64_t j = rng() % static_cast<uint64_t>(i + 1);
    int64_t t = out[i];
    out[i] = out[j];
    out[j] = t;
  }
}

// Gather rows of a uint8 image array (n, item_bytes) into a contiguous
// batch and simultaneously convert to normalized float32:
//   out[b, ..., c] = (img / 255 - mean[c]) / std[c]
// images: (n, H*W*C) uint8, channel-last within an item.
void ursa_gather_normalize(
    const uint8_t* images, const int64_t* labels, int64_t item_pixels,
    int64_t channels, const int64_t* indices, int64_t batch,
    const float* mean, const float* stddev, float* out_x, int32_t* out_y) {
  const int64_t item_bytes = item_pixels * channels;
  // precompute per-channel scale/bias: x*scale + bias
  if (channels > 16) return;  // caller contract: image data, <=16 channels
  float scale[16], bias[16];
  for (int64_t c = 0; c < channels; ++c) {
    scale[c] = 1.0f / (255.0f * stddev[c]);
    bias[c] = -mean[c] / stddev[c];
  }
  for (int64_t b = 0; b < batch; ++b) {
    const uint8_t* src = images + indices[b] * item_bytes;
    float* dst = out_x + b * item_bytes;
    if (channels == 1) {
      const float s = scale[0], o = bias[0];
      for (int64_t i = 0; i < item_bytes; ++i) dst[i] = src[i] * s + o;
    } else {
      for (int64_t i = 0; i < item_bytes; i += channels) {
        for (int64_t c = 0; c < channels; ++c) {
          dst[i + c] = src[i + c] * scale[c] + bias[c];
        }
      }
    }
    out_y[b] = static_cast<int32_t>(labels[indices[b]]);
  }
}

// Plain gather of uint8 rows (no conversion) — for augmentation-on-device
// paths that want raw pixels.
void ursa_gather_u8(
    const uint8_t* images, const int64_t* labels, int64_t item_bytes,
    const int64_t* indices, int64_t batch, uint8_t* out_x, int32_t* out_y) {
  for (int64_t b = 0; b < batch; ++b) {
    std::memcpy(out_x + b * item_bytes, images + indices[b] * item_bytes,
                static_cast<size_t>(item_bytes));
    out_y[b] = static_cast<int32_t>(labels[indices[b]]);
  }
}

int32_t ursa_dataio_version() { return 1; }

}  // extern "C"
