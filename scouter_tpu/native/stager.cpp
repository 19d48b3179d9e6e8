// Native host-side image staging for the data loader.
//
// The reference's host pipeline is pure Python (PIL per-image transforms in
// DataLoader workers, tools/prepare_things.py:140-142 thread prefetch). This
// library provides the hot staging primitives as multithreaded C++:
//   - batched bilinear uint8 resize (half-pixel centers, matches
//     jax.image.resize(method='bilinear', antialias=False))
//   - batched gather (index-select) of image rows into a contiguous buffer,
//     the per-batch assembly step of the Loader
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libstager.so stager.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>
#include <functional>

namespace {

void resize_one_bilinear(const uint8_t* src, int h, int w, int c,
                         uint8_t* dst, int oh, int ow) {
    const float sy = static_cast<float>(h) / oh;
    const float sx = static_cast<float>(w) / ow;
    for (int oy = 0; oy < oh; ++oy) {
        float fy = (oy + 0.5f) * sy - 0.5f;
        int y0 = static_cast<int>(fy >= 0 ? fy : fy - 1);
        float wy = fy - y0;
        int y0c = std::min(std::max(y0, 0), h - 1);
        int y1c = std::min(std::max(y0 + 1, 0), h - 1);
        for (int ox = 0; ox < ow; ++ox) {
            float fx = (ox + 0.5f) * sx - 0.5f;
            int x0 = static_cast<int>(fx >= 0 ? fx : fx - 1);
            float wx = fx - x0;
            int x0c = std::min(std::max(x0, 0), w - 1);
            int x1c = std::min(std::max(x0 + 1, 0), w - 1);
            const uint8_t* p00 = src + (static_cast<int64_t>(y0c) * w + x0c) * c;
            const uint8_t* p01 = src + (static_cast<int64_t>(y0c) * w + x1c) * c;
            const uint8_t* p10 = src + (static_cast<int64_t>(y1c) * w + x0c) * c;
            const uint8_t* p11 = src + (static_cast<int64_t>(y1c) * w + x1c) * c;
            uint8_t* out = dst + (static_cast<int64_t>(oy) * ow + ox) * c;
            for (int ch = 0; ch < c; ++ch) {
                float top = p00[ch] * (1.0f - wx) + p01[ch] * wx;
                float bot = p10[ch] * (1.0f - wx) + p11[ch] * wx;
                float v = top * (1.0f - wy) + bot * wy;
                out[ch] = static_cast<uint8_t>(v + 0.5f);
            }
        }
    }
}

void parallel_for(int n, int nthreads, const std::function<void(int)>& fn) {
    nthreads = std::max(1, std::min(nthreads, n));
    std::vector<std::thread> threads;
    threads.reserve(nthreads);
    for (int t = 0; t < nthreads; ++t) {
        threads.emplace_back([=, &fn]() {
            for (int i = t; i < n; i += nthreads) fn(i);
        });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// src: (n, h, w, c) uint8 contiguous; dst: (n, oh, ow, c)
void resize_batch_u8(const uint8_t* src, int n, int h, int w, int c,
                     uint8_t* dst, int oh, int ow, int nthreads) {
    const int64_t in_stride = static_cast<int64_t>(h) * w * c;
    const int64_t out_stride = static_cast<int64_t>(oh) * ow * c;
    parallel_for(n, nthreads, [&](int i) {
        resize_one_bilinear(src + i * in_stride, h, w, c,
                            dst + i * out_stride, oh, ow);
    });
}

// Gather rows: dst[i] = src[indices[i]] for (n_out) indices over (n, item_bytes)
void gather_items_u8(const uint8_t* src, const int64_t* indices, int n_out,
                     int64_t item_bytes, uint8_t* dst, int nthreads) {
    parallel_for(n_out, nthreads, [&](int i) {
        std::memcpy(dst + static_cast<int64_t>(i) * item_bytes,
                    src + indices[i] * item_bytes,
                    static_cast<size_t>(item_bytes));
    });
}

}  // extern "C"
