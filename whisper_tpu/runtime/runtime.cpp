// whisper_tpu native runtime — host-side hot paths.
//
// TPU-native counterpart of the reference's C runtime pieces:
//  - block dequantization (reference ggml/src/ggml-quants.c): checkpoint
//    loading for large-v3 decodes ~1.5B quantized elements; threaded C++
//    beats numpy's bit-fiddling several-fold.
//  - DTW dynamic program + backtrace (reference src/whisper.cpp:8647-8730):
//    inherently sequential O(N*M); a Python loop over 448x1500 cells costs
//    seconds, this costs ~1 ms.
//  - signal-energy envelope (reference :8360-8376).
//
// Exposed as a plain C ABI consumed via ctypes (whisper_tpu/runtime/native.py).
// Build: make -C whisper_tpu/runtime   (g++ -O3 -shared; no dependencies)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// fp16 -> fp32 (IEEE half, no F16C dependency)
// ---------------------------------------------------------------------------
static inline float fp16_to_fp32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp  = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {
            // subnormal
            int e = -1;
            do { mant <<= 1; e++; } while (!(mant & 0x400));
            mant &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (mant << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

// ---------------------------------------------------------------------------
// block dequantization (layouts: reference ggml/src/ggml-common.h:167-213)
// ---------------------------------------------------------------------------
#define QK 32

static void dequant_block_q4_0(const uint8_t* p, float* out) {
    float d = fp16_to_fp32(*(const uint16_t*)p);
    const uint8_t* qs = p + 2;
    for (int j = 0; j < 16; ++j) {
        out[j]      = ((int)(qs[j] & 0x0F) - 8) * d;
        out[j + 16] = ((int)(qs[j] >> 4)   - 8) * d;
    }
}

static void dequant_block_q4_1(const uint8_t* p, float* out) {
    float d = fp16_to_fp32(*(const uint16_t*)p);
    float m = fp16_to_fp32(*(const uint16_t*)(p + 2));
    const uint8_t* qs = p + 4;
    for (int j = 0; j < 16; ++j) {
        out[j]      = (qs[j] & 0x0F) * d + m;
        out[j + 16] = (qs[j] >> 4)   * d + m;
    }
}

static void dequant_block_q5_0(const uint8_t* p, float* out) {
    float d = fp16_to_fp32(*(const uint16_t*)p);
    uint32_t qh;
    std::memcpy(&qh, p + 2, 4);
    const uint8_t* qs = p + 6;
    for (int j = 0; j < 16; ++j) {
        int lo = (qs[j] & 0x0F) | (((qh >> j) & 1) << 4);
        int hi = (qs[j] >> 4)   | (((qh >> (j + 16)) & 1) << 4);
        out[j]      = (lo - 16) * d;
        out[j + 16] = (hi - 16) * d;
    }
}

static void dequant_block_q5_1(const uint8_t* p, float* out) {
    float d = fp16_to_fp32(*(const uint16_t*)p);
    float m = fp16_to_fp32(*(const uint16_t*)(p + 2));
    uint32_t qh;
    std::memcpy(&qh, p + 4, 4);
    const uint8_t* qs = p + 8;
    for (int j = 0; j < 16; ++j) {
        int lo = (qs[j] & 0x0F) | (((qh >> j) & 1) << 4);
        int hi = (qs[j] >> 4)   | (((qh >> (j + 16)) & 1) << 4);
        out[j]      = lo * d + m;
        out[j + 16] = hi * d + m;
    }
}

static void dequant_block_q8_0(const uint8_t* p, float* out) {
    float d = fp16_to_fp32(*(const uint16_t*)p);
    const int8_t* qs = (const int8_t*)(p + 2);
    for (int j = 0; j < 32; ++j) out[j] = qs[j] * d;
}

typedef void (*dequant_fn)(const uint8_t*, float*);

// ttype codes match ggml (quant.py): 2=q4_0 3=q4_1 6=q5_0 7=q5_1 8=q8_0 1=f16
int wtpu_dequantize(int ttype, const uint8_t* in, float* out, int64_t nelems,
                    int n_threads) {
    if (ttype == 1) {  // f16
        const uint16_t* h = (const uint16_t*)in;
        for (int64_t i = 0; i < nelems; ++i) out[i] = fp16_to_fp32(h[i]);
        return 0;
    }
    dequant_fn fn = nullptr;
    int bs = 0;
    switch (ttype) {
        case 2: fn = dequant_block_q4_0; bs = 18; break;
        case 3: fn = dequant_block_q4_1; bs = 20; break;
        case 6: fn = dequant_block_q5_0; bs = 22; break;
        case 7: fn = dequant_block_q5_1; bs = 24; break;
        case 8: fn = dequant_block_q8_0; bs = 34; break;
        default: return -1;
    }
    int64_t nb = nelems / QK;
    if (nb * QK != nelems) return -2;

    if (n_threads <= 1 || nb < 1024) {
        for (int64_t b = 0; b < nb; ++b) fn(in + b * bs, out + b * QK);
        return 0;
    }
    std::atomic<int64_t> next(0);
    const int64_t chunk = 4096;
    auto worker = [&]() {
        for (;;) {
            int64_t b0 = next.fetch_add(chunk);
            if (b0 >= nb) break;
            int64_t b1 = std::min(b0 + chunk, nb);
            for (int64_t b = b0; b < b1; ++b) fn(in + b * bs, out + b * QK);
        }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker);
    worker();
    for (auto& t : ts) t.join();
    return 0;
}

// ---------------------------------------------------------------------------
// DTW dynamic program + backtrace (reference dtw_and_backtrace,
// src/whisper.cpp:8647-8730; semantics identical to OpenAI timing.py)
// x: N x M row-major cost matrix. out_text/out_time: buffers of size N+M.
// Returns path length, or -1 on error.
// ---------------------------------------------------------------------------
int wtpu_dtw(const float* x, int n, int m, int32_t* out_text, int32_t* out_time) {
    if (n <= 0 || m <= 0) return -1;
    std::vector<double> cost((size_t)(n + 1) * (m + 1),
                             std::numeric_limits<double>::infinity());
    std::vector<int8_t> trace((size_t)(n + 1) * (m + 1), -1);
    const size_t W = m + 1;
    cost[0] = 0.0;

    for (int i = 1; i <= n; ++i) {
        const float* xrow = x + (size_t)(i - 1) * m;
        double* crow = cost.data() + (size_t)i * W;
        const double* prow = cost.data() + (size_t)(i - 1) * W;
        int8_t* trow = trace.data() + (size_t)i * W;
        for (int j = 1; j <= m; ++j) {
            double c0 = prow[j - 1];   // diag
            double c1 = prow[j];       // up    (i-1, j)
            double c2 = crow[j - 1];   // left  (i, j-1)
            double c;
            int8_t t;
            if (c0 < c1 && c0 < c2) { c = c0; t = 0; }
            else if (c1 < c0 && c1 < c2) { c = c1; t = 1; }
            else { c = c2; t = 2; }
            crow[j] = xrow[j - 1] + c;
            trow[j] = t;
        }
    }
    // border rules (reference :8692-8697)
    for (int j = 0; j <= m; ++j) trace[j] = 2;
    for (int i = 0; i <= n; ++i) trace[(size_t)i * W] = 1;

    int i = n, j = m;
    int len = 0;
    std::vector<int32_t> ti, tj;
    ti.reserve(n + m);
    tj.reserve(n + m);
    while (i > 0 || j > 0) {
        ti.push_back(i - 1);
        tj.push_back(j - 1);
        int8_t t = trace[(size_t)i * W + j];
        if (t == 0) { --i; --j; }
        else if (t == 1) { --i; }
        else { --j; }
        ++len;
    }
    for (int k = 0; k < len; ++k) {
        out_text[k] = ti[len - 1 - k];
        out_time[k] = tj[len - 1 - k];
    }
    return len;
}

// ---------------------------------------------------------------------------
// signal energy envelope (reference get_signal_energy :8360-8376):
// moving average of |x| with window 2*hw+1, constant divisor at edges.
// ---------------------------------------------------------------------------
void wtpu_signal_energy(const float* x, int64_t n, int hw, float* out) {
    double div = 2.0 * hw + 1.0;
    // prefix sums of |x|
    std::vector<double> pre((size_t)n + 1, 0.0);
    for (int64_t i = 0; i < n; ++i) pre[i + 1] = pre[i] + std::fabs(x[i]);
    for (int64_t i = 0; i < n; ++i) {
        int64_t a = std::max<int64_t>(0, i - hw);
        int64_t b = std::min<int64_t>(n, i + hw + 1);
        out[i] = (float)((pre[b] - pre[a]) / div);
    }
}

int wtpu_version(void) { return 1; }

}  // extern "C"
