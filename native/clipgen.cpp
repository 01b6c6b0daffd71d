// Native data-path kernels for vptr_tpu.
//
// The Python loader tops out well below the TPU's step rate when it has to
// rasterize synthetic clips or normalize large uint8 batches in the hot
// loop. These C++ kernels do that work at memory speed and are exposed
// through ctypes (vptr_tpu/data/native.py) with a pure-Python fallback.
//
// Build: make -C native    (produces libclipgen.so)
//
// Determinism: clip content is a pure function of (seed, index) via
// splitmix64 — independent of thread count or call order. Note this native
// generator and the Python SyntheticMovingMNIST produce *different* (both
// deterministic) pseudo-random trajectories.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// splitmix64 — tiny counter-based PRNG, one state per (seed, index) stream.
// ---------------------------------------------------------------------------
static inline uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

static inline double uniform01(uint64_t& s) {
    return (splitmix64(s) >> 11) * (1.0 / 9007199254740992.0);  // 2^53
}

// ---------------------------------------------------------------------------
// render_clips: bouncing-glyph video synthesis.
//   glyphs:   (10, digit, digit) float32 in [0, 1]
//   out:      (n_clips, t_total, size, size, channels) float32
// Each clip i is generated from stream (seed, indices[i]).
// ---------------------------------------------------------------------------
void render_clips(const float* glyphs, int digit, int64_t seed,
                  const int64_t* indices, int n_clips, int t_total,
                  int size, int channels, int num_digits, float* out) {
    const int64_t frame = (int64_t)size * size * channels;
    const int64_t clip = (int64_t)t_total * frame;
    const double lim = (double)(size - digit);

#pragma omp parallel for schedule(static)
    for (int i = 0; i < n_clips; ++i) {
        float* dst = out + (int64_t)i * clip;
        std::memset(dst, 0, sizeof(float) * clip);
        uint64_t st = (uint64_t)seed * 0x9E3779B97F4A7C15ULL
                      + (uint64_t)indices[i] + 0x632BE59BD9B4E019ULL;

        for (int d = 0; d < num_digits; ++d) {
            const float* g = glyphs + (splitmix64(st) % 10) * digit * digit;
            float tint[8];
            for (int c = 0; c < channels && c < 8; ++c)
                tint[c] = channels > 1
                              ? (float)(0.5 + 0.5 * uniform01(st)) : 1.0f;
            double py = uniform01(st) * lim;
            double px = uniform01(st) * lim;
            double vy = (2.0 + 3.0 * uniform01(st)) *
                        (uniform01(st) < 0.5 ? -1.0 : 1.0);
            double vx = (2.0 + 3.0 * uniform01(st)) *
                        (uniform01(st) < 0.5 ? -1.0 : 1.0);

            for (int t = 0; t < t_total; ++t) {
                const int yy = (int)std::lround(py);
                const int xx = (int)std::lround(px);
                float* f = dst + (int64_t)t * frame;
                for (int gy = 0; gy < digit; ++gy) {
                    const int oy = yy + gy;
                    if (oy < 0 || oy >= size) continue;
                    const float* grow = g + gy * digit;
                    float* frow = f + ((int64_t)oy * size + xx) * channels;
                    for (int gx = 0; gx < digit; ++gx) {
                        const int ox = xx + gx;
                        if (ox < 0 || ox >= size) continue;
                        const float v = grow[gx];
                        float* px_out = frow + (int64_t)gx * channels;
                        for (int c = 0; c < channels; ++c) {
                            const float tv = v * tint[std::min(c, 7)];
                            if (tv > px_out[c]) px_out[c] = tv;
                        }
                    }
                }
                py += vy; px += vx;
                if (py < 0)   { py = -py;           vy = -vy; }
                if (py > lim) { py = 2 * lim - py;  vy = -vy; }
                if (px < 0)   { px = -px;           vx = -vx; }
                if (px > lim) { px = 2 * lim - px;  vx = -vx; }
            }
        }
    }
}

// ---------------------------------------------------------------------------
// normalize_u8: fused uint8 -> float32 (x/255 - mean) / std, channels-last.
//   in:  (n, channels) flattened pixels   out: same shape float32
// ---------------------------------------------------------------------------
void normalize_u8(const uint8_t* in, float* out, int64_t n_pixels,
                  int channels, const float* mean, const float* std_) {
    float scale[8], shift[8];
    for (int c = 0; c < channels && c < 8; ++c) {
        scale[c] = 1.0f / (255.0f * std_[c]);
        shift[c] = -mean[c] / std_[c];
    }
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n_pixels; ++p) {
        const uint8_t* src = in + p * channels;
        float* dst = out + p * channels;
        for (int c = 0; c < channels; ++c)
            dst[c] = (float)src[c] * scale[std::min(c, 7)] +
                     shift[std::min(c, 7)];
    }
}

// ---------------------------------------------------------------------------
// normalize_f32: fused (x - mean) / std for float inputs (already in [0,1]).
// ---------------------------------------------------------------------------
void normalize_f32(const float* in, float* out, int64_t n_pixels,
                   int channels, const float* mean, const float* std_) {
    float inv[8], m[8];
    for (int c = 0; c < channels && c < 8; ++c) {
        inv[c] = 1.0f / std_[c];
        m[c] = mean[c];
    }
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < n_pixels; ++p) {
        const float* src = in + p * channels;
        float* dst = out + p * channels;
        for (int c = 0; c < channels; ++c)
            dst[c] = (src[c] - m[std::min(c, 7)]) * inv[std::min(c, 7)];
    }
}

}  // extern "C"
