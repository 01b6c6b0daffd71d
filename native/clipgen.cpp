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
//   motion:   0 = linear bounce (canonical MovingMNIST),
//             1 = dynamic (per-digit constant acceleration, angle-drawn
//                 velocities, speed clamp, elastic pairwise velocity-swap
//                 collisions, optional per-frame uniform pixel noise)
// Each clip i is generated from stream (seed, indices[i]).
// ---------------------------------------------------------------------------
static inline void stamp_glyph(float* f, const float* g, const float* tint,
                               int digit, int size, int channels,
                               double py, double px) {
    const int yy = (int)std::lround(py);
    const int xx = (int)std::lround(px);
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
}

void render_clips(const float* glyphs, int digit, int64_t seed,
                  const int64_t* indices, int n_clips, int t_total,
                  int size, int channels, int num_digits, int motion,
                  float noise, float* out) {
    const int64_t frame = (int64_t)size * size * channels;
    const int64_t clip = (int64_t)t_total * frame;
    const double lim = (double)(size - digit);
    const double kPi = 3.14159265358979323846;

#pragma omp parallel for schedule(static)
    for (int i = 0; i < n_clips; ++i) {
        float* dst = out + (int64_t)i * clip;
        std::memset(dst, 0, sizeof(float) * clip);
        uint64_t st = (uint64_t)seed * 0x9E3779B97F4A7C15ULL
                      + (uint64_t)indices[i] + 0x632BE59BD9B4E019ULL;

        if (motion == 0) {
            for (int d = 0; d < num_digits; ++d) {
                const float* g =
                    glyphs + (splitmix64(st) % 10) * digit * digit;
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
                    stamp_glyph(dst + (int64_t)t * frame, g, tint, digit,
                                size, channels, py, px);
                    py += vy; px += vx;
                    if (py < 0)   { py = -py;           vy = -vy; }
                    if (py > lim) { py = 2 * lim - py;  vy = -vy; }
                    if (px < 0)   { px = -px;           vx = -vx; }
                    if (px > lim) { px = 2 * lim - px;  vx = -vx; }
                }
            }
            // the noise knob is independent of the motion flavor (the
            // digit loop above is digit-major, so noise is a post pass)
            if (noise > 0.0f) {
                for (int64_t p = 0; p < clip; ++p) {
                    const float n =
                        (float)((2.0 * uniform01(st) - 1.0) * noise);
                    dst[p] = std::min(1.0f, std::max(0.0f, dst[p] + n));
                }
            }
            continue;
        }

        // motion == 1: interacting digits — time-major state update
        constexpr int kMaxD = 8;
        const int nd = std::min(num_digits, kMaxD);
        const float* g[kMaxD];
        float tint[kMaxD][8];
        double py[kMaxD], px[kMaxD], vy[kMaxD], vx[kMaxD];
        double ay[kMaxD], ax[kMaxD];
        for (int d = 0; d < nd; ++d) {
            g[d] = glyphs + (splitmix64(st) % 10) * digit * digit;
            for (int c = 0; c < channels && c < 8; ++c)
                tint[d][c] = channels > 1
                                 ? (float)(0.5 + 0.5 * uniform01(st)) : 1.0f;
            py[d] = uniform01(st) * lim;
            px[d] = uniform01(st) * lim;
            const double ang = uniform01(st) * 2.0 * kPi;
            const double sp = 1.5 + 2.5 * uniform01(st);
            vy[d] = sp * std::cos(ang);
            vx[d] = sp * std::sin(ang);
            const double aang = uniform01(st) * 2.0 * kPi;
            const double amag = 0.05 + 0.13 * uniform01(st);
            ay[d] = amag * std::cos(aang);
            ax[d] = amag * std::sin(aang);
        }
        const double coll2 = 0.75 * digit * 0.75 * digit;
        for (int t = 0; t < t_total; ++t) {
            float* f = dst + (int64_t)t * frame;
            for (int d = 0; d < nd; ++d)
                stamp_glyph(f, g[d], tint[d], digit, size, channels,
                            py[d], px[d]);
            if (noise > 0.0f) {
                for (int64_t p = 0; p < frame; ++p) {
                    const float n =
                        (float)((2.0 * uniform01(st) - 1.0) * noise);
                    f[p] = std::min(1.0f, std::max(0.0f, f[p] + n));
                }
            }
            for (int d = 0; d < nd; ++d) {
                vy[d] += ay[d]; vx[d] += ax[d];
                const double sp = std::sqrt(vy[d] * vy[d] + vx[d] * vx[d]);
                if (sp > 6.0) { vy[d] *= 6.0 / sp; vx[d] *= 6.0 / sp; }
                py[d] += vy[d]; px[d] += vx[d];
                if (py[d] < 0)   { py[d] = -py[d];          vy[d] = -vy[d]; }
                if (py[d] > lim) { py[d] = 2 * lim - py[d]; vy[d] = -vy[d]; }
                if (px[d] < 0)   { px[d] = -px[d];          vx[d] = -vx[d]; }
                if (px[d] > lim) { px[d] = 2 * lim - px[d]; vx[d] = -vx[d]; }
            }
            for (int a = 0; a < nd; ++a)
                for (int b = a + 1; b < nd; ++b) {
                    const double dy = py[a] - py[b], dx = px[a] - px[b];
                    const double rvy = vy[a] - vy[b], rvx = vx[a] - vx[b];
                    if (dy * dy + dx * dx < coll2 &&
                        rvy * dy + rvx * dx < 0) {
                        std::swap(vy[a], vy[b]);
                        std::swap(vx[a], vx[b]);
                    }
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
