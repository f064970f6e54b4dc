// Native SEG-Y trace codec for zephyr_tpu.
//
// The reference reads SEG-Y through pygeo (pure Python + numpy); for
// production-size surveys the per-trace decode loop (header-strided
// access + IBM-float conversion) dominates data loading. This codec
// implements the hot loops in C++ and is loaded through ctypes
// (zephyr_tpu/middleware/segy_native.py) with a numpy fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC segy_codec.cpp -o libsegy_codec.so

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

inline uint32_t bswap32(uint32_t v) {
#if defined(__GNUC__) || defined(__clang__)
    return __builtin_bswap32(v);
#else
    return ((v & 0xff000000u) >> 24) | ((v & 0x00ff0000u) >> 8) |
           ((v & 0x0000ff00u) << 8) | ((v & 0x000000ffu) << 24);
#endif
}

inline uint16_t bswap16(uint16_t v) {
    return static_cast<uint16_t>((v >> 8) | (v << 8));
}

inline double ibm_to_double(uint32_t raw) {
    const double sign = (raw >> 31) ? -1.0 : 1.0;
    const int exponent = static_cast<int>((raw >> 24) & 0x7f);
    const double mantissa =
        static_cast<double>(raw & 0x00ffffffu) / 16777216.0;  // 2^24
    return sign * mantissa * std::pow(16.0, exponent - 64);
}

inline uint32_t double_to_ibm(double v) {
    if (v == 0.0) return 0u;
    uint32_t sign = 0;
    if (v < 0) { sign = 1u << 31; v = -v; }
    int e = static_cast<int>(std::ceil(std::log2(v) / 4.0));
    double m = v / std::pow(16.0, e);
    if (m >= 1.0) { e += 1; m /= 16.0; }
    uint32_t mant = static_cast<uint32_t>(std::lround(m * 16777216.0));
    if (mant >= (1u << 24)) { mant >>= 4; e += 1; }
    return sign | ((static_cast<uint32_t>(e + 64) & 0x7f) << 24) |
           (mant & 0x00ffffffu);
}

}  // namespace

extern "C" {

// Convert n raw IBM-float words (optionally byte-swapped) to doubles.
void ibm_to_f64(const uint32_t* in, double* out, int64_t n, int swap) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t raw = in[i];
        if (swap) raw = bswap32(raw);
        out[i] = ibm_to_double(raw);
    }
}

// Convert n doubles to raw IBM-float words (optionally byte-swapped).
void f64_to_ibm(const double* in, uint32_t* out, int64_t n, int swap) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t raw = double_to_ibm(in[i]);
        out[i] = swap ? bswap32(raw) : raw;
    }
}

// Decode all traces of a SEG-Y payload into a dense (ntr, ns) double
// array. `base` points at the first trace header; each trace is
// 240 bytes of header + ns samples. format: 1=IBM, 2=int32, 3=int16,
// 5=IEEE f32, 8=int8. big_endian applies to multi-byte formats.
// Returns 0 on success, -1 on unsupported format.
int decode_traces(const uint8_t* base, int64_t ntr, int64_t ns,
                  int format, int big_endian, double* out) {
    const int64_t sample_bytes =
        (format == 3) ? 2 : (format == 8) ? 1 : 4;
    const int64_t tr_bytes = 240 + ns * sample_bytes;

    for (int64_t t = 0; t < ntr; ++t) {
        const uint8_t* p = base + t * tr_bytes + 240;
        double* o = out + t * ns;
        switch (format) {
            case 1: {
                const uint32_t* s = reinterpret_cast<const uint32_t*>(p);
                for (int64_t i = 0; i < ns; ++i) {
                    uint32_t raw = s[i];
                    if (big_endian) raw = bswap32(raw);
                    o[i] = ibm_to_double(raw);
                }
                break;
            }
            case 2: {
                const uint32_t* s = reinterpret_cast<const uint32_t*>(p);
                for (int64_t i = 0; i < ns; ++i) {
                    uint32_t raw = s[i];
                    if (big_endian) raw = bswap32(raw);
                    o[i] = static_cast<double>(
                        static_cast<int32_t>(raw));
                }
                break;
            }
            case 3: {
                const uint16_t* s = reinterpret_cast<const uint16_t*>(p);
                for (int64_t i = 0; i < ns; ++i) {
                    uint16_t raw = s[i];
                    if (big_endian) raw = bswap16(raw);
                    o[i] = static_cast<double>(
                        static_cast<int16_t>(raw));
                }
                break;
            }
            case 5: {
                const uint32_t* s = reinterpret_cast<const uint32_t*>(p);
                for (int64_t i = 0; i < ns; ++i) {
                    uint32_t raw = s[i];
                    if (big_endian) raw = bswap32(raw);
                    float f;
                    std::memcpy(&f, &raw, 4);
                    o[i] = static_cast<double>(f);
                }
                break;
            }
            case 8: {
                const int8_t* s = reinterpret_cast<const int8_t*>(p);
                for (int64_t i = 0; i < ns; ++i)
                    o[i] = static_cast<double>(s[i]);
                break;
            }
            default:
                return -1;
        }
    }
    return 0;
}

}  // extern "C"
