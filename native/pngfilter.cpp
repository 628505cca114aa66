// PNG scanline unfiltering (RFC 2083 filters 0-4).
//
// The reference decodes PNGs through stb_image / libpng (vk_engine.cpp:33-36);
// our framework ships its own minimal reader (utils/png.py) for resume paths
// and tests.  Filters 1/3/4 carry a left-neighbor recurrence that NumPy cannot
// vectorize, so the hot loop lives here: utils/png.py loads this via ctypes
// and falls back to Python loops when the toolchain is absent.
//
// Layout: `raw` is the zlib-decompressed IDAT stream, height scanlines of
// (1 filter byte + stride bytes).  `out` receives height*stride unfiltered
// bytes.  bpp = bytes per pixel (filter distance).  Returns 0 on success,
// -1 on an unknown filter byte, -2 if raw is too short.

#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" int png_unfilter(const uint8_t* raw, int64_t raw_len, uint8_t* out,
                            int64_t height, int64_t stride, int bpp) {
    if (raw_len < height * (stride + 1)) return -2;
    const uint8_t* prev = nullptr;  // previous unfiltered scanline
    for (int64_t y = 0; y < height; ++y) {
        const uint8_t* src = raw + y * (stride + 1);
        uint8_t ftype = src[0];
        ++src;
        uint8_t* rec = out + y * stride;
        switch (ftype) {
            case 0:
                std::memcpy(rec, src, (size_t)stride);
                break;
            case 1:  // Sub
                for (int64_t i = 0; i < bpp; ++i) rec[i] = src[i];
                for (int64_t i = bpp; i < stride; ++i)
                    rec[i] = (uint8_t)(src[i] + rec[i - bpp]);
                break;
            case 2:  // Up
                if (prev) {
                    for (int64_t i = 0; i < stride; ++i)
                        rec[i] = (uint8_t)(src[i] + prev[i]);
                } else {
                    std::memcpy(rec, src, (size_t)stride);
                }
                break;
            case 3:  // Average
                for (int64_t i = 0; i < stride; ++i) {
                    int left = i >= bpp ? rec[i - bpp] : 0;
                    int up = prev ? prev[i] : 0;
                    rec[i] = (uint8_t)(src[i] + ((left + up) >> 1));
                }
                break;
            case 4:  // Paeth
                for (int64_t i = 0; i < stride; ++i) {
                    int a = i >= bpp ? rec[i - bpp] : 0;
                    int b = prev ? prev[i] : 0;
                    int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
                    int p = a + b - c;
                    int pa = std::abs(p - a);
                    int pb = std::abs(p - b);
                    int pc = std::abs(p - c);
                    int pred = (pa <= pb && pa <= pc) ? a
                               : (pb <= pc ? b : c);
                    rec[i] = (uint8_t)(src[i] + pred);
                }
                break;
            default:
                return -1;
        }
        prev = rec;
    }
    return 0;
}
