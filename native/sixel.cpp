// SIXEL band encoder — the hot inner loop of gfx.sixel_frame.
//
// The live session's sixel backend re-encodes a full terminal-sized frame
// on every interactive update; the pure-numpy encoder walks per-color RLE
// runs in Python and costs whole seconds on low-coherence frames (measured
// 4.2 s for an 800x624 noise frame).  This C core runs the identical
// emission rules in one pass per 6-row band and stays in single-digit
// milliseconds.  The Python wrapper (gfx.sixel_frame) computes the 252-
// color palette quantization in numpy, calls sixel_encode with the (H, W)
// int32 index plane, and falls back to the numpy path when no toolchain
// can build this library — both paths emit BYTE-IDENTICAL sequences
// (asserted by tests/test_gfx.py::test_sixel_native_matches_numpy).
//
// Emission rules (shared with the fallback):
//   - per 6-row band, per palette color present: "#<c>" then the bitmask
//     row as RLE sixel chars; runs of n >= 4 emit "!<n><ch>", shorter runs
//     emit the char repeated; trailing empty ('?') columns are trimmed
//   - "$" (carriage return) before every color after the band's first
//   - "-" (line feed) after each band
//
// Counterpart surface in the reference: none (its UI is a GPU swapchain);
// this is the TPU-native framework's terminal display path.

#include <cstdint>
#include <cstring>

namespace {

// write n as decimal into p, return chars written (n >= 0, n < 1e9)
inline int write_int(char* p, int n) {
    char tmp[10];
    int k = 0;
    do {
        tmp[k++] = char('0' + n % 10);
        n /= 10;
    } while (n);
    for (int i = 0; i < k; ++i) p[i] = tmp[k - 1 - i];
    return k;
}

// emit one run of ch repeated n times under the shared RLE rule
inline char* emit_run(char* p, char ch, int n) {
    if (n >= 4) {
        *p++ = '!';
        p += write_int(p, n);
        *p++ = ch;
    } else {
        for (int i = 0; i < n; ++i) *p++ = ch;
    }
    return p;
}

}  // namespace

extern "C" {

// Encode the sixel BODY (everything between the palette defs and the
// final ST) for an (h, w) plane of palette indices in [0, ncolors).
// Returns bytes written, or -1 if out_cap could be exceeded (caller
// grows the buffer and retries; the bound check is conservative).
long long sixel_encode(const int32_t* idx, int h, int w, int ncolors,
                       char* out, long long out_cap) {
    if (h <= 0 || w <= 0 || ncolors <= 0 || ncolors > 4096) return -1;
    // per-color column bitmasks for one band + presence flags
    unsigned char* colbits = new unsigned char[(size_t)ncolors * w];
    int* present = new int[ncolors];   // last band index where color seen
    for (int c = 0; c < ncolors; ++c) present[c] = -1;
    char* p = out;
    char* end = out + out_cap;
    long long band_no = 0;
    for (int y0 = 0; y0 < h; y0 += 6, ++band_no) {
        int rows = (h - y0 < 6) ? (h - y0) : 6;
        // worst-case bytes this band could emit: every color a full
        // unRLE'd row + headers; bail for a retry if it may not fit
        // (callers size the buffer so this almost never triggers)
        for (int k = 0; k < rows; ++k) {
            const int32_t* line = idx + (size_t)(y0 + k) * w;
            unsigned char bit = (unsigned char)(1u << k);
            for (int x = 0; x < w; ++x) {
                int32_t c = line[x];
                if (c < 0 || c >= ncolors) continue;  // defensive
                if (present[c] != band_no) {
                    present[c] = (int)band_no;
                    std::memset(colbits + (size_t)c * w, 0, (size_t)w);
                }
                colbits[(size_t)c * w + x] |= bit;
            }
        }
        bool first = true;
        for (int c = 0; c < ncolors; ++c) {
            if (present[c] != band_no) continue;
            const unsigned char* bits = colbits + (size_t)c * w;
            int last = w;
            while (last > 0 && bits[last - 1] == 0) --last;
            if (end - p < (long long)last + 16) {
                delete[] colbits;
                delete[] present;
                return -1;
            }
            if (!first) *p++ = '$';
            first = false;
            *p++ = '#';
            p += write_int(p, c);
            int x = 0;
            while (x < last) {
                unsigned char v = bits[x];
                int run = 1;
                while (x + run < last && bits[x + run] == v) ++run;
                p = emit_run(p, char(63 + v), run);
                x += run;
            }
        }
        if (end - p < 2) {
            delete[] colbits;
            delete[] present;
            return -1;
        }
        *p++ = '-';
    }
    delete[] colbits;
    delete[] present;
    return p - out;
}

// Full-frame entry: quantize (H, W, 3) uint8 RGB to the fixed 6x7x6
// palette (identical arithmetic to the Python wrapper: r*6/256 etc.) and
// encode in one pass — skips the numpy index-plane materialization, which
// costs more than the encode itself at terminal sizes.
long long sixel_encode_rgb(const unsigned char* rgb, int h, int w,
                           char* out, long long out_cap) {
    if (h <= 0 || w <= 0) return -1;
    int32_t* idx = new int32_t[(size_t)h * w];
    static int32_t lut_r[256], lut_g[256], lut_b[256];
    static bool lut_init = false;
    if (!lut_init) {
        for (int v = 0; v < 256; ++v) {
            lut_r[v] = (v * 6 / 256) * 42;
            lut_g[v] = (v * 7 / 256) * 6;
            lut_b[v] = v * 6 / 256;
        }
        lut_init = true;
    }
    const size_t n = (size_t)h * w;
    for (size_t i = 0; i < n; ++i) {
        const unsigned char* px = rgb + 3 * i;
        idx[i] = lut_r[px[0]] + lut_g[px[1]] + lut_b[px[2]];
    }
    long long r = sixel_encode(idx, h, w, 252, out, out_cap);
    delete[] idx;
    return r;
}

}  // extern "C"
