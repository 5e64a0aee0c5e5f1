// vq_native — native asset-pipeline kernels for vqengine_tpu.
//
// Counterpart of the reference's native asset code (VQUtils Image /
// stb_image decode used by TextureManager.cpp, and the mip-generation
// workers, TextureManager.h:133-141). The hot host-side loops — PNG
// row unfiltering and box-filter mip generation — run here; Python
// falls back to its pure implementations when this library is absent.
//
// Build: make (g++ -O3 -shared -fPIC, links against zlib).
// Binding: ctypes (vqengine_tpu/utils/native.py).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decode (8-bit, color types 0/2/3/4/6, non-interlaced)
// Returns 0 on success. out must hold h*w*channels bytes (query first).
// ---------------------------------------------------------------------------

static uint32_t rd_u32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngInfo { uint32_t w, h; int channels; int color_type; };

static int png_parse(const uint8_t* data, size_t n, PngInfo* info,
                     uint8_t** idat, size_t* idat_len, uint8_t* palette) {
    static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    if (n < 8 || memcmp(data, magic, 8) != 0) return -1;
    size_t pos = 8;
    size_t cap = 1 << 20;
    uint8_t* buf = (uint8_t*)malloc(cap);
    if (!buf) return -5;
    size_t len = 0;
    int have_hdr = 0;
    while (pos + 12 <= n) {
        uint32_t clen = rd_u32(data + pos);
        const uint8_t* tag = data + pos + 4;
        const uint8_t* body = data + pos + 8;
        if (pos + 12 + clen > n) break;
        if (!memcmp(tag, "IHDR", 4)) {
            info->w = rd_u32(body);
            info->h = rd_u32(body + 4);
            int depth = body[8];
            info->color_type = body[9];
            if (depth != 8 || body[12] != 0) { free(buf); return -2; }
            switch (info->color_type) {
                case 0: info->channels = 1; break;
                case 2: info->channels = 3; break;
                case 3: info->channels = 1; break;
                case 4: info->channels = 2; break;
                case 6: info->channels = 4; break;
                default: free(buf); return -3;
            }
            have_hdr = 1;
        } else if (!memcmp(tag, "PLTE", 4)) {
            size_t m = clen < 768 ? clen : 768;
            memcpy(palette, body, m);
        } else if (!memcmp(tag, "IDAT", 4)) {
            if (len + clen > cap) {
                while (len + clen > cap) cap *= 2;
                uint8_t* grown = (uint8_t*)realloc(buf, cap);
                if (!grown) { free(buf); return -5; }
                buf = grown;
            }
            memcpy(buf + len, body, clen);
            len += clen;
        } else if (!memcmp(tag, "IEND", 4)) {
            break;
        }
        pos += 12 + clen;
    }
    if (!have_hdr) { free(buf); return -4; }
    *idat = buf;
    *idat_len = len;
    return 0;
}

int vq_png_info(const uint8_t* data, size_t n, int* w, int* h, int* channels) {
    PngInfo info{};
    uint8_t pal[768];
    uint8_t* idat; size_t ilen;
    int rc = png_parse(data, n, &info, &idat, &ilen, pal);
    if (rc) return rc;
    free(idat);
    *w = (int)info.w; *h = (int)info.h;
    *channels = info.color_type == 3 ? 3 : info.channels; // palette -> RGB
    return 0;
}

int vq_png_decode(const uint8_t* data, size_t n, uint8_t* out) {
    PngInfo info{};
    uint8_t pal[768] = {0};
    uint8_t* idat; size_t ilen;
    int rc = png_parse(data, n, &info, &idat, &ilen, pal);
    if (rc) return rc;

    const int ch = info.channels;
    const size_t stride = (size_t)info.w * ch;
    const size_t raw_len = (stride + 1) * info.h;
    uint8_t* raw = (uint8_t*)malloc(raw_len);
    if (!raw) { free(idat); return -5; }

    uLongf dlen = raw_len;
    if (uncompress(raw, &dlen, idat, ilen) != Z_OK || dlen != raw_len) {
        free(idat); free(raw); return -5;
    }
    free(idat);

    // unfilter
    uint8_t* prev = (uint8_t*)calloc(stride, 1);
    uint8_t* line = (uint8_t*)malloc(stride);
    if (!prev || !line) { free(raw); free(prev); free(line); return -5; }
    const bool palette = info.color_type == 3;
    for (uint32_t y = 0; y < info.h; ++y) {
        const uint8_t* src = raw + y * (stride + 1);
        const int ft = src[0];
        memcpy(line, src + 1, stride);
        switch (ft) {
            case 0: break;
            case 1:
                for (size_t x = ch; x < stride; ++x) line[x] += line[x - ch];
                break;
            case 2:
                for (size_t x = 0; x < stride; ++x) line[x] += prev[x];
                break;
            case 3:
                for (size_t x = 0; x < stride; ++x) {
                    int a = x >= (size_t)ch ? line[x - ch] : 0;
                    line[x] += (uint8_t)((a + prev[x]) >> 1);
                }
                break;
            case 4:
                for (size_t x = 0; x < stride; ++x) {
                    int a = x >= (size_t)ch ? line[x - ch] : 0;
                    int b = prev[x];
                    int c = x >= (size_t)ch ? prev[x - ch] : 0;
                    int p = a + b - c;
                    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
                    int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                    line[x] += (uint8_t)pred;
                }
                break;
            default:
                free(raw); free(prev); free(line); return -6;
        }
        if (palette) {
            uint8_t* dst = out + (size_t)y * info.w * 3;
            for (uint32_t x = 0; x < info.w; ++x) {
                const uint8_t* p = pal + line[x] * 3;
                dst[x * 3] = p[0]; dst[x * 3 + 1] = p[1]; dst[x * 3 + 2] = p[2];
            }
        } else {
            memcpy(out + (size_t)y * stride, line, stride);
        }
        memcpy(prev, line, stride);
    }
    free(raw); free(prev); free(line);
    return 0;
}

// ---------------------------------------------------------------------------
// box-filter mip generation: src [h, w, c] f32 -> dst [h/2, w/2, c]
// ---------------------------------------------------------------------------

void vq_mip_box(const float* src, int h, int w, int c, float* dst) {
    const int h2 = h / 2 > 0 ? h / 2 : 1;
    const int w2 = w / 2 > 0 ? w / 2 : 1;
    for (int y = 0; y < h2; ++y) {
        const float* r0 = src + (size_t)(2 * y) * w * c;
        const float* r1 = src + (size_t)(2 * y + 1 < h ? 2 * y + 1 : 2 * y) * w * c;
        float* d = dst + (size_t)y * w2 * c;
        for (int x = 0; x < w2; ++x) {
            const int x1 = 2 * x + 1 < w ? 2 * x + 1 : 2 * x;
            for (int k = 0; k < c; ++k) {
                d[x * c + k] = 0.25f * (r0[2 * x * c + k] + r0[x1 * c + k] +
                                        r1[2 * x * c + k] + r1[x1 * c + k]);
            }
        }
    }
}

// nearest/box resize: src [h, w, c] f32 -> dst [oh, ow, c]
void vq_resize_box(const float* src, int h, int w, int c,
                   float* dst, int oh, int ow) {
    for (int y = 0; y < oh; ++y) {
        int sy = (int)((int64_t)y * h / oh);
        const float* r = src + (size_t)sy * w * c;
        float* d = dst + (size_t)y * ow * c;
        for (int x = 0; x < ow; ++x) {
            int sx = (int)((int64_t)x * w / ow);
            for (int k = 0; k < c; ++k) d[x * c + k] = r[sx * c + k];
        }
    }
}

}  // extern "C"
