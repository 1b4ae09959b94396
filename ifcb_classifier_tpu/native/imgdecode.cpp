// Native PNG/JPEG decoder — the epoch-1 training-input hot loop.
//
// Role: the reference decodes every training image with PIL inside torch
// DataLoader worker *processes* (/root/reference/neuston_data.py:257-263,
// neuston_net.py:80-84 — workers exist precisely because PIL holds the GIL).
// Our HostLoader uses threads (cheaper, shares the --cache-images dict), so
// decode must release the GIL to scale: this file decodes PNG (libpng) and
// JPEG (libjpeg) from memory buffers in plain C++, called via ctypes (which
// drops the GIL for the call's duration). Python-side fallback to PIL covers
// anything this file declines (16-bit PNGs, CMYK JPEGs, other formats).
//
// Output parity contract (pinned by tests/test_native.py):
//   * 8-bit gray/RGB/palette/alpha PNGs and gray/YCbCr JPEGs decode
//     byte-identically to PIL's convert("RGB") / convert("L") — PIL drops
//     alpha without compositing (strip, not blend), expands palettes via
//     direct lookup, and computes luma as
//     L = (R*19595 + G*38470 + B*7471 + 0x8000) >> 16  (ITU-R 601-2).
//     JPEG goes through the same libjpeg the PIL wheel bundles, so DCT
//     output matches bit-for-bit (pinned by test, not assumed).
//
// Exposed as plain C symbols; loaded via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC -o libimgdecode.so imgdecode.cpp
//        -lpng -ljpeg
//
// Return codes: 0 ok; 1 unsupported variant (caller must fall back to PIL);
// -1 corrupt/not-an-image.

#include <csetjmp>
#include <cstdint>
#include <cstdio>  // jpeglib.h needs FILE declared before inclusion
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int OK = 0, UNSUPPORTED = 1, CORRUPT = -1;

// PIL ImagingConvert L24: R*19595 + G*38470 + B*7471 (+0x8000 rounding).
inline uint8_t pil_luma(uint8_t r, uint8_t g, uint8_t b) {
    return (uint8_t)((r * 19595u + g * 38470u + b * 7471u + 0x8000u) >> 16);
}

void rgb_to_gray(const uint8_t* rgb, uint8_t* gray, int64_t n) {
    for (int64_t i = 0; i < n; i++)
        gray[i] = pil_luma(rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]);
}

void gray_to_rgb(const uint8_t* gray, uint8_t* rgb, int64_t n) {
    for (int64_t i = 0; i < n; i++)
        rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = gray[i];
}

// ---------------------------------------------------------------- PNG ----

struct PngMemSrc { const uint8_t* buf; png_size_t len, pos; };

void png_mem_read(png_structp png, png_bytep out, png_size_t want) {
    PngMemSrc* s = (PngMemSrc*)png_get_io_ptr(png);
    if (s->pos + want > s->len) { png_error(png, "eof"); return; }
    std::memcpy(out, s->buf + s->pos, want);
    s->pos += want;
}

void png_warn_silent(png_structp, png_const_charp) {}

// An error_fn that RETURNS makes libpng print via png_default_error before
// longjmp-ing; jump here so corrupt files stay quiet on stderr.
void png_err_silent(png_structp png, png_const_charp) {
    png_longjmp(png, 1);
}

bool is_png(const uint8_t* buf, int64_t len) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    return len >= 8 && std::memcmp(buf, sig, 8) == 0;
}

int png_dims(const uint8_t* buf, int64_t len, int32_t* h, int32_t* w) {
    // IHDR is mandated first: width/height big-endian at offsets 16/20.
    if (len < 24) return CORRUPT;
    auto be32 = [&](int64_t o) {
        return ((uint32_t)buf[o] << 24) | ((uint32_t)buf[o + 1] << 16) |
               ((uint32_t)buf[o + 2] << 8) | (uint32_t)buf[o + 3];
    };
    if (std::memcmp(buf + 12, "IHDR", 4) != 0) return CORRUPT;
    uint32_t W = be32(16), H = be32(20);
    if (!W || !H || W > 1u << 24 || H > 1u << 24) return CORRUPT;
    *w = (int32_t)W; *h = (int32_t)H;
    return OK;
}

int png_decode(const uint8_t* buf, int64_t len, uint8_t* out,
               int32_t out_rgb, int32_t H, int32_t W) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             png_err_silent,
                                             png_warn_silent);
    if (!png) return CORRUPT;
    png_infop info = png_create_info_struct(png);
    if (!info) {
        png_destroy_read_struct(&png, nullptr, nullptr);
        return CORRUPT;
    }

    // setjmp rules: everything written between setjmp and a potential
    // longjmp that is read afterwards must be volatile.
    volatile int rc = CORRUPT;
    std::vector<uint8_t>* volatile scratch = nullptr;
    std::vector<png_bytep>* volatile rows = nullptr;
    PngMemSrc src{buf, (png_size_t)len, 0};

    if (setjmp(png_jmpbuf(png))) goto done;
    png_set_read_fn(png, &src, png_mem_read);
    png_read_info(png, info);
    {
        png_uint_32 w32, h32;
        int depth, color;
        png_get_IHDR(png, info, &w32, &h32, &depth, &color, nullptr, nullptr,
                     nullptr);
        if ((int32_t)h32 != H || (int32_t)w32 != W) { rc = CORRUPT; goto done; }
        // PIL clips 16-bit to L via a different path than libpng's >>8;
        // decline rather than match approximately.
        if (depth == 16) { rc = UNSUPPORTED; goto done; }

        // Normalize to 8-bit gray or RGB with PIL-convert semantics.
        if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
        if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
            png_set_expand_gray_1_2_4_to_8(png);
        if (png_get_valid(png, info, PNG_INFO_tRNS))
            png_set_tRNS_to_alpha(png);
        png_set_strip_alpha(png);  // PIL convert() drops alpha, no blending
        png_read_update_info(png, info);

        const int ch = png_get_channels(png, info);
        if (ch != 1 && ch != 3) { rc = UNSUPPORTED; goto done; }

        const int64_t n = (int64_t)H * W;
        uint8_t* plane = out;
        if ((ch == 3) != (out_rgb != 0)) {  // decode to scratch, convert
            scratch = new std::vector<uint8_t>((size_t)n * ch);
            plane = scratch->data();
        }
        rows = new std::vector<png_bytep>(H);
        for (int32_t r = 0; r < H; r++)
            (*rows)[r] = plane + (size_t)r * W * ch;
        png_read_image(png, rows->data());  // handles Adam7 interlace

        if (ch == 1 && out_rgb) gray_to_rgb(plane, out, n);
        else if (ch == 3 && !out_rgb) rgb_to_gray(plane, out, n);
        rc = OK;
    }
done:
    png_destroy_read_struct(&png, &info, nullptr);
    delete rows;
    delete scratch;
    return rc;
}

// --------------------------------------------------------------- JPEG ----

struct JpegErr { jpeg_error_mgr pub; jmp_buf jmp; };

void jpeg_err_exit(j_common_ptr cinfo) {
    longjmp(((JpegErr*)cinfo->err)->jmp, 1);
}

void jpeg_emit_silent(j_common_ptr, int) {}
void jpeg_output_silent(j_common_ptr) {}

bool is_jpeg(const uint8_t* buf, int64_t len) {
    return len >= 3 && buf[0] == 0xFF && buf[1] == 0xD8 && buf[2] == 0xFF;
}

void jpeg_setup_err(jpeg_decompress_struct* cinfo, JpegErr* jerr) {
    cinfo->err = jpeg_std_error(&jerr->pub);
    jerr->pub.error_exit = jpeg_err_exit;
    jerr->pub.emit_message = jpeg_emit_silent;
    jerr->pub.output_message = jpeg_output_silent;
}

int jpeg_dims(const uint8_t* buf, int64_t len, int32_t* h, int32_t* w) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    jpeg_setup_err(&cinfo, &jerr);
    if (setjmp(jerr.jmp)) { jpeg_destroy_decompress(&cinfo); return CORRUPT; }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
                 (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    *h = (int32_t)cinfo.image_height;
    *w = (int32_t)cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return OK;
}

int jpeg_decode(const uint8_t* buf, int64_t len, uint8_t* out,
                int32_t out_rgb, int32_t H, int32_t W) {
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    jpeg_setup_err(&cinfo, &jerr);
    volatile int rc = CORRUPT;
    std::vector<uint8_t>* volatile scratch = nullptr;
    if (setjmp(jerr.jmp)) goto done;
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
                 (unsigned long)len);
    jpeg_read_header(&cinfo, TRUE);
    if ((int32_t)cinfo.image_height != H ||
        (int32_t)cinfo.image_width != W) { rc = CORRUPT; goto done; }
    if (cinfo.jpeg_color_space == JCS_CMYK ||
        cinfo.jpeg_color_space == JCS_YCCK) { rc = UNSUPPORTED; goto done; }
    {
        // Match PIL: gray JPEG decodes as grayscale, color as RGB (default
        // ISLOW DCT + fancy upsampling — same libjpeg, same bits).
        const bool src_gray = cinfo.jpeg_color_space == JCS_GRAYSCALE;
        cinfo.out_color_space = src_gray ? JCS_GRAYSCALE : JCS_RGB;
        jpeg_start_decompress(&cinfo);
        const int ch = cinfo.output_components;
        if (ch != 1 && ch != 3) { rc = UNSUPPORTED; goto done; }
        const int64_t n = (int64_t)H * W;
        uint8_t* plane = out;
        if ((ch == 3) != (out_rgb != 0)) {
            scratch = new std::vector<uint8_t>((size_t)n * ch);
            plane = scratch->data();
        }
        while (cinfo.output_scanline < cinfo.output_height) {
            JSAMPROW row = plane + (size_t)cinfo.output_scanline * W * ch;
            jpeg_read_scanlines(&cinfo, &row, 1);
        }
        jpeg_finish_decompress(&cinfo);
        if (ch == 1 && out_rgb) gray_to_rgb(plane, out, n);
        else if (ch == 3 && !out_rgb) rgb_to_gray(plane, out, n);
        rc = OK;
    }
done:
    jpeg_destroy_decompress(&cinfo);
    delete scratch;
    return rc;
}

}  // namespace

extern "C" {

// Probe container + dimensions. Returns 0 and fills h/w, or -1 if the buffer
// is not a PNG/JPEG this decoder recognizes (caller: PIL).
int imgdec_probe(const uint8_t* buf, int64_t len, int32_t* h, int32_t* w) {
    if (is_png(buf, len)) return png_dims(buf, len, h, w);
    if (is_jpeg(buf, len)) return jpeg_dims(buf, len, h, w);
    return CORRUPT;
}

// Decode into out (h*w*3 if out_rgb else h*w), dims from a prior probe.
// Returns 0 ok, 1 unsupported variant (fall back to PIL), -1 corrupt.
int imgdec_decode(const uint8_t* buf, int64_t len, uint8_t* out,
                  int32_t out_rgb, int32_t h, int32_t w) {
    if (is_png(buf, len)) {
        int32_t ph, pw;
        if (png_dims(buf, len, &ph, &pw) != OK || ph != h || pw != w)
            return CORRUPT;
        return png_decode(buf, len, out, out_rgb, h, w);
    }
    if (is_jpeg(buf, len)) return jpeg_decode(buf, len, out, out_rgb, h, w);
    return CORRUPT;
}

}  // extern "C"
