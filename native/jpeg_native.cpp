// Native JPEG -> RGB decoder for the host input pipeline.
//
// The reference fed TPU pods with tf.data's multi-threaded
// decode_jpeg kernels (reference retinanet/dataloader/input_pipeline.py:
// 57-92); this is the equivalent for the thread-pool host pipeline:
// libjpeg(-turbo) decode that runs entirely outside the GIL (ctypes
// releases it for the call's duration) and emits RGB directly — no
// BGR->RGB conversion pass, no negative-stride views.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libjpeg_native.so \
//            jpeg_native.cpp -ljpeg

#include <csetjmp>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorCtx {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrorCtx* ctx = reinterpret_cast<ErrorCtx*>(cinfo->err);
  longjmp(ctx->jump, 1);
}

void silence(j_common_ptr, int) {}

}  // namespace

extern "C" {

// Parse the header only. Returns 0 and fills (*w, *h) on success, -1 on
// malformed data. Cheap (no DCT work).
int jpg_dims(const unsigned char* data, long len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  err.mgr.emit_message = silence;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  *w = static_cast<int>(cinfo.image_width);
  *h = static_cast<int>(cinfo.image_height);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Full decode into the caller-allocated RGB buffer (h * w * 3 bytes,
// C-contiguous, row-major). Returns 0 on success, -1 on malformed data,
// -2 if the buffer is too small for the decoded dimensions.
int jpg_decode_rgb(const unsigned char* data, long len, unsigned char* out,
                   long out_capacity, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorCtx err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = on_error;
  err.mgr.emit_message = silence;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/CMYK sources upconvert
  jpeg_start_decompress(&cinfo);
  const long width = cinfo.output_width;
  const long height = cinfo.output_height;
  const long row_bytes = width * cinfo.output_components;
  if (cinfo.output_components != 3 ||
      height * row_bytes > out_capacity) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + static_cast<long>(cinfo.output_scanline) * row_bytes;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *w = static_cast<int>(width);
  *h = static_cast<int>(height);
  return 0;
}

}  // extern "C"
